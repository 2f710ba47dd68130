"""Activation-exact validation of torch->flax checkpoint conversion.

Builds REFERENCE-ARCHITECTURE torch modules (from the SURVEY.md spec, with
torch's own init + randomized BN running stats — not hand-built dicts),
runs their eval-mode forward, converts the state_dict through
utils/convert_rules, and asserts the flax forward matches to <1e-4 max-abs
on shared inputs. This is the strongest conversion validation available in
an environment with no real reference checkpoints (SURVEY.md §7 hard-part
6): the rule tables here touch real torch tensors end-to-end.

Flax parity switches exercised: BackboneConfig.upsample_align_corners
(reference F.interpolate align_corners=True, resnet.py:151,155),
pe_variant="loftr_compat" (position_encoding.py:25-33 frequency table),
LayerNorm epsilon 1e-5.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from onepose_st_tpu.utils import convert_rules  # noqa: E402
from onepose_st_tpu.utils.torch_convert import convert_state_dict  # noqa: E402

ATOL = 1e-4


def _randomize_bn_stats(module, rng):
    """Torch init gives mean=0/var=1 running stats; randomize them so BN
    conversion errors cannot hide."""
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(size=m.num_features).astype(np.float32) * 0.2
            ))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 2.0, size=m.num_features).astype(np.float32)
            ))


# ---------------------------------------------------------------------------
# torch reference architectures (built from the spec in SURVEY.md §3.4 and
# the conversion-rule docstrings; key names match the reference state_dicts)
# ---------------------------------------------------------------------------

def conv1x1(ci, co, stride=1):
    return nn.Conv2d(ci, co, 1, stride=stride, padding=0, bias=False)


def conv3x3(ci, co, stride=1):
    return nn.Conv2d(ci, co, 3, stride=stride, padding=1, bias=False)


class TBasicBlock(nn.Module):
    def __init__(self, ci, planes, stride=1):
        super().__init__()
        self.conv1 = conv3x3(ci, planes, stride)
        self.conv2 = conv3x3(planes, planes)
        self.bn1 = nn.BatchNorm2d(planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = (
            None if stride == 1 else
            nn.Sequential(conv1x1(ci, planes, stride), nn.BatchNorm2d(planes))
        )

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class TResNetFPN(nn.Module):
    """ResNetFPN_8_2 per reference resnet.py:85-160 (grayscale input)."""

    def __init__(self, initial_dim, block_dims):
        super().__init__()
        d0, d1, d2 = block_dims
        self.conv1 = nn.Conv2d(1, initial_dim, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(initial_dim)
        self.layer1 = nn.Sequential(TBasicBlock(initial_dim, d0), TBasicBlock(d0, d0))
        self.layer2 = nn.Sequential(TBasicBlock(d0, d1, 2), TBasicBlock(d1, d1))
        self.layer3 = nn.Sequential(TBasicBlock(d1, d2, 2), TBasicBlock(d2, d2))
        self.layer3_outconv = conv1x1(d2, d2)
        self.layer2_outconv = conv1x1(d1, d2)
        self.layer2_outconv2 = nn.Sequential(
            conv3x3(d2, d2), nn.BatchNorm2d(d2), nn.LeakyReLU(), conv3x3(d2, d1)
        )
        self.layer1_outconv = conv1x1(d0, d1)
        self.layer1_outconv2 = nn.Sequential(
            conv3x3(d1, d1), nn.BatchNorm2d(d1), nn.LeakyReLU(), conv3x3(d1, d0)
        )

    def forward(self, x):
        x0 = F.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x0)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x3_out = self.layer3_outconv(x3)
        x3_2x = F.interpolate(x3_out, scale_factor=2.0, mode="bilinear",
                              align_corners=True)
        x2_out = self.layer2_outconv(x2)
        x2_out = self.layer2_outconv2(x2_out + x3_2x)
        x2_2x = F.interpolate(x2_out, scale_factor=2.0, mode="bilinear",
                              align_corners=True)
        x1_out = self.layer1_outconv(x1)
        x1_out = self.layer1_outconv2(x1_out + x2_2x)
        return x3_out, x1_out


class TEncoderLayer(nn.Module):
    """LoFTREncoderLayer with elu+1 linear attention (transformer.py:7-95)."""

    def __init__(self, d_model, nhead):
        super().__init__()
        self.dim = d_model // nhead
        self.nhead = nhead
        self.q_proj = nn.Linear(d_model, d_model, bias=False)
        self.k_proj = nn.Linear(d_model, d_model, bias=False)
        self.v_proj = nn.Linear(d_model, d_model, bias=False)
        self.merge = nn.Linear(d_model, d_model, bias=False)
        self.mlp = nn.Sequential(
            nn.Linear(2 * d_model, 2 * d_model, bias=False),
            nn.ReLU(True),
            nn.Linear(2 * d_model, d_model, bias=False),
        )
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)

    def forward(self, x, source):
        bs = x.size(0)
        q = self.q_proj(x).view(bs, -1, self.nhead, self.dim)
        k = self.k_proj(source).view(bs, -1, self.nhead, self.dim)
        v = self.v_proj(source).view(bs, -1, self.nhead, self.dim)
        Q = F.elu(q) + 1.0
        K = F.elu(k) + 1.0
        s_len = v.size(1)
        v_scaled = v / s_len
        KV = torch.einsum("nshd,nshv->nhdv", K, v_scaled)
        Z = 1.0 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + 1e-6)
        msg = torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * s_len
        msg = self.merge(msg.reshape(bs, -1, self.nhead * self.dim))
        msg = self.norm1(msg)
        msg = self.mlp(torch.cat([x, msg], dim=2))
        msg = self.norm2(msg)
        return x + msg


class TLocalFeatureTransformer(nn.Module):
    """Alternating self/cross with weight sharing across the two streams,
    both updates computed from pre-update features (transformer.py:146-166)."""

    def __init__(self, d_model, nhead, layer_iter_n):
        super().__init__()
        self.layers = nn.ModuleList(
            [TEncoderLayer(d_model, nhead) for _ in range(2 * layer_iter_n)]
        )

    def forward(self, feat0, feat1):
        for i, layer in enumerate(self.layers):
            if i % 2 == 0:
                feat0, feat1 = layer(feat0, feat0), layer(feat1, feat1)
            else:
                feat0, feat1 = layer(feat0, feat1), layer(feat1, feat0)
        return feat0, feat1


def _randomize_ln(module, rng):
    for m in module.modules():
        if isinstance(m, nn.LayerNorm):
            m.weight.data.copy_(torch.from_numpy(
                rng.uniform(0.5, 1.5, size=m.weight.shape).astype(np.float32)
            ))
            m.bias.data.copy_(torch.from_numpy(
                rng.normal(size=m.bias.shape).astype(np.float32) * 0.1
            ))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

BD = (16, 24, 32)  # small block_dims: full topology, fast CPU forward


def _backbone_pair(rng):
    import jax

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.models.backbone import ResNetFPN

    tm = TResNetFPN(16, BD).eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    sd = {f"backbone.{k}": v.detach().numpy()
          for k, v in tm.state_dict().items()}
    params, stats = convert_state_dict(sd, convert_rules.resnetfpn_rules())
    cfg = cfg_lib.BackboneConfig(
        initial_dim=16, block_dims=BD, dtype="float32",
        upsample_align_corners=True,
    )
    fm = ResNetFPN(cfg)
    variables = {"params": params["backbone"], "batch_stats": stats["backbone"]}
    return tm, fm, variables


def test_backbone_forward_numerics(rng):
    import jax.numpy as jnp

    tm, fm, variables = _backbone_pair(rng)
    x = rng.uniform(size=(2, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        tc, tf = tm(torch.from_numpy(x))
    fc, ff = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    dc = np.abs(np.asarray(fc).transpose(0, 3, 1, 2) - tc.numpy()).max()
    df = np.abs(np.asarray(ff).transpose(0, 3, 1, 2) - tf.numpy()).max()
    assert dc < ATOL, f"coarse features diff {dc}"
    assert df < ATOL, f"fine features diff {df}"


def test_sine_pe_compat_matches_reference_formula():
    import math

    from onepose_st_tpu.models.encodings import _sine_pe_np

    d_model, h, w = 32, 8, 8
    # reference position_encoding.py:22-33, reproduced verbatim in torch
    pe = torch.zeros((d_model, h, w))
    y_position = torch.ones((h, w)).cumsum(0).float().unsqueeze(0)
    x_position = torch.ones((h, w)).cumsum(1).float().unsqueeze(0)
    div_term = torch.exp(
        torch.arange(0, d_model // 2, 2).float()
        * (-math.log(10000.0) / d_model // 2)
    )[:, None, None]
    pe[0::4, :, :] = torch.sin(x_position * div_term)
    pe[1::4, :, :] = torch.cos(x_position * div_term)
    pe[2::4, :, :] = torch.sin(y_position * div_term)
    pe[3::4, :, :] = torch.cos(y_position * div_term)
    ours = _sine_pe_np(d_model, h, w, "loftr_compat")
    np.testing.assert_allclose(
        ours.transpose(2, 0, 1), pe.numpy(), atol=1e-6
    )


def test_encoder_stack_forward_numerics(rng):
    import jax.numpy as jnp

    from onepose_st_tpu.models.transformer import LocalFeatureTransformer

    d, nhead, iters = 64, 4, 2
    tm = TLocalFeatureTransformer(d, nhead, iters).eval()
    with torch.no_grad():
        _randomize_ln(tm, rng)
    sd = {f"stack.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    params, _ = convert_state_dict(
        sd, convert_rules.encoder_stack_rules("stack", "stack", n_iters=iters)
    )
    fm = LocalFeatureTransformer(
        d_model=d, nhead=nhead, layer_iter_n=iters, dtype=jnp.float32
    )
    f0 = rng.normal(size=(2, 40, d)).astype(np.float32)
    f1 = rng.normal(size=(2, 24, d)).astype(np.float32)
    with torch.no_grad():
        t0, t1 = tm(torch.from_numpy(f0), torch.from_numpy(f1))
    o0, o1 = fm.apply({"params": params["stack"]}, jnp.asarray(f0), jnp.asarray(f1))
    d0 = np.abs(np.asarray(o0) - t0.numpy()).max()
    d1 = np.abs(np.asarray(o1) - t1.numpy()).max()
    assert d0 < ATOL and d1 < ATOL, (d0, d1)


def test_loftr_full_conf_matrix_numerics(rng):
    """End-to-end composite: torch backbone -> reference pe -> torch coarse
    stack -> dual-softmax, vs our LoFTRMatcher with the converted weights
    (pe_variant=loftr_compat, align_corners upsample)."""
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.models import LoFTRMatcher
    from onepose_st_tpu.models.encodings import _sine_pe_np

    iters = 2
    d = BD[-1]
    t_bb = TResNetFPN(16, BD).eval()
    t_stack = TLocalFeatureTransformer(d, 4, iters).eval()
    with torch.no_grad():
        _randomize_bn_stats(t_bb, rng)
        _randomize_ln(t_stack, rng)
    sd = {f"backbone.{k}": v.detach().numpy() for k, v in t_bb.state_dict().items()}
    sd.update({f"loftr_coarse.{k}": v.detach().numpy()
               for k, v in t_stack.state_dict().items()})
    # fine stack: converted but unused by the conf-matrix comparison
    t_fine = TLocalFeatureTransformer(BD[0], 4, 1).eval()
    sd.update({f"loftr_fine.{k}": v.detach().numpy()
               for k, v in t_fine.state_dict().items()})
    sd["pos_encoding.pe"] = np.zeros((1, d, 64, 64), np.float32)

    rules = (
        convert_rules.resnetfpn_rules()
        + convert_rules.encoder_stack_rules("loftr_coarse", "loftr_coarse", iters)
        + convert_rules.encoder_stack_rules("loftr_fine", "loftr_fine", 1)
        + [(r"pos_encoding\.pe", lambda m, s: {})]
    )
    params, stats = convert_state_dict(sd, rules)

    cfg = cfg_lib.LoFTRConfig(
        backbone=cfg_lib.BackboneConfig(
            initial_dim=16, block_dims=BD, dtype="float32",
            upsample_align_corners=True,
        ),
        coarse=cfg_lib.TransformerConfig(
            d_model=d, nhead=4, layer_iter_n=iters, dtype="float32"
        ),
        fine=cfg_lib.FineMatchingConfig(
            d_model=BD[0], nhead=4, layer_iter_n=1, dtype="float32",
            attention="linear",
        ),
        pe_variant="loftr_compat",
    )
    model = LoFTRMatcher(cfg)
    x0 = rng.uniform(size=(1, 64, 64)).astype(np.float32)
    x1 = rng.uniform(size=(1, 64, 64)).astype(np.float32)

    # torch side
    with torch.no_grad():
        c0, _ = t_bb(torch.from_numpy(x0[:, None]))
        c1, _ = t_bb(torch.from_numpy(x1[:, None]))
        pe = _sine_pe_np(d, 8, 8, "loftr_compat").transpose(2, 0, 1)[None]
        t0 = (c0 + torch.from_numpy(pe)).flatten(2).transpose(1, 2)
        t1 = (c1 + torch.from_numpy(pe)).flatten(2).transpose(1, 2)
        t0, t1 = t_stack(t0, t1)
        # dual-softmax with our matching scale (1/(C * (T + 1e-4)))
        T_ = cfg.coarse_matching.temperature + 1e-4
        sim = torch.einsum("blc,bsc->bls", t0, t1) / (d * T_)
        conf_t = (sim.softmax(1) * sim.softmax(2)).numpy()

    out = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x0[..., None]), jnp.asarray(x1[..., None]),
        dense_conf=True,
    )
    conf_f = np.asarray(out["conf_matrix"])
    diff = np.abs(conf_f - conf_t).max()
    assert diff < ATOL, f"conf matrix diff {diff}"


class TKeypointEncoding(nn.Module):
    """KeypointEncoding_linear with norm_method='instancenorm'
    (position_encoding.py:46-80 + train.yaml:63)."""

    def __init__(self, layers=(8, 16), feature_dim=32):
        super().__init__()
        chans = [3, *layers, feature_dim]
        mods = []
        for i in range(1, len(chans)):
            mods.append(nn.Linear(chans[i - 1], chans[i], bias=True))
            if i < len(chans) - 1:
                mods.append(nn.InstanceNorm1d(chans[i]))
                mods.append(nn.ReLU())
        self.encoder = nn.Sequential(*mods)
        nn.init.constant_(self.encoder[-1].bias, 0.0)

    def forward(self, kpts, descriptors):
        return descriptors + self.encoder(kpts)


def test_kpt_encoding_instancenorm_numerics(rng):
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.models.encodings import KeypointEncoding

    tm = TKeypointEncoding().eval()
    sd = {f"kpt_3d_pos_encoding.{k}": v.detach().numpy()
          for k, v in tm.state_dict().items()}
    params, stats = convert_state_dict(
        sd,
        convert_rules.kpt_encoding_rules(
            layers=(8, 16), norm_method="instancenorm"
        ),
    )
    assert stats == {}
    fm = KeypointEncoding(
        cfg_lib.KeypointEncodingConfig(hidden=(8, 16), descriptor_dim=32),
        dtype=jnp.float32,
    )
    kpts = rng.normal(size=(2, 11, 3)).astype(np.float32)
    desc = rng.normal(size=(2, 11, 32)).astype(np.float32)
    with torch.no_grad():
        yt = tm(torch.from_numpy(kpts), torch.from_numpy(desc)).numpy()
    yf = fm.apply(
        {"params": params["kpt_encoding"]}, jnp.asarray(kpts), jnp.asarray(desc)
    )
    diff = np.abs(np.asarray(yf) - yt).max()
    assert diff < ATOL, f"kpt encoding diff {diff}"


# ---------------------------------------------------------------------------
# DenseNet calibration net (hand-built: torchvision absent in this env)
# ---------------------------------------------------------------------------

class TDenseLayer(nn.Module):
    def __init__(self, ci, growth, bn_size):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(ci)
        self.conv1 = conv1x1(ci, bn_size * growth)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = conv3x3(bn_size * growth, growth)

    def forward(self, x):
        y = self.conv1(F.relu(self.norm1(x)))
        return self.conv2(F.relu(self.norm2(y)))


class TDenseBlock(nn.ModuleDict):
    def __init__(self, n_layers, ci, growth, bn_size):
        super().__init__()
        for j in range(n_layers):
            self.add_module(
                f"denselayer{j + 1}", TDenseLayer(ci + j * growth, growth, bn_size)
            )

    def forward(self, x):
        for layer in self.values():
            x = torch.cat([x, layer(x)], 1)
        return x


class TTransition(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.norm = nn.BatchNorm2d(ci)
        self.conv = conv1x1(ci, co)

    def forward(self, x):
        return F.avg_pool2d(self.conv(F.relu(self.norm(x))), 2, 2)


class TCalibNet(nn.Module):
    """DeepSingleImageCalibration net (calib/models/densenet.py:55-95):
    densenet trunk (norm5 -> Identity) + per-quantity Sequential heads."""

    def __init__(self, initial_dim, growth, block_layers, bn_size,
                 head_layers, head_growth, head_hidden, bins, heads):
        super().__init__()
        feats = nn.Module()
        feats.conv0 = nn.Conv2d(3, initial_dim, 7, 2, 3, bias=False)
        feats.norm0 = nn.BatchNorm2d(initial_dim)
        c = initial_dim
        for bi, n in enumerate(block_layers, start=1):
            feats.add_module(f"denseblock{bi}", TDenseBlock(n, c, growth, bn_size))
            c += n * growth
            if bi < len(block_layers):
                feats.add_module(f"transition{bi}", TTransition(c, c // 2))
                c //= 2
        self.model = nn.Module()
        self.model.features = feats
        self.trunk_out = c
        for h in heads:
            ch = c // 2
            head = nn.Sequential(
                TTransition(c, ch),
                TDenseBlock(head_layers, ch, head_growth, bn_size),
                nn.BatchNorm2d(ch + head_layers * head_growth),
                nn.ReLU(),
                nn.AdaptiveAvgPool2d((1, 1)),
                nn.Flatten(),
                nn.Linear(ch + head_layers * head_growth, head_hidden),
                nn.ReLU(),
                nn.Linear(head_hidden, bins),
                nn.LogSoftmax(dim=1),
            )
            self.add_module(f"{h}_head", head)
        self.heads = heads

    def forward(self, x):
        f = self.model.features
        y = F.relu(f.norm0(f.conv0(x)))
        y = F.max_pool2d(y, 3, 2, 1)
        for name, m in f.named_children():
            if name.startswith(("denseblock", "transition")):
                y = m(y)
        return {h: getattr(self, f"{h}_head")(y) for h in self.heads}


def test_calibnet_forward_numerics(rng):
    import jax.numpy as jnp

    from onepose_st_tpu.calib.model import (
        IMAGENET_MEAN, IMAGENET_STD, CalibConfig, CalibNet,
    )

    heads = ("roll", "rho")
    tm = TCalibNet(
        initial_dim=16, growth=8, block_layers=(2, 3), bn_size=2,
        head_layers=2, head_growth=8, head_hidden=32, bins=16, heads=heads,
    ).eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_state_dict(
        sd,
        convert_rules.calibnet_rules(
            block_layers=(2, 3), heads=heads, head_dense_layers=2
        ),
    )
    cfg = CalibConfig(
        num_bins=16, heads=heads, growth_rate=8, block_layers=(2, 3),
        initial_dim=16, bn_size=2, head_dense_layers=2, head_growth_rate=8,
        head_hidden=32, image_size=64, dtype="float32",
    )
    fm = CalibNet(cfg)
    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    xt = ((x - mean) / std).transpose(0, 3, 1, 2)
    with torch.no_grad():
        yt = tm(torch.from_numpy(xt))
    yf = fm.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    for h in heads:
        diff = np.abs(np.asarray(yf[h]) - yt[h].numpy()).max()
        assert diff < ATOL, f"{h} log-probs diff {diff}"
