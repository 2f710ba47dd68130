"""torch->flax weight conversion: numerically-exact primitive mappings."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from onepose_st_tpu.utils import torch_convert as tc  # noqa: E402


def test_conv_semantics(rng):
    import flax.linen as nn
    import jax.numpy as jnp

    t_conv = torch.nn.Conv2d(3, 8, 3, padding=1, bias=True)
    x = rng.uniform(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        y_t = t_conv(torch.from_numpy(x)).numpy()

    f_conv = nn.Conv(8, (3, 3), padding=1)
    params = {
        "kernel": jnp.asarray(tc.conv_kernel(t_conv.weight.detach())),
        "bias": jnp.asarray(t_conv.bias.detach().numpy()),
    }
    y_f = f_conv.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(y_f).transpose(0, 3, 1, 2), y_t, atol=1e-5
    )


def test_dense_semantics(rng):
    import flax.linen as nn
    import jax.numpy as jnp

    t_lin = torch.nn.Linear(6, 4)
    x = rng.uniform(size=(5, 6)).astype(np.float32)
    with torch.no_grad():
        y_t = t_lin(torch.from_numpy(x)).numpy()
    y_f = nn.Dense(4).apply(
        {"params": {
            "kernel": jnp.asarray(tc.dense_kernel(t_lin.weight.detach())),
            "bias": jnp.asarray(t_lin.bias.detach().numpy()),
        }},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(y_f), y_t, atol=1e-5)


def test_batchnorm_semantics(rng):
    import flax.linen as nn
    import jax.numpy as jnp

    t_bn = torch.nn.BatchNorm2d(4)
    t_bn.running_mean += torch.from_numpy(rng.normal(size=4).astype(np.float32))
    t_bn.running_var *= 2.0
    t_bn.eval()
    x = rng.uniform(size=(2, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        y_t = t_bn(torch.from_numpy(x)).numpy()

    sd = {f"bn.{k}": v.detach().numpy() for k, v in
          list(t_bn.named_parameters()) + list(t_bn.named_buffers())}
    p, s = tc.batchnorm("bn", sd)
    y_f = nn.BatchNorm(use_running_average=True, epsilon=1e-5).apply(
        {"params": {k: jnp.asarray(v) for k, v in p.items()},
         "batch_stats": {k: jnp.asarray(v) for k, v in s.items()}},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(y_f).transpose(0, 3, 1, 2), y_t, atol=1e-5
    )


def test_convert_state_dict_rules(rng):
    sd = {
        "backbone.conv1.weight": rng.normal(size=(8, 1, 3, 3)).astype(np.float32),
        "head.weight": rng.normal(size=(4, 8)).astype(np.float32),
        "head.bias": rng.normal(size=4).astype(np.float32),
    }
    rules = [
        (r"backbone\.conv1\.weight",
         lambda m, s: {("conv1", "kernel"): tc.conv_kernel(s[m.group(0)])}),
        (r"head\.weight",
         lambda m, s: {("head", "kernel"): tc.dense_kernel(s[m.group(0)])}),
        (r"head\.bias",
         lambda m, s: {("head", "bias"): np.asarray(s[m.group(0)])}),
    ]
    params, stats = tc.convert_state_dict(sd, rules)
    assert params["conv1"]["kernel"].shape == (3, 3, 1, 8)
    assert params["head"]["kernel"].shape == (8, 4)
    assert stats == {}
    # unmatched keys must raise, never silently drop
    sd["extra.weight"] = np.zeros(3, np.float32)
    with pytest.raises(KeyError):
        tc.convert_state_dict(sd, rules)


def test_strip_prefix():
    sd = {"matcher.a.w": 1, "matcher.b.w": 2, "other.c": 3}
    out = tc.strip_prefix(sd, "matcher.")
    assert out == {"a.w": 1, "b.w": 2}


# ---------------------------------------------------------------------------
# Per-checkpoint rule tables (utils/convert_rules.py): synthetic state_dicts
# with the reference's EXACT key names/shapes, shape-checked against our
# models' real parameter trees.
# ---------------------------------------------------------------------------

def _resnetfpn_sd(rng, prefix="backbone", init=128, dims=(128, 196, 256)):
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 2, size=c).astype(np.float32)
        sd[f"{name}.num_batches_tracked"] = np.asarray(100)

    conv(f"{prefix}.conv1", init, 1, 7)
    bn(f"{prefix}.bn1", init)
    in_p = init
    for L, d in enumerate(dims, start=1):
        stride_block = L > 1
        for B in (0, 1):
            p = f"{prefix}.layer{L}.{B}"
            src_c = in_p if B == 0 else d
            conv(f"{p}.conv1", d, src_c, 3)
            conv(f"{p}.conv2", d, d, 3)
            bn(f"{p}.bn1", d)
            bn(f"{p}.bn2", d)
            if B == 0 and stride_block:
                conv(f"{p}.downsample.0", d, in_p, 1)
                bn(f"{p}.downsample.1", d)
        in_p = d
    d0, d1, d2 = dims
    conv(f"{prefix}.layer3_outconv", d2, d2, 1)
    conv(f"{prefix}.layer2_outconv", d2, d1, 1)
    conv(f"{prefix}.layer2_outconv2.0", d2, d2, 3)
    bn(f"{prefix}.layer2_outconv2.1", d2)
    conv(f"{prefix}.layer2_outconv2.3", d1, d2, 3)
    conv(f"{prefix}.layer1_outconv", d1, d0, 1)
    conv(f"{prefix}.layer1_outconv2.0", d1, d1, 3)
    bn(f"{prefix}.layer1_outconv2.1", d1)
    conv(f"{prefix}.layer1_outconv2.3", d0, d1, 3)
    return sd


def _encoder_sd(rng, prefix, n_layers, d_model):
    sd = {}
    for i in range(n_layers):
        p = f"{prefix}.layers.{i}"
        for nm in ("q_proj", "k_proj", "v_proj", "merge"):
            sd[f"{p}.{nm}.weight"] = rng.normal(size=(d_model, d_model)).astype(np.float32)
        sd[f"{p}.mlp.0.weight"] = rng.normal(size=(2 * d_model, 2 * d_model)).astype(np.float32)
        sd[f"{p}.mlp.2.weight"] = rng.normal(size=(d_model, 2 * d_model)).astype(np.float32)
        for nm in ("norm1", "norm2"):
            sd[f"{p}.{nm}.weight"] = rng.normal(size=d_model).astype(np.float32)
            sd[f"{p}.{nm}.bias"] = rng.normal(size=d_model).astype(np.float32)
    return sd


def _tree_paths(d, pre=()):
    out = {}
    for k, v in d.items():
        if hasattr(v, "shape"):
            out[pre + (k,)] = tuple(v.shape)
        else:
            out.update(_tree_paths(v, pre + (k,)))
    return out


def _assert_trees_match(converted, model_tree, allow_missing=()):
    got = _tree_paths(converted)
    want = _tree_paths(model_tree)
    missing = {
        k: v for k, v in want.items()
        if k not in got and not any(a in k for a in allow_missing)
    }
    extra = {k: v for k, v in got.items() if k not in want}
    wrong = {
        k: (got[k], want[k]) for k in got
        if k in want and got[k] != want[k]
    }
    assert not missing, f"missing {len(missing)}: {list(missing)[:4]}"
    assert not extra, f"extra {len(extra)}: {list(extra)[:4]}"
    assert not wrong, f"shape mismatches: {list(wrong.items())[:4]}"


def test_loftr_rule_table_roundtrip(rng):
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.models import LoFTRMatcher
    from onepose_st_tpu.utils import convert_rules
    from onepose_st_tpu.utils.torch_convert import convert_state_dict

    sd = {}
    sd.update(_resnetfpn_sd(rng))
    sd.update(_encoder_sd(rng, "loftr_coarse", 8, 256))
    sd.update(_encoder_sd(rng, "loftr_fine", 2, 128))
    sd["pos_encoding.pe"] = rng.normal(size=(1, 256, 64, 64)).astype(np.float32)

    params, stats = convert_state_dict(sd, convert_rules.loftr_rules())

    cfg = cfg_lib.LoFTRConfig(
        backbone=cfg_lib.BackboneConfig(dtype="float32"),
        coarse=cfg_lib.TransformerConfig(layer_iter_n=4, dtype="float32"),
        fine=cfg_lib.FineMatchingConfig(window_size=9, dtype="float32"),
    )
    model = LoFTRMatcher(cfg)
    tree = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1))
        ),
        jax.random.key(0),
    )
    _assert_trees_match(params, tree["params"])
    _assert_trees_match(stats, tree.get("batch_stats", {}))


def test_onepose_rule_table_roundtrip(rng):
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.models import OnePoseMatcher
    from onepose_st_tpu.utils import convert_rules
    from onepose_st_tpu.utils.torch_convert import convert_state_dict

    sd = {}
    sd.update(_resnetfpn_sd(rng))
    sd.update(_encoder_sd(rng, "loftr_coarse", 6, 256))
    sd.update(_encoder_sd(rng, "loftr_fine", 2, 128))
    sd["dense_pos_encoding.pe"] = rng.normal(size=(1, 256, 64, 64)).astype(np.float32)
    # KeypointEncoding_linear: channels [3, 32, 64, 128, 256]
    chans = [3, 32, 64, 128, 256]
    for k in range(4):
        li = 3 * k
        sd[f"kpt_3d_pos_encoding.encoder.{li}.weight"] = rng.normal(
            size=(chans[k + 1], chans[k])
        ).astype(np.float32)
        sd[f"kpt_3d_pos_encoding.encoder.{li}.bias"] = rng.normal(
            size=chans[k + 1]
        ).astype(np.float32)
        if k < 3:
            bn = f"kpt_3d_pos_encoding.encoder.{li + 1}"
            sd[f"{bn}.weight"] = rng.normal(size=chans[k + 1]).astype(np.float32)
            sd[f"{bn}.bias"] = rng.normal(size=chans[k + 1]).astype(np.float32)
            sd[f"{bn}.running_mean"] = rng.normal(size=chans[k + 1]).astype(np.float32)
            sd[f"{bn}.running_var"] = rng.uniform(0.5, 2, size=chans[k + 1]).astype(np.float32)

    # this synthetic sd carries BN keys -> the batchnorm-family rule table
    # (the published instancenorm family is numerics-tested in
    # test_convert_numerics.py)
    params, stats = convert_state_dict(
        sd, convert_rules.onepose_rules(norm_method="batchnorm")
    )

    cfg = cfg_lib.MatcherConfig(
        backbone=cfg_lib.BackboneConfig(dtype="float32"),
        coarse=cfg_lib.TransformerConfig(dtype="float32"),
        fine=cfg_lib.FineMatchingConfig(dtype="float32"),
    )
    model = OnePoseMatcher(cfg)
    tree = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 16, 3)),
            jnp.zeros((1, 16, 256)), jnp.zeros((1, 16, 128)),
        ),
        jax.random.key(0),
    )
    _assert_trees_match(params, tree["params"])
    _assert_trees_match(stats, tree.get("batch_stats", {}))

    # BN folding is numerically exact in eval mode
    x = rng.normal(size=(5, 3)).astype(np.float32)
    w = sd["kpt_3d_pos_encoding.encoder.0.weight"]
    b = sd["kpt_3d_pos_encoding.encoder.0.bias"]
    g = sd["kpt_3d_pos_encoding.encoder.1.weight"]
    beta = sd["kpt_3d_pos_encoding.encoder.1.bias"]
    mu = sd["kpt_3d_pos_encoding.encoder.1.running_mean"]
    var = sd["kpt_3d_pos_encoding.encoder.1.running_var"]
    ref = (x @ w.T + b - mu) / np.sqrt(var + 1e-5) * g + beta
    ours = x @ params["kpt_encoding"]["Dense_0"]["kernel"] + params["kpt_encoding"]["Dense_0"]["bias"]
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def _densenet161_sd(rng):
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 2, size=c).astype(np.float32)

    def dense_block(prefix, c_in, n_layers, growth, bn_size=4):
        c = c_in
        for j in range(1, n_layers + 1):
            p = f"{prefix}.denselayer{j}"
            bn(f"{p}.norm1", c)
            conv(f"{p}.conv1", bn_size * growth, c, 1)
            bn(f"{p}.norm2", bn_size * growth)
            conv(f"{p}.conv2", growth, bn_size * growth, 3)
            c += growth
        return c

    f = "model.features"
    conv(f"{f}.conv0", 96, 3, 7)
    bn(f"{f}.norm0", 96)
    c = 96
    for bi, n_layers in enumerate((6, 12, 36, 24), start=1):
        c = dense_block(f"{f}.denseblock{bi}", c, n_layers, 48)
        if bi < 4:
            bn(f"{f}.transition{bi}.norm", c)
            conv(f"{f}.transition{bi}.conv", c // 2, c, 1)
            c //= 2
    assert c == 2208  # densenet161 classifier.in_features
    for h in ("roll", "rho", "vfov", "k1_hat", "hfov"):
        hp = f"{h}_head"
        bn(f"{hp}.0.norm", 2208)
        conv(f"{hp}.0.conv", 1104, 2208, 1)
        ch = dense_block(f"{hp}.1", 1104, 3, 32)
        bn(f"{hp}.2", ch)
        sd[f"{hp}.6.weight"] = rng.normal(size=(512, ch)).astype(np.float32)
        sd[f"{hp}.6.bias"] = rng.normal(size=512).astype(np.float32)
        sd[f"{hp}.8.weight"] = rng.normal(size=(256, 512)).astype(np.float32)
        sd[f"{hp}.8.bias"] = rng.normal(size=256).astype(np.float32)
    return sd


def test_calibnet_rule_table_roundtrip(rng):
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu.calib.model import CalibNet, densenet161_config
    from onepose_st_tpu.utils import convert_rules
    from onepose_st_tpu.utils.torch_convert import convert_state_dict

    sd = _densenet161_sd(rng)
    params, stats = convert_state_dict(sd, convert_rules.calibnet_rules())

    cfg = densenet161_config(dtype="float32")
    model = CalibNet(cfg)
    tree = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 224, 224, 3))),
        jax.random.key(0),
    )
    _assert_trees_match(params, tree["params"])
    _assert_trees_match(stats, tree.get("batch_stats", {}))
