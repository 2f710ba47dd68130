"""Per-checkpoint conversion rule tables: reference torch ckpts -> our flax.

Complements utils/torch_convert.py (the exact primitive mappings + rule
walker) with the concrete rule sets for the three checkpoint families the
reference loads (SURVEY.md §7 "weight conversion"):

  * LoFTR wsize9 (2D-2D SfM matcher) — reference load site
    src/KeypointFreeSfM/coarse_match/coarse_match_worker.py:23-26, module
    tree from the vendored transformer/backbone code
    (loftr_for_onepose_plus_cfg.py: ResNetFPN_8_2 128/(128,196,256),
    4x(self,cross) d=256 coarse, 1x(self,cross) d=128 fine,
    FINE_CONCAT_COARSE_FEAT=False -> parameter-free fine_preprocess);
  * OnePose++ 2D-3D matcher — load site
    src/inference/inference_OnePosePlus.py:34-38 (after `matcher.` prefix
    surgery), module tree src/models/OnePosePlus/OnePosePlusModel.py
    (same backbone, KeypointEncoding_linear MLP with BatchNorm1d folded
    into the adjacent Linear — numerically exact in eval mode, our MLP
    carries no norm layers — 3x(self,cross) coarse, 1x(self,cross) fine);
  * DeepSingleImageCalibration DenseNet-161 — load site
    src/utils/calib/demo.py:49-119, torchvision densenet161 trunk
    (norm5 dropped, densenet.py:83) + per-quantity heads (transition ->
    3-layer dense block (growth 32) -> BN -> GAP -> 512 -> bins,
    densenet.py:65-95) which CalibHead mirrors 1:1.

Each builder returns a rule list for torch_convert.convert_state_dict;
tests/test_torch_convert.py round-trips synthetic state_dicts carrying the
reference's exact key names and shape-checks the result against our
models' actual parameter trees.
"""
from __future__ import annotations

import numpy as np

from .torch_convert import ConvertRule, batchnorm, conv_kernel, dense_kernel

_BN_SUFFIX = r"(weight|bias|running_mean|running_var|num_batches_tracked)"


def _conv(dst_path):
    def emit(m, sd):
        return {tuple(dst_path) + ("kernel",): conv_kernel(sd[m.group(0)])}

    return emit


def _dense(dst_path, bias: bool = False):
    def emit(m, sd):
        key = m.group(0)
        out = {tuple(dst_path) + ("kernel",): dense_kernel(sd[key])}
        if bias:
            out[tuple(dst_path) + ("bias",)] = np.asarray(
                sd[key.replace(".weight", ".bias")]
            )
        return out

    return emit


def _bn(src_prefix, dst_path):
    """BatchNorm: params (scale/bias) + batch_stats (mean/var)."""

    def emit(m, sd):
        params, stats = batchnorm(src_prefix, sd)
        dst = tuple(dst_path)
        return {
            dst + ("scale",): params["scale"],
            dst + ("bias",): params["bias"],
            ("batch_stats",) + dst + ("mean",): stats["mean"],
            ("batch_stats",) + dst + ("var",): stats["var"],
        }

    return emit


def _ln(src_prefix, dst_path):
    """LayerNorm weight/bias -> scale/bias (no running stats)."""

    def emit(m, sd):
        dst = tuple(dst_path)
        return {
            dst + ("scale",): np.asarray(sd[f"{src_prefix}.weight"]),
            dst + ("bias",): np.asarray(sd[f"{src_prefix}.bias"]),
        }

    return emit


def _skip(m, sd):
    return {}


def resnetfpn_rules(src: str = "backbone", dst: str = "backbone") -> list[ConvertRule]:
    """ResNetFPN_8_2 (reference backbone/resnet.py:85-160) -> our
    models/backbone.ResNetFPN. Flax auto-numbering (from the module call
    order): Conv_0/BatchNorm_0 stem; BasicBlock_{2(L-1)+B} for layerL.B
    with Conv_0/Conv_1/BatchNorm_0/BatchNorm_1 (+Conv_2/BatchNorm_2 for the
    stride-2 downsample); FPN convs Conv_1..Conv_7 and BatchNorm_1/2."""
    e = lambda s: s.replace(".", r"\.")  # noqa: E731
    rules: list[ConvertRule] = [
        (e(f"{src}.conv1.weight"), _conv((dst, "Conv_0"))),
        (e(f"{src}.bn1.") + _BN_SUFFIX, _bn(f"{src}.bn1", (dst, "BatchNorm_0"))),
        (e(f"{src}.layer3_outconv.weight"), _conv((dst, "Conv_1"))),
        (e(f"{src}.layer2_outconv.weight"), _conv((dst, "Conv_2"))),
        (e(f"{src}.layer2_outconv2.0.weight"), _conv((dst, "Conv_3"))),
        (
            e(f"{src}.layer2_outconv2.1.") + _BN_SUFFIX,
            _bn(f"{src}.layer2_outconv2.1", (dst, "BatchNorm_1")),
        ),
        (e(f"{src}.layer2_outconv2.3.weight"), _conv((dst, "Conv_4"))),
        (e(f"{src}.layer1_outconv.weight"), _conv((dst, "Conv_5"))),
        (e(f"{src}.layer1_outconv2.0.weight"), _conv((dst, "Conv_6"))),
        (
            e(f"{src}.layer1_outconv2.1.") + _BN_SUFFIX,
            _bn(f"{src}.layer1_outconv2.1", (dst, "BatchNorm_2")),
        ),
        (e(f"{src}.layer1_outconv2.3.weight"), _conv((dst, "Conv_7"))),
    ]
    for L in (1, 2, 3):
        for B in (0, 1):
            blk = f"BasicBlock_{2 * (L - 1) + B}"
            p = f"{src}.layer{L}.{B}"
            rules += [
                (e(f"{p}.conv1.weight"), _conv((dst, blk, "Conv_0"))),
                (e(f"{p}.conv2.weight"), _conv((dst, blk, "Conv_1"))),
                (e(f"{p}.bn1.") + _BN_SUFFIX, _bn(f"{p}.bn1", (dst, blk, "BatchNorm_0"))),
                (e(f"{p}.bn2.") + _BN_SUFFIX, _bn(f"{p}.bn2", (dst, blk, "BatchNorm_1"))),
                (e(f"{p}.downsample.0.weight"), _conv((dst, blk, "Conv_2"))),
                (
                    e(f"{p}.downsample.1.") + _BN_SUFFIX,
                    _bn(f"{p}.downsample.1", (dst, blk, "BatchNorm_2")),
                ),
            ]
    return rules


def encoder_stack_rules(
    src: str, dst: str, n_iters: int
) -> list[ConvertRule]:
    """LocalFeatureTransformer (transformer.py:97: layers = ['self','cross']
    * layer_iter_n) -> our loftr stack named {self,cross}_{k}. The encoder
    layer (transformer.py:7-95): bias-free q/k/v/merge + 2-layer bias-free
    MLP + two LayerNorms."""
    e = lambda s: s.replace(".", r"\.")  # noqa: E731
    rules: list[ConvertRule] = []
    for i in range(2 * n_iters):
        name = ("self" if i % 2 == 0 else "cross") + f"_{i // 2}"
        p = f"{src}.layers.{i}"
        rules += [
            (e(f"{p}.q_proj.weight"), _dense((dst, name, "q_proj"))),
            (e(f"{p}.k_proj.weight"), _dense((dst, name, "k_proj"))),
            (e(f"{p}.v_proj.weight"), _dense((dst, name, "v_proj"))),
            (e(f"{p}.merge.weight"), _dense((dst, name, "merge"))),
            (e(f"{p}.mlp.0.weight"), _dense((dst, name, "Dense_0"))),
            (e(f"{p}.mlp.2.weight"), _dense((dst, name, "Dense_1"))),
            (e(f"{p}.norm1.weight"), _ln(f"{p}.norm1", (dst, name, "LayerNorm_0"))),
            (e(f"{p}.norm2.weight"), _ln(f"{p}.norm2", (dst, name, "LayerNorm_1"))),
            (e(f"{p}.norm1.bias"), _skip),
            (e(f"{p}.norm2.bias"), _skip),
        ]
    return rules


def _folded_dense(lin_prefix: str, bn_prefix: str, dst_path):
    """Linear + following BatchNorm1d folded into one Dense — numerically
    exact in eval mode: w' = diag(g/sqrt(v+eps)) w, b' = g(b-m)/sqrt(v+eps)+B.
    (Our kpt-encoding MLP carries no norm layers; the reference's
    KeypointEncoding_linear interleaves BatchNorm1d, position_encoding.py:63.)
    """

    def emit(m, sd):
        w = np.asarray(sd[f"{lin_prefix}.weight"], np.float64)  # [O, I]
        b = np.asarray(sd[f"{lin_prefix}.bias"], np.float64)
        g = np.asarray(sd[f"{bn_prefix}.weight"], np.float64)
        beta = np.asarray(sd[f"{bn_prefix}.bias"], np.float64)
        mean = np.asarray(sd[f"{bn_prefix}.running_mean"], np.float64)
        var = np.asarray(sd[f"{bn_prefix}.running_var"], np.float64)
        s = g / np.sqrt(var + 1e-5)  # torch BN default eps
        w2 = (w * s[:, None]).astype(np.float32)
        b2 = ((b - mean) * s + beta).astype(np.float32)
        dst = tuple(dst_path)
        return {
            dst + ("kernel",): np.ascontiguousarray(w2.T),
            dst + ("bias",): b2,
        }

    return emit


def kpt_encoding_rules(
    src: str = "kpt_3d_pos_encoding", dst: str = "kpt_encoding",
    layers: tuple[int, ...] = (32, 64, 128),
    norm_method: str = "instancenorm",
) -> list[ConvertRule]:
    """KeypointEncoding_linear (position_encoding.py:46-80): Sequential of
    Linear/norm/ReLU triples + final Linear; Linears sit at indices 0,3,6,..
    norms at 1,4,7,..

    norm_method must match the checkpoint's training config:
      * "instancenorm" (the published OnePose++ config, train.yaml:63):
        InstanceNorm1d on [B, L, C] normalizes each point's feature vector
        affine-free and contributes NO state_dict keys — plain dense
        mapping; our KeypointEncoding reproduces that normalization.
      * "batchnorm": BN1d keys are folded into the preceding Linear
        (numerically exact in eval mode) — NOTE our module still applies
        its per-point normalization after each hidden Dense, so this
        variant is shape-correct but NOT activation-exact; only the
        instancenorm family has a real published checkpoint.
    """
    e = lambda s: s.replace(".", r"\.")  # noqa: E731
    rules: list[ConvertRule] = []
    n = len(layers) + 1  # number of Linears
    for k in range(n):
        li = 3 * k
        lin = f"{src}.encoder.{li}"
        if k < n - 1 and norm_method == "batchnorm":
            bn = f"{src}.encoder.{li + 1}"
            rules.append((e(f"{lin}.weight"), _folded_dense(lin, bn, (dst, f"Dense_{k}"))))
            rules.append((e(f"{lin}.bias"), _skip))
            rules.append((e(f"{bn}.") + _BN_SUFFIX, _skip))
        else:
            rules.append((e(f"{lin}.weight"), _dense((dst, f"Dense_{k}"), bias=True)))
            rules.append((e(f"{lin}.bias"), _skip))
    return rules


def loftr_rules() -> list[ConvertRule]:
    """Full rule table for the LoFTR-wsize9 2D-2D checkpoint (after any
    prefix surgery down to bare module names)."""
    return (
        resnetfpn_rules("backbone", "backbone")
        + encoder_stack_rules("loftr_coarse", "loftr_coarse", n_iters=4)
        + encoder_stack_rules("loftr_fine", "loftr_fine", n_iters=1)
        + [(r"pos_encoding\.pe", _skip)]  # fixed sine table, not learned
    )


def onepose_rules(norm_method: str = "instancenorm") -> list[ConvertRule]:
    """Full rule table for the OnePose++ 2D-3D matcher checkpoint (after
    stripping the Lightning `matcher.` prefix, model_io.py surgery).
    norm_method: the checkpoint's keypoints_encoding norm (train.yaml:63
    publishes "instancenorm"; see kpt_encoding_rules)."""
    return (
        resnetfpn_rules("backbone", "backbone")
        + kpt_encoding_rules(norm_method=norm_method)
        + encoder_stack_rules("loftr_coarse", "loftr_coarse", n_iters=3)
        + encoder_stack_rules("loftr_fine", "loftr_fine", n_iters=1)
        + [(r"dense_pos_encoding\.pe", _skip)]
    )


# ---------------------------------------------------------------------------
# DenseNet-161 calibration net
# ---------------------------------------------------------------------------

def _densenet_block_rules(
    src: str, dst_prefix: tuple, n_layers: int
) -> list[ConvertRule]:
    """torchvision _DenseBlock: denselayer{j}.norm1/conv1/norm2/conv2 (j is
    1-based) -> our DenseBlock/DenseLayer_{j-1} (BN-relu-conv x2)."""
    e = lambda s: s.replace(".", r"\.")  # noqa: E731
    rules: list[ConvertRule] = []
    for j in range(1, n_layers + 1):
        p = f"{src}.denselayer{j}"
        d = dst_prefix + (f"DenseLayer_{j - 1}",)
        rules += [
            (e(f"{p}.norm1.") + _BN_SUFFIX, _bn(f"{p}.norm1", d + ("BatchNorm_0",))),
            (e(f"{p}.conv1.weight"), _conv(d + ("Conv_0",))),
            (e(f"{p}.norm2.") + _BN_SUFFIX, _bn(f"{p}.norm2", d + ("BatchNorm_1",))),
            (e(f"{p}.conv2.weight"), _conv(d + ("Conv_1",))),
        ]
    return rules


def _transition_rules(src: str, dst_prefix: tuple) -> list[ConvertRule]:
    e = lambda s: s.replace(".", r"\.")  # noqa: E731
    return [
        (e(f"{src}.norm.") + _BN_SUFFIX, _bn(f"{src}.norm", dst_prefix + ("BatchNorm_0",))),
        (e(f"{src}.conv.weight"), _conv(dst_prefix + ("Conv_0",))),
    ]


def calibnet_rules(
    block_layers: tuple[int, ...] = (6, 12, 36, 24),
    heads: tuple[str, ...] = ("roll", "rho", "vfov", "k1_hat"),
    head_dense_layers: int = 3,
) -> list[ConvertRule]:
    """Full rule table for the DeepSingleImageCalibration DenseNet-161
    checkpoint (calib/demo.py:49-119): torchvision densenet161 trunk under
    `model.features.` (norm5 replaced by Identity, densenet.py:83) + the
    per-quantity Sequential heads `{name}_head.{idx}` (0 transition,
    1 dense block, 2 BN, 6 Linear-512, 8 Linear-bins). The reference also
    builds an hfov_head (densenet.py:94) that `calibrate` never uses
    (demo.py heads roll/rho/vfov/k1_hat) — its keys are consumed and
    dropped, as is the unused trunk classifier."""
    e = lambda s: s.replace(".", r"\.")  # noqa: E731
    src = "model.features"
    rules: list[ConvertRule] = [
        (e(f"{src}.conv0.weight"), _conv(("Conv_0",))),
        (e(f"{src}.norm0.") + _BN_SUFFIX, _bn(f"{src}.norm0", ("BatchNorm_0",))),
        # norm5 is Identity in the reference; tolerate a raw torchvision ckpt
        (e(f"{src}.norm5.") + _BN_SUFFIX, _skip),
        (r"model\.classifier\..*", _skip),
    ]
    for bi, n_layers in enumerate(block_layers):
        rules += _densenet_block_rules(
            f"{src}.denseblock{bi + 1}", (f"DenseBlock_{bi}",), n_layers
        )
        if bi < len(block_layers) - 1:
            rules += _transition_rules(
                f"{src}.transition{bi + 1}", (f"Transition_{bi}",)
            )
    for h in heads:
        hp = f"{h}_head"
        rules += _transition_rules(f"{hp}.0", (hp, "Transition_0"))
        rules += _densenet_block_rules(f"{hp}.1", (hp, "DenseBlock_0"), head_dense_layers)
        rules += [
            (e(f"{hp}.2.") + _BN_SUFFIX, _bn(f"{hp}.2", (hp, "BatchNorm_0"))),
            (e(f"{hp}.6.weight"), _dense((hp, "Dense_0"), bias=True)),
            (e(f"{hp}.6.bias"), _skip),
            (e(f"{hp}.8.weight"), _dense((hp, "Dense_1"), bias=True)),
            (e(f"{hp}.8.bias"), _skip),
        ]
    # heads the reference builds but never evaluates
    rules.append((r"hfov_head\..*", _skip))
    return rules
