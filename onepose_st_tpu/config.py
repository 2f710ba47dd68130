"""Single typed configuration tree for the whole framework.

Replaces the reference's four overlapping config systems (Hydra yaml +
yacs + inline cfg dicts + hand-rolled CONFIG class — see SURVEY.md §5).
Defaults reproduce the reference's published hyperparameters:
  configs/experiment/train.yaml:40-166 (OnePose++ matcher + training)
  src/KeypointFreeSfM/loftr_for_sfm/utils/loftr_for_onepose_plus_cfg.py
  (SfM LoFTR matcher).

Everything is a frozen dataclass so configs are hashable and can be passed
as jit static arguments.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclass(frozen=True)
class BackboneConfig:
    """ResNet-FPN 8/2 (reference backbone/resnet.py:85 ResNetFPN_8_2)."""
    initial_dim: int = 128
    block_dims: tuple[int, ...] = (128, 196, 256)
    coarse_stride: int = 8   # resolution[0]
    fine_stride: int = 2     # resolution[1]
    # compute dtype for conv path; params stay f32
    dtype: str = "bfloat16"
    # FPN 2x upsample convention: False = half-pixel (jax.image.resize, our
    # TPU-native default), True = torch align_corners=True parity — required
    # when running CONVERTED reference checkpoints (resnet.py:151,155
    # F.interpolate(..., align_corners=True)); fresh training doesn't care.
    upsample_align_corners: bool = False


@dataclass(frozen=True)
class TransformerConfig:
    """LoFTR-style self/cross transformer (reference loftr_module/transformer.py)."""
    d_model: int = 256
    nhead: int = 8
    layer_iter_n: int = 3          # number of (self, cross) iterations
    attention: str = "linear"      # 'linear' | 'full'
    dtype: str = "bfloat16"


@dataclass(frozen=True)
class CoarseMatchingConfig:
    """Dual-softmax coarse matching (reference utils/coarse_matching.py:58)."""
    temperature: float = 0.08
    threshold: float = 0.1
    border_rm: int = 2
    # static capacity of extracted matches (replaces torch.where dynamic shapes)
    max_matches: int = 1024
    # training-time slot budget (reference coarse_matching.py:177-217):
    # predictions fill at most `train_coarse_percent` of the max_matches
    # slots; the rest are sampled GT pairs (at least train_pad_num_gt_min)
    train_coarse_percent: float = 0.3
    train_pad_num_gt_min: int = 200


@dataclass(frozen=True)
class FineMatchingConfig:
    """Fine window refinement (reference fine_preprocess.py + fine_matching.py).

    Deviation from the reference's nhead=8 linear attention: at W*W = 25
    window tokens, exact softmax attention is CHEAPER than the linear
    kernel, and 8 heads of d=16 produce 65k micro-matmuls that strand the
    MXU. Single-head full attention measured 2.4x faster on v5e (10.3 ms ->
    4.3 ms at B=8, K=1024) with the same modelling role; the reference
    settings remain expressible via config.
    """
    window_size: int = 5
    d_model: int = 128
    nhead: int = 1
    layer_iter_n: int = 1
    attention: str = "full"
    dtype: str = "bfloat16"


@dataclass(frozen=True)
class KeypointEncodingConfig:
    """3D keypoint MLP encoding (reference utils/position_encoding.py:46)."""
    hidden: tuple[int, ...] = (32, 64, 128)
    descriptor_dim: int = 256


@dataclass(frozen=True)
class MatcherConfig:
    """OnePose++ 2D-3D matcher (reference OnePosePlusModel.py; train.yaml:44-127)."""
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    coarse: TransformerConfig = field(default_factory=TransformerConfig)
    coarse_matching: CoarseMatchingConfig = field(default_factory=CoarseMatchingConfig)
    fine: FineMatchingConfig = field(default_factory=FineMatchingConfig)
    kpt_encoding: KeypointEncodingConfig = field(default_factory=KeypointEncodingConfig)
    # static number of 3D points after padding; 7000 in the reference
    # (train.yaml:194), rounded up to a lane-aligned multiple of 128 for MXU.
    n_points: int = _round_up(7000, 128)  # 7040
    # "intended" for fresh training; "loftr_compat" for converted reference
    # checkpoints (see models/encodings.py)
    pe_variant: str = "intended"


@dataclass(frozen=True)
class LoFTRConfig:
    """2D-2D LoFTR matcher for SfM + detection (reference
    loftr_for_onepose_plus_cfg.py: wsize9, 4 iters, thr 0.2, T 0.1)."""
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    coarse: TransformerConfig = field(
        default_factory=lambda: TransformerConfig(layer_iter_n=4)
    )
    coarse_matching: CoarseMatchingConfig = field(
        default_factory=lambda: CoarseMatchingConfig(
            temperature=0.1, threshold=0.2, max_matches=2048
        )
    )
    fine: FineMatchingConfig = field(
        default_factory=lambda: FineMatchingConfig(window_size=9)
    )
    # "intended" for fresh training; "loftr_compat" for converted reference
    # checkpoints (see models/encodings.py)
    pe_variant: str = "intended"


@dataclass(frozen=True)
class LossConfig:
    """Focal coarse + std-weighted L2 fine loss (reference losses.py; train.yaml:128-145)."""
    coarse_weight: float = 1.0
    fine_weight: float = 0.81
    focal_alpha: float = 0.5
    focal_gamma: float = 2.0
    pos_weight: float = 1.0
    neg_weight: float = 1.0
    fine_correct_thr: float = 1.0
    fused_coarse: bool = True     # fused Pallas dual-softmax+focal custom-VJP
                                  # (gamma=2 only); False = dense XLA path


@dataclass(frozen=True)
class TrainConfig:
    """Training recipe (reference train.yaml:16-166 + train_onepose_plus.py:24-43)."""
    loss: LossConfig = field(default_factory=LossConfig)
    canonical_bs: int = 4
    canonical_lr: float = 1e-4
    batch_size_per_device: int = 4
    weight_decay: float = 0.1          # adamw_decay
    grad_clip: float = 0.5
    epochs: int = 25
    lr_milestones: tuple[int, ...] = (3, 6, 9, 12)
    lr_gamma: float = 0.5
    seed: int = 12345
    # keep the (pretrained) backbone frozen for the first N optimizer steps
    # (reference src/callbacks/custom_callbacks.py unfreeze-after-N-epochs)
    freeze_backbone_steps: int = 0
    # micro-steps averaged per optimizer update (reference
    # train.yaml:33 accumulate_grad_batches: 2); LR scaling excludes it,
    # matching train_onepose_plus.py:36-40 (true bs = world x per-device bs)
    accumulate_steps: int = 1

    def true_lr(self, world_size: int) -> float:
        """world-size LR scaling, reference train_onepose_plus.py:24-39."""
        return self.canonical_lr * (
            world_size * self.batch_size_per_device / self.canonical_bs
        )


@dataclass(frozen=True)
class PnPConfig:
    """RANSAC PnP (reference metric_utils.py:121-209, inference.py:181-189)."""
    reproj_threshold_px: float = 7.0
    n_hypotheses: int = 512       # vectorized fixed-trial RANSAC
    sample_size: int = 6          # DLT minimal set (2 eqs/point, 11 dof)
    refine_iters: int = 10        # Gauss-Newton polish on inliers
    min_inliers: int = 20         # re-detect threshold (inference.py:150)
    solver: str = "p3p"           # "dlt" | "p3p" | "mixed" hypothesis solver:
                                  # P3P 3-point samples survive much higher
                                  # outlier rates (pycolmap robustness bar,
                                  # metric_utils.py:155-165); DLT-6 is the
                                  # most accurate at low contamination
    lo_rounds: int = 2            # LO-RANSAC: re-solve from the best inlier
    lo_hypotheses: int = 64       # set with larger non-minimal samples
    lo_sample_size: int = 16
    tight_refine_px: float = 0.0  # >0: second Gauss-Newton stage on inliers
                                  # reselected at this tight threshold (the
                                  # sub-centimetre regime is rotation-bound;
                                  # a 1-1.5 px tight set de-weights the
                                  # loose-threshold tail)
    recenter_iters: int = 0       # inference-time fine re-centering rounds:
                                  # re-run the fine stage with windows at the
                                  # current pose's reprojections, then re-run
                                  # PnP (mirrors the map-side refine_iters
                                  # win, sfm/pipeline.py:258-280)


@dataclass(frozen=True)
class SfMConfig:
    """Keypoint-free SfM engine (reference run.py + KeypointFreeSfM/*)."""
    covis_num: int = 10
    min_rotation_deg: float = 10.0
    max_num_points3d: int = 15000
    # static per-pair match capacity
    max_matches_per_pair: int = 2048
    # track capacities for BA (reference pads to max_track_length)
    max_track_length: int = 16
    # keypoint-merge grid (px). 2.0 keeps sub-pixel (symmetric-fine) anchors
    # of one feature on a stable key while still separating distinct coarse
    # cells (centers 8 px apart); score-weighted float averaging preserves
    # the sub-pixel coordinate either way. The reference merges on its int
    # grid (coarse_match.py:188-214).
    merge_quant_px: float = 2.0
    # two-view geometric verification
    epipolar_threshold_px: float = 4.0
    # triangulation acceptance
    min_triangulation_angle_deg: float = 1.5
    max_reproj_error_px: float = 4.0
    # BA
    ba_max_iters: int = 32
    ba_huber_px: float = 2.0
    # "depth": per-track reference-view depth only (reference DeepLM
    # parity, residual.py:6-79) — constrains each point to the ray through
    # its GRID-QUANTIZED anchor keypoint (LoFTR's kpt0 is always a coarse
    # cell center), which floors map reprojection error near the coarse
    # quantization noise. "point": free 3-DoF point Gauss-Newton over ALL
    # (fine-refined) observations with poses fixed — the anchor becomes
    # one observation among M instead of defining the ray.
    ba_mode: str = "point"
    # fine-refinement passes over track observations (ba_mode="point" with
    # a refine_observations callback). Pass 1 re-refines each observation
    # inside its own matched coarse cell (reference post-optimization
    # fine_matcher); passes >=2 re-center the fine window on the
    # REPROJECTION of the BA-refined 3D point, reaching observations whose
    # true correspondence lies outside the original cell's fine window
    # (the +-(fine window) cap the reference's single-pass design has,
    # fine_matching.py:84-110) and re-solving the point GN after each pass.
    refine_iters: int = 1
    # optional extrinsics+points global BA after the depth-only stage
    # (reference sfm_utils/global_ba.py `colmap bundle_adjuster` with
    # refine_extrinsics=1, intrinsics fixed); first two frames gauge-fixed
    enable_global_ba: bool = False
    global_ba_max_iters: int = 16
    # post-filter: merge map points closer than this (meters). Duplicate
    # points split dual-softmax probability mass at inference, so this also
    # acts on matcher confidence calibration.
    merge_radius: float = 1e-3


@dataclass(frozen=True)
class TrackerConfig:
    """Learned windowed point tracker (reference: CoTracker2 submodule, used
    by inference.py:239-398 for post-hoc temporal pose refinement).

    A CoTracker-style iterative tracker: per-(frame, point) tokens built
    from a multi-scale correlation pyramid around the current estimate,
    refined by a transformer that alternates attention over the time axis
    and over the point set, applied `update_iters` times with shared
    weights. Window length and point capacity are static (XLA shapes).
    """
    window: int = 8            # frames per tracked window (CoTracker: 8)
    stride: int = 4            # feature-map stride of the encoder
    feat_dim: int = 128        # encoder output channels
    levels: int = 3            # correlation pyramid levels (x1, x2, x4 pooling)
    radius: int = 3            # correlation window radius -> (2r+1)^2 taps/level
    d_model: int = 256
    nhead: int = 8
    num_blocks: int = 3        # (time-attn, point-attn) blocks per iteration
    update_iters: int = 4
    flow_freqs: int = 8        # sinusoidal frequencies for the Δuv embedding
    dtype: str = "bfloat16"


@dataclass(frozen=True)
class EngineConfig:
    """Top-level config."""
    matcher: MatcherConfig = field(default_factory=MatcherConfig)
    loftr: LoFTRConfig = field(default_factory=LoFTRConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    pnp: PnPConfig = field(default_factory=PnPConfig)
    sfm: SfMConfig = field(default_factory=SfMConfig)
    tracker: TrackerConfig = field(default_factory=TrackerConfig)


def replace(cfg, **kwargs):
    """dataclasses.replace passthrough for ergonomic overrides."""
    return dataclasses.replace(cfg, **kwargs)


def to_dict(cfg) -> dict:
    """Config tree -> plain JSON-serializable dict (tuples become lists)."""
    return dataclasses.asdict(cfg)


def from_dict(cls, d: dict):
    """Rebuild a config dataclass from to_dict output.

    Unknown keys are ignored (forward compatibility); missing keys keep
    the class defaults; lists are coerced back to tuples where the default
    is a tuple. Used to rehydrate the model_config.json written next to
    training checkpoints, so inference/SfM CLIs reconstruct the exact
    architecture a checkpoint was trained with.
    """
    base = cls()
    updates = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        cur = getattr(base, f.name)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            v = from_dict(type(cur), v)
        elif isinstance(cur, tuple) and isinstance(v, (list, tuple)):
            v = tuple(v)
        updates[f.name] = v
    return dataclasses.replace(base, **updates)


def save_model_config(ckpt_dir, cfg) -> None:
    """Write <ckpt_dir>/model_config.json describing a checkpoint's model."""
    import json
    from pathlib import Path

    p = Path(ckpt_dir)
    p.mkdir(parents=True, exist_ok=True)
    (p / "model_config.json").write_text(
        json.dumps({"kind": type(cfg).__name__, "config": to_dict(cfg)},
                   indent=1)
    )


def load_model_config(ckpt_dir):
    """Load the config saved by save_model_config, or None if absent.

    Returns the rehydrated dataclass (dtype fields re-adapted to the active
    backend by the caller via adapt_dtypes if desired).
    """
    import json
    from pathlib import Path

    p = Path(ckpt_dir) / "model_config.json"
    if not p.exists():
        return None
    blob = json.loads(p.read_text())
    kinds = {
        "LoFTRConfig": LoFTRConfig,
        "MatcherConfig": MatcherConfig,
        "EngineConfig": EngineConfig,
        "TrackerConfig": TrackerConfig,
    }
    if blob.get("kind") == "CalibConfig":
        from .calib.model import CalibConfig

        kinds["CalibConfig"] = CalibConfig
    cls = kinds.get(blob.get("kind"))
    if cls is None:
        raise ValueError(f"unknown config kind in {p}: {blob.get('kind')}")
    return from_dict(cls, blob["config"])


def _map_dtype_fields(cfg, new_dtype: str):
    if not dataclasses.is_dataclass(cfg):
        return cfg
    updates = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if f.name == "dtype" and isinstance(v, str):
            if v != new_dtype:
                updates[f.name] = new_dtype
        elif dataclasses.is_dataclass(v):
            nv = _map_dtype_fields(v, new_dtype)
            if nv is not v:
                updates[f.name] = nv
    return dataclasses.replace(cfg, **updates) if updates else cfg


def adapt_dtypes(cfg, backend: str | None = None):
    """Rewrite every `dtype` field for the active backend.

    bf16 is the right compute dtype on TPU (MXU-native) but the XLA CPU
    backend cannot execute bf16 dots, so CPU runs (tests, dev machines)
    get float32.
    """
    if backend is None:
        import jax

        backend = jax.default_backend()
    return _map_dtype_fields(cfg, "float32" if backend == "cpu" else "bfloat16")
