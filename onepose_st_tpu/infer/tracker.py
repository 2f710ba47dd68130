"""Temporal point tracking + post-hoc pose refinement.

Re-design of the reference's CoTracker2 phase (inference.py:239-398): for
each frame past `temp_thresh`, the 2D inlier points of the previous
`window-1` frames are tracked into the current frame and injected — with
their known 3D partners — into a second RANSAC PnP.

Two tracker backends fill the CoTrackerPredictor(..., backward_tracking)
role:
  * `TemporalTracker` — THE SHIPPED DEFAULT: a zero-training chained
    correlation tracker over the matcher backbone's fine (stride-2)
    features: each query keeps its source-frame descriptor and is advanced
    frame-by-frame by correlating against a (2r+1)^2 search window with
    soft-argmax refinement. Every demonstrated refinement win
    (EXPERIMENTS.md temporal-refinement studies) comes from this backend.
  * `LearnedTemporalTracker` — EXPERIMENTAL: the trained CoTracker-style
    windowed transformer (`models/tracker.py`), occlusion-aware like the
    reference's; one jitted program tracks a whole window and feeds the
    same union-PnP. As of round 3 its positional accuracy loses to the
    correlation chain on every study (accepted learned tracks degraded
    refined poses, logs/refine_hybrid_r3.log) — do not ship it as a
    default until it beats `TemporalTracker` on the intermittent-failure
    protocol.
`refine_sequence` accepts either.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..ops import sampling as sampling_ops
from ..solvers import ransac_pnp
from .pipeline import FrameResult


class TemporalTracker:
    def __init__(
        self,
        matcher_model,
        matcher_variables,
        search_radius: int = 12,
        iters: int = 2,
        temperature: float = 0.05,
    ):
        self.model = matcher_model
        self.variables = matcher_variables
        self.radius = search_radius
        self.iters = iters
        self.temperature = temperature

        def feats(variables, imgs):
            # fine (stride-2) backbone features of the matcher
            _, ff = matcher_model.apply(
                variables, imgs, train=False,
                method=lambda m, im, train: m.backbone(im, train),
            )
            return ff

        self._feats = jax.jit(feats)
        self._track_step = jax.jit(
            partial(
                _track_points_step,
                radius=self.radius,
                iters=self.iters,
                temperature=self.temperature,
            )
        )
        self._sample_desc = jax.jit(
            lambda feat, uv, stride: sampling_ops.sample_descriptors(
                feat[None], uv[None], stride
            )[0]
        )

    def features(self, frames: np.ndarray, chunk: int = 32) -> jax.Array:
        """[T, H, W] grayscale -> [T, Hf, Wf, C] fine features.

        Chunked over frames: backbone activations for a whole video in one
        call would exceed HBM (same pattern as sfm/pipeline.py's batched
        pair matching). Only the [T, Hf, Wf, C] output stays resident.
        """
        T = frames.shape[0]
        outs = []
        for s in range(0, T, chunk):
            outs.append(
                self._feats(self.variables, jnp.asarray(frames[s:s + chunk, ..., None]))
            )
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def track_chain(
        self,
        feat_seq: jax.Array,    # [T, Hf, Wf, C]
        start_uv: jax.Array,    # [N, 2] image pixels in frame `start`
        start: int,
        target: int,
        stride: float = 2.0,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Track points from frame `start` to `target` through every
        intermediate frame. Returns (uv_target [N,2], peak_conf [N])."""
        desc = sampling_ops.sample_descriptors(
            feat_seq[start][None], jnp.asarray(start_uv)[None], stride
        )[0]
        uv = jnp.asarray(start_uv)
        conf = jnp.ones(uv.shape[0])
        step = 1 if target >= start else -1
        for f in range(start + step, target + step, step):
            uv, conf = self._track_step(feat_seq[f], desc, uv, stride)
        return np.asarray(uv), np.asarray(conf)


def _track_points_step(
    feat: jax.Array,      # [Hf, Wf, C] target-frame features
    desc: jax.Array,      # [N, C] source descriptors (L2-normalized)
    uv: jax.Array,        # [N, 2] current estimate (image px)
    stride: float,
    radius: int,
    iters: int,
    temperature: float,
) -> tuple[jax.Array, jax.Array]:
    """One frame advance: correlation search + soft-argmax, iterated."""
    Hf, Wf, C = feat.shape
    r = radius
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    grid = jnp.stack([dx, dy], axis=-1).reshape(-1, 2)   # [(2r+1)^2, 2] feat units

    conf = jnp.ones(uv.shape[0])
    for _ in range(iters):
        uv_feat = (uv + 0.5) / stride - 0.5              # image -> feature coords
        cand = uv_feat[:, None, :] + grid[None]          # [N, W2, 2]
        # sample candidate descriptors: [N, W2, C]
        f = sampling_ops.bilinear_sample(
            feat[None], cand.reshape(1, -1, 2)
        ).reshape(uv.shape[0], grid.shape[0], C)
        f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)
        corr = jnp.einsum("nc,nwc->nw", desc, f)         # cosine similarity
        # hard peak + sub-cell expectation over the peak's 3x3 neighbourhood
        # (a global soft-argmax collapses toward zero on flat correlation
        # surfaces)
        peak = jnp.argmax(corr, axis=-1)
        peak_off = grid[peak]                            # [N, 2]
        near = (
            jnp.max(jnp.abs(grid[None] - peak_off[:, None]), axis=-1) <= 1.0
        )
        logits = jnp.where(near, corr / temperature, -1e9)
        w = jax.nn.softmax(logits, axis=-1)
        delta = jnp.einsum("nw,wj->nj", w, grid)         # offset (feat units)
        uv = (uv_feat + delta + 0.5) * stride - 0.5
        conf = jnp.max(corr, axis=-1)
    return uv, conf


class LearnedTemporalTracker:
    """Trained CoTracker-style windowed tracker backend.

    Wraps `models.tracker.CoTrackerNet`: `variables` come from
    `train/tracker_train.py` training (see examples/train_tracker.py) via
    `load_params` / `save_params`. `vis_threshold` gates tracked points on
    the predicted visibility probability before they enter the union PnP.
    """

    def __init__(
        self,
        tracker_cfg,
        variables,
        vis_threshold: float = 0.5,
        polish: "TemporalTracker | None" = None,
        polish_radius: int = 3,
    ):
        from ..models.tracker import CoTrackerNet

        self.cfg = tracker_cfg
        self.model = CoTrackerNet(tracker_cfg)
        self.variables = variables
        self.vis_threshold = vis_threshold
        # hybrid backend: the transformer proposes target positions +
        # visibility; a small-radius correlation pass on the matcher's fine
        # features (the correlation backend's localization machinery)
        # polishes them to sub-pixel. Decouples WHERE the tracker thinks a
        # point went (learned, occlusion-aware) from HOW precisely it lands
        # (correlation peak, ~1.5 px floor) — the r3 study showed the
        # learned positions alone lose to pure correlation on localization.
        self.polish = polish
        self.polish_radius = polish_radius

    @staticmethod
    def save_params(variables, path) -> None:
        import flax.serialization as ser

        with open(path, "wb") as f:
            f.write(ser.to_bytes(variables))

    @staticmethod
    def load(tracker_cfg, path, **kw) -> "LearnedTemporalTracker":
        import flax.serialization as ser
        import jax

        from ..models.tracker import CoTrackerNet

        # template tree for deserialization: init with tiny shapes
        model = CoTrackerNet(tracker_cfg)
        T = tracker_cfg.window
        template = jax.eval_shape(
            lambda k: model.init(
                k,
                jnp.zeros((1, T, 32, 32)),
                jnp.zeros((1, 4, 2)),
                jnp.zeros((1, 4), jnp.int32),
                jnp.ones((1, 4), bool),
            ),
            jax.random.key(0),
        )
        template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
        from pathlib import Path as _Path

        if _Path(path).is_dir():  # train_tracker.py output dir
            path = _Path(path) / "tracker.msgpack"
        with open(path, "rb") as f:
            variables = ser.from_bytes(template, f.read())
        return LearnedTemporalTracker(tracker_cfg, variables, **kw)



def _own_support(pose6, own_pts3d, own_uv, own_valid, K_mat, thr):
    """How many of the frame's own (matcher-verified) correspondences a pose
    explains within the PnP reprojection threshold."""
    from ..core import camera

    uv, depth = camera.project(own_pts3d, pose6, K_mat)
    err = jnp.linalg.norm(uv - own_uv, axis=-1)
    return jnp.sum(own_valid & (depth > 0) & (err < thr))


def _window_track_pnp_learned(
    variables,
    frames_win: jax.Array,  # [W, H, W_img] grayscale window (frames t-W+1..t)
    uv0: jax.Array,         # [N, 2] query positions at their birth frames
    birth: jax.Array,       # [N] int32 window index (W for padding slots)
    trk_pts3d: jax.Array,   # [N, 3]
    own_pts3d: jax.Array,   # [K, 3]
    own_uv: jax.Array,      # [K, 2]
    own_valid: jax.Array,   # [K]
    K_mat: jax.Array,       # [3, 3]
    base_pose6: jax.Array,  # [6] the frame's first-pass pose (gate reference)
    key: jax.Array,
    feat_t: jax.Array | None = None,   # [Hf, Wf, C] target fine features
    desc: jax.Array | None = None,     # [N, C] source descriptors
    *,
    model,
    vis_threshold: float,
    pnp_cfg,
    polish_stride: float = 2.0,
    polish_radius: int = 3,
    polish_temperature: float = 0.05,
):
    """Learned-tracker analogue of `_window_track_pnp`: one program per
    refined frame — the transformer tracks every window query to the target
    frame, visibility-gated points join the frame's own inliers in PnP.

    With `feat_t`/`desc` given (hybrid mode), the learned positions are
    polished by a small-radius correlation pass before PnP (see
    LearnedTemporalTracker.polish)."""
    W = frames_win.shape[0]
    point_mask = birth < W
    out = model.apply(
        variables,
        frames_win[None],
        uv0[None],
        jnp.minimum(birth, W - 1)[None],
        point_mask[None],
    )
    uv = out["coords"][0, -1]                       # position at target frame
    vis_p = jax.nn.sigmoid(out["vis_logit"][0, -1])
    trk_valid = (birth < W - 1) & (vis_p > vis_threshold)
    if feat_t is not None and desc is not None:
        uv_pol, corr = _track_points_step(
            feat_t, desc, uv, polish_stride, polish_radius, 2,
            polish_temperature,
        )
        moved = jnp.linalg.norm(uv_pol - uv, axis=-1)
        # trust the polish only when the correlation peak is confident and
        # within the search extent (a weak/flat peak means the learned
        # position sits off-feature — keep it and let RANSAC judge). The
        # polish runs _track_points_step with iters=2, which can legitimately
        # travel up to 2x the per-iteration radius — bound accordingly.
        good = (corr > 0.25) & (
            moved <= 2 * polish_stride * polish_radius + 1.0
        )
        uv = jnp.where(good[:, None], uv_pol, uv)

    P3 = jnp.concatenate([own_pts3d, trk_pts3d], axis=0)
    P2 = jnp.concatenate([own_uv, uv], axis=0)
    val = jnp.concatenate([own_valid, trk_valid], axis=0)
    res = ransac_pnp(key, P3, P2, K_mat, val, pnp_cfg)
    thr = pnp_cfg.reproj_threshold_px
    n_own_ref = _own_support(res.pose6, own_pts3d, own_uv, own_valid, K_mat, thr)
    n_own_base = _own_support(base_pose6, own_pts3d, own_uv, own_valid, K_mat, thr)
    return (res.pose6, res.n_inliers, res.success, jnp.sum(trk_valid),
            n_own_ref, n_own_base)


class RefinedResult(NamedTuple):
    pose6: np.ndarray
    T44: np.ndarray
    n_inliers: int
    used_tracks: int
    # None: refinement not attempted (warm-up window / failed base pose);
    # True: the drift gate rejected the refined pose and kept the base one
    gated: bool | None = None


def _window_track_pnp(
    feat_win: jax.Array,   # [W, Hf, Wf, C] fine features of frames t-W+1..t
    desc: jax.Array,       # [N, C] source descriptors (per birth frame)
    uv0: jax.Array,        # [N, 2] start positions (at birth frame, image px)
    birth: jax.Array,      # [N] int32 window-index of the source frame
                           # (W for padding slots: never advanced)
    trk_pts3d: jax.Array,  # [N, 3] the tracked points' 3D partners
    own_pts3d: jax.Array,  # [K, 3] target frame's own PnP inliers
    own_uv: jax.Array,     # [K, 2]
    own_valid: jax.Array,  # [K] bool
    K_mat: jax.Array,      # [3, 3]
    base_pose6: jax.Array, # [6] the frame's first-pass pose (gate reference)
    key: jax.Array,
    *,
    stride: float,
    radius: int,
    iters: int,
    temperature: float,
    conf_thr: float,
    pnp_cfg,
):
    """One device program per refined frame: advance every window query
    through the intermediate frames with a lax.scan, then RANSAC-PnP the
    union of tracked + own correspondences. Replaces the per-(source,
    intermediate-frame) dispatch chain — ~15 blocking round-trips per frame
    over the tunnel collapse into one."""
    W = feat_win.shape[0]

    def step(carry, inp):
        uv, conf = carry
        feat, k = inp
        new_uv, new_conf = _track_points_step(
            feat, desc, uv, stride, radius, iters, temperature
        )
        active = birth < k           # born strictly before this window frame
        uv = jnp.where(active[:, None], new_uv, uv)
        conf = jnp.where(active, new_conf, conf)
        return (uv, conf), None

    ks = jnp.arange(1, W, dtype=jnp.int32)
    (uv, conf), _ = jax.lax.scan(
        step, (uv0, jnp.zeros(uv0.shape[0])), (feat_win[1:], ks)
    )
    trk_valid = (birth < W - 1) & (conf > conf_thr)

    P3 = jnp.concatenate([own_pts3d, trk_pts3d], axis=0)
    P2 = jnp.concatenate([own_uv, uv], axis=0)
    val = jnp.concatenate([own_valid, trk_valid], axis=0)
    res = ransac_pnp(key, P3, P2, K_mat, val, pnp_cfg)
    thr = pnp_cfg.reproj_threshold_px
    n_own_ref = _own_support(res.pose6, own_pts3d, own_uv, own_valid, K_mat, thr)
    n_own_base = _own_support(base_pose6, own_pts3d, own_uv, own_valid, K_mat, thr)
    return (res.pose6, res.n_inliers, res.success, jnp.sum(trk_valid),
            n_own_ref, n_own_base)


def refine_sequence(
    cfg: EngineConfig,
    tracker: "TemporalTracker | LearnedTemporalTracker",
    frames: np.ndarray,            # [T, H, W] grayscale
    results: list[FrameResult],
    Ks: np.ndarray,                # [T, 3, 3] (full image)
    window: int = 6,
    max_pts_per_frame: int = 256,
    conf_thr: float = 0.5,
    own_support_ratio: float = 1.0,
) -> list[RefinedResult]:
    """Second-pass pose optimization (reference POSE OPTIMIZATION loop).

    For each frame t >= window-1: track the previous window-1 frames'
    PnP-inlier 2D points into frame t and re-run PnP on the union of the
    frame's own inliers and the tracked points. `tracker` selects the
    backend (correlation chain or the learned windowed transformer).

    `own_support_ratio` is the drift-gate bar: a refined pose is accepted
    only when it explains at least `ratio x` as many of the frame's OWN
    matcher-verified correspondences as the first-pass pose did. The
    default 1.0 makes refinement no-worse-than-baseline on healthy input
    (the round-3 hybrid study showed 0.8 admits poses that are measurably
    worse at the 3deg level: logs/refine_hybrid_r3.log, held-out 3cm@3deg
    0.33 -> 0.0); genuinely degraded frames are still rescued through the
    base-degradation override below.
    """
    from ..core import so3

    learned = isinstance(tracker, LearnedTemporalTracker)
    T = len(frames)
    W = window

    polish = tracker.polish if learned else None
    feat_tracker = polish if learned else tracker
    if feat_tracker is not None:
        feat_seq = feat_tracker.features(frames)  # [T, Hf, Wf, C] on device
        stride = frames.shape[1] / feat_seq.shape[1]

    # per-frame query prep: fixed-capacity buffers; descriptors sampled ONCE
    # per frame in its own feature map (reused by every window containing it)
    n_src = np.zeros(T, np.int32)
    uv_buf = np.zeros((T, max_pts_per_frame, 2), np.float32)
    p3_buf = np.zeros((T, max_pts_per_frame, 3), np.float32)
    descs: list[jax.Array | None] = [None] * T
    for s, r in enumerate(results):
        if not r.success or len(r.mkpts2d_full) == 0:
            continue
        n = min(len(r.mkpts2d_full), max_pts_per_frame)
        n_src[s] = n
        uv_buf[s, :n] = r.mkpts2d_full[:n]
        p3_buf[s, :n] = r.mkpts3d[:n]
        if feat_tracker is not None:
            descs[s] = feat_tracker._sample_desc(
                feat_seq[s], jnp.asarray(uv_buf[s]), stride
            )
    if feat_tracker is not None:
        zero_desc = jnp.zeros_like(
            next((d for d in descs if d is not None), jnp.zeros((max_pts_per_frame, feat_seq.shape[-1])))
        )

    # own-inlier capacity = the PnP match capacity (never truncates)
    K_own = cfg.matcher.coarse_matching.max_matches
    if learned:
        frames_arr = np.asarray(frames)
        frames_f = frames_arr.astype(np.float32)
        if np.issubdtype(frames_arr.dtype, np.integer):  # uint8-range input
            frames_f = frames_f / 255.0
        job = jax.jit(partial(
            _window_track_pnp_learned,
            model=tracker.model,
            vis_threshold=tracker.vis_threshold,
            pnp_cfg=cfg.pnp,
            **({} if polish is None else dict(
                polish_stride=float(stride),
                polish_radius=tracker.polish_radius,
                polish_temperature=polish.temperature,
            )),
        ))
    else:
        job = jax.jit(partial(
            _window_track_pnp,
            stride=float(stride),
            radius=tracker.radius,
            iters=tracker.iters,
            temperature=tracker.temperature,
            conf_thr=conf_thr,
            pnp_cfg=cfg.pnp,
        ))

    out: list[RefinedResult] = []
    for t in range(T):
        base = results[t]
        if t < W - 1:
            out.append(RefinedResult(base.pose6, base.T44, base.n_inliers, 0,
                                     gated=None))
            continue
        # NOTE: a frame whose own PnP FAILED is still attempted — the tracked
        # window points are exactly what can rescue it (reference CoTracker
        # phase runs on every frame past temp_thresh, inference.py:256-336).
        # The own-support gate stays sound: a failed base explains few of its
        # own matches, so the 0.8x bar is easy for a genuinely better pose.
        srcs = list(range(t - W + 1, t))
        uv0 = np.concatenate([uv_buf[s] for s in srcs])
        trk3d = np.concatenate([p3_buf[s] for s in srcs])
        birth = np.concatenate([
            np.where(np.arange(max_pts_per_frame) < n_src[s], b, W).astype(np.int32)
            for b, s in enumerate(srcs)
        ])
        n_own = min(len(base.mkpts2d_full), K_own)
        own_uv = np.zeros((K_own, 2), np.float32)
        own_p3 = np.zeros((K_own, 3), np.float32)
        own_val = np.zeros(K_own, bool)
        own_uv[:n_own] = base.mkpts2d_full[:n_own]
        own_p3[:n_own] = base.mkpts3d[:n_own]
        own_val[:n_own] = True

        if learned:
            pol_args = ()
            if polish is not None:
                pol_args = (
                    feat_seq[t],
                    jnp.concatenate([
                        descs[s] if descs[s] is not None else zero_desc
                        for s in srcs
                    ]),
                )
            pose6_d, n_inl_d, success_d, used_d, n_own_ref_d, n_own_base_d = job(
                tracker.variables, jnp.asarray(frames_f[t - W + 1: t + 1]),
                jnp.asarray(uv0), jnp.asarray(birth), jnp.asarray(trk3d),
                jnp.asarray(own_p3), jnp.asarray(own_uv), jnp.asarray(own_val),
                jnp.asarray(Ks[t]), jnp.asarray(base.pose6), jax.random.key(t),
                *pol_args,
            )
        else:
            desc = jnp.concatenate(
                [descs[s] if descs[s] is not None else zero_desc for s in srcs]
            )
            feat_win = jax.lax.dynamic_slice_in_dim(feat_seq, t - W + 1, W, 0)
            pose6_d, n_inl_d, success_d, used_d, n_own_ref_d, n_own_base_d = job(
                feat_win, desc, jnp.asarray(uv0), jnp.asarray(birth),
                jnp.asarray(trk3d), jnp.asarray(own_p3), jnp.asarray(own_uv),
                jnp.asarray(own_val), jnp.asarray(Ks[t]), jnp.asarray(base.pose6),
                jax.random.key(t),
            )
        n_inl = int(n_inl_d)
        # Acceptance gates (the reference keeps both poses and renders the
        # comparison, inference.py:322-336 — we keep the stronger one):
        #   1. the union consensus must be a real consensus;
        #   2. the refined pose must explain the frame's own matcher-verified
        #      correspondences at least as well as the first-pass pose did —
        #      a horde of coherently drifted tracks can out-vote the own
        #      inliers in RANSAC, and this is the check that catches it.
        ok = bool(success_d) and n_inl >= cfg.pnp.min_inliers
        # Gate 2 is skipped under overwhelming independent consensus, but
        # ONLY when the base is demonstrably degraded (failed PnP or a
        # near-floor inlier count): the own matches the base pose was FIT
        # to can be the degraded quantity (momentary blur/occlusion) — a
        # base overfit to its own noise always "explains" them better than
        # the true pose, which would veto every rescue. On a weak-but-
        # healthy frame the union's tracked points (up to (W-1)*max_pts, a
        # coherently drifted horde) could clear a 2x bar cheaply, so the
        # override is gated on base degradation first.
        degraded = (not base.success) or (
            base.n_inliers < 3 * cfg.pnp.min_inliers
        )
        strong = degraded and n_inl >= 2 * max(base.n_inliers, cfg.pnp.min_inliers)
        if (ok and not strong
                and int(n_own_ref_d) < own_support_ratio * int(n_own_base_d)):
            ok = False
        if not ok:
            out.append(RefinedResult(base.pose6, base.T44, base.n_inliers, 0,
                                     gated=True))
            continue
        pose6 = np.asarray(pose6_d)
        R, tr = so3.pose6_to_Rt(jnp.asarray(pose6))
        T44 = np.eye(4, dtype=np.float32)
        T44[:3, :3] = np.asarray(R)
        T44[:3, 3] = np.asarray(tr)
        out.append(RefinedResult(pose6, T44, n_inl, int(used_d), gated=False))
    return out
