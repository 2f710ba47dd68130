"""Temporal point tracking + post-hoc pose refinement.

Re-design of the reference's CoTracker2 phase (inference.py:239-398): for
each frame past `temp_thresh`, the 2D inlier points of the previous
`window-1` frames are tracked into the current frame and injected — with
their known 3D partners — into a second RANSAC PnP.

Instead of vendoring a transformer tracker, the tracker here is a
TPU-native chained correlation tracker over the matcher backbone's fine
(stride-2) features: each query keeps its source-frame descriptor and is
advanced frame-by-frame through the window by correlating against a
(2r+1)^2 search window and soft-argmax refinement — batched over points, it
is a handful of matmuls per step. Same API role as
CoTrackerPredictor(..., backward_tracking) in the reference.
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

    def features(self, frames: np.ndarray) -> jax.Array:
        """[T, H, W] grayscale -> [T, Hf, Wf, C] fine features."""
        return self._feats(self.variables, jnp.asarray(frames[..., None]))

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


class RefinedResult(NamedTuple):
    pose6: np.ndarray
    T44: np.ndarray
    n_inliers: int
    used_tracks: int


def refine_sequence(
    cfg: EngineConfig,
    tracker: TemporalTracker,
    frames: np.ndarray,            # [T, H, W] grayscale
    results: list[FrameResult],
    Ks: np.ndarray,                # [T, 3, 3] (full image)
    window: int = 6,
    max_pts_per_frame: int = 256,
) -> list[RefinedResult]:
    """Second-pass pose optimization (reference POSE OPTIMIZATION loop).

    For each frame t >= window-1: track the previous window-1 frames'
    PnP-inlier 2D points into frame t and re-run PnP on the union of the
    frame's own inliers and the tracked points.
    """
    T = len(frames)
    out: list[RefinedResult] = []
    feat_seq = tracker.features(frames)
    for t in range(T):
        base = results[t]
        if t < window - 1 or not base.success:
            out.append(
                RefinedResult(base.pose6, base.T44, base.n_inliers, 0)
            )
            continue
        pts3d = [base.mkpts3d]
        pts2d = [base.mkpts2d_full]
        used = 0
        for s in range(t - window + 1, t):
            prev = results[s]
            if not prev.success or len(prev.mkpts2d_full) == 0:
                continue
            n = min(len(prev.mkpts2d_full), max_pts_per_frame)
            uv_t, conf = tracker.track_chain(
                feat_seq, prev.mkpts2d_full[:n], s, t
            )
            keep = conf > 0.5
            if keep.sum() == 0:
                continue
            pts3d.append(prev.mkpts3d[:n][keep])
            pts2d.append(uv_t[keep])
            used += int(keep.sum())
        P3 = np.concatenate(pts3d, axis=0)
        P2 = np.concatenate(pts2d, axis=0)
        # pad to a static capacity bucket to bound recompiles
        cap = 1 << int(np.ceil(np.log2(max(len(P3), 64))))
        pad = cap - len(P3)
        valid = np.concatenate([np.ones(len(P3), bool), np.zeros(pad, bool)])
        P3 = np.concatenate([P3, np.zeros((pad, 3), np.float32)])
        P2 = np.concatenate([P2, np.zeros((pad, 2), np.float32)])
        res = ransac_pnp(
            jax.random.key(t),
            jnp.asarray(P3), jnp.asarray(P2), jnp.asarray(Ks[t]),
            jnp.asarray(valid), cfg.pnp,
        )
        from ..core import so3

        pose6 = np.asarray(res.pose6)
        R, tr = so3.pose6_to_Rt(jnp.asarray(pose6))
        T44 = np.eye(4, dtype=np.float32)
        T44[:3, :3] = np.asarray(R)
        T44[:3, 3] = np.asarray(tr)
        out.append(
            RefinedResult(pose6, T44, int(res.n_inliers), used)
        )
    return out
