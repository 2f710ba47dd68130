"""Multi-view triangulation, batched in JAX.

Replaces COLMAP's `point_triangulator` subprocess (reference
src/sfm_utils/triangulation.py:195-230, poses fixed): per track, a DLT
triangulation over all masked observations, followed by acceptance tests
(minimum triangulation angle, maximum reprojection error, positive depth in
a minimum number of views). Refinement to sub-pixel optimality is done by
the bundle adjuster in triangulation mode (sfm/ba/bundle.py, all poses
fixed) — together these replace the whole COLMAP triangulation stage.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import camera, so3

_PREC = jax.lax.Precision.HIGHEST


class TriangulationResult(NamedTuple):
    points: jax.Array        # [T, 3]
    valid: jax.Array         # [T] bool — passed all acceptance tests
    n_inlier_obs: jax.Array  # [T] int32
    reproj_err: jax.Array    # [T] mean inlier reprojection error (px)
    tri_angle_deg: jax.Array # [T] max pairwise triangulation angle


def _dlt_point(origins, dirs, w):
    """Midpoint/DLT: argmin_X sum_m w_m * || (I - d d^T)(X - o) ||^2.

    Solve A X = b with A = sum w (I - d d^T), b = sum w (I - d d^T) o.
    """
    eye = jnp.eye(3, dtype=origins.dtype)
    ddT = dirs[..., :, None] * dirs[..., None, :]          # [M, 3, 3]
    Pm = (eye - ddT) * w[..., None, None]
    A = jnp.sum(Pm, axis=0)
    b = jnp.sum(jnp.einsum("mij,mj->mi", Pm, origins, precision=_PREC), axis=0)
    A = A + 1e-9 * eye
    # linalg internals contract at ambient precision (bf16 on TPU) — pin
    with jax.default_matmul_precision("highest"):
        return jnp.linalg.solve(A, b)


def triangulate_tracks(
    obs_frame: jax.Array,   # [T, M] int32
    obs_uv: jax.Array,      # [T, M, 2]
    obs_mask: jax.Array,    # [T, M] bool
    poses: jax.Array,       # [F, 6]
    Ks: jax.Array,          # [F, 3, 3]
    min_angle_deg: float = 1.5,
    max_reproj_px: float = 4.0,
    min_views: int = 2,
) -> TriangulationResult:
    """Linear triangulation of every track + COLMAP-style acceptance."""
    T, M = obs_frame.shape
    pose_o = poses[obs_frame]                              # [T, M, 6]
    K_o = Ks[obs_frame]                                    # [T, M, 3, 3]
    # rays in world frame
    x = (obs_uv[..., 0] - K_o[..., 0, 2]) / K_o[..., 0, 0]
    y = (obs_uv[..., 1] - K_o[..., 1, 2]) / K_o[..., 1, 1]
    d_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    inv = so3.pose6_inverse(pose_o.reshape(-1, 6)).reshape(T, M, 6)
    d_world = so3.rotate_point(inv[..., :3], d_cam)
    d_world = d_world / (jnp.linalg.norm(d_world, axis=-1, keepdims=True) + 1e-12)
    origins = inv[..., 3:]                                 # camera centers
    w = obs_mask.astype(obs_uv.dtype)

    points = jax.vmap(_dlt_point)(origins, d_world, w)     # [T, 3]

    # acceptance tests
    uv_hat, z = camera.project(points[:, None, :], pose_o, K_o, eps=1e-9)
    err = jnp.linalg.norm(uv_hat - obs_uv, axis=-1)
    obs_ok = obs_mask & (z > 1e-6) & (err < max_reproj_px)
    n_inl = jnp.sum(obs_ok, axis=1).astype(jnp.int32)

    # max pairwise triangulation angle between observing rays
    cos_pair = jnp.einsum("tmi,tni->tmn", d_world, d_world, precision=_PREC)
    pair_mask = obs_mask[:, :, None] & obs_mask[:, None, :]
    cos_min = jnp.min(jnp.where(pair_mask, cos_pair, 1.0), axis=(1, 2))
    angle = jnp.rad2deg(jnp.arccos(jnp.clip(cos_min, -1.0, 1.0)))

    mean_err = jnp.sum(jnp.where(obs_ok, err, 0.0), axis=1) / jnp.maximum(n_inl, 1)
    valid = (n_inl >= min_views) & (angle > min_angle_deg)
    return TriangulationResult(
        points=points,
        valid=valid,
        n_inlier_obs=n_inl,
        reproj_err=mean_err,
        tri_angle_deg=angle,
    )
