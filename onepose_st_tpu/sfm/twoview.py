"""Two-view geometric verification, batched in JAX.

Replaces COLMAP's `matches_importer` geometric verification subprocess
(reference src/sfm_utils/triangulation.py:24-45). The keypoint-free SfM
pipeline runs with *known* camera poses (ARKit scan poses; the COLMAP model
is built pose-fixed, generate_empty.py) — so verification checks matches
against the known epipolar geometry directly instead of re-estimating it:
symmetric epipolar distance under E = [t_rel]x R_rel, thresholded.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import so3

_PREC = jax.lax.Precision.HIGHEST


def relative_pose(pose_i: jax.Array, pose_j: jax.Array):
    """world->cam_i, world->cam_j -> (R_ij, t_ij) with x_j = R_ij x_i + t_ij."""
    R_i = so3.exp(pose_i[..., :3])
    R_j = so3.exp(pose_j[..., :3])
    t_i = pose_i[..., 3:]
    t_j = pose_j[..., 3:]
    R_ij = jnp.matmul(R_j, jnp.swapaxes(R_i, -1, -2), precision=_PREC)
    t_ij = t_j - jnp.einsum("...ij,...j->...i", R_ij, t_i, precision=_PREC)
    return R_ij, t_ij


def essential_from_poses(pose_i: jax.Array, pose_j: jax.Array) -> jax.Array:
    """E such that x_j^T E x_i = 0 for normalized coords."""
    R_ij, t_ij = relative_pose(pose_i, pose_j)
    return jnp.matmul(so3.hat(t_ij), R_ij, precision=_PREC)


def _normalize(uv, K):
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    return jnp.stack(
        [
            (uv[..., 0] - cx[..., None]) / fx[..., None],
            (uv[..., 1] - cy[..., None]) / fy[..., None],
        ],
        axis=-1,
    )


def epipolar_inliers(
    uv_i: jax.Array,      # [..., N, 2] pixels in image i
    uv_j: jax.Array,      # [..., N, 2] pixels in image j
    pose_i: jax.Array,    # [..., 6]
    pose_j: jax.Array,    # [..., 6]
    K_i: jax.Array,       # [..., 3, 3]
    K_j: jax.Array,       # [..., 3, 3]
    threshold_px: float,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Symmetric epipolar distance test against the known relative pose.

    Distances are computed in normalized coords and rescaled to pixels by
    the mean focal length, so the threshold is in pixels like COLMAP's.
    """
    E = essential_from_poses(pose_i, pose_j)
    xi = _normalize(uv_i, K_i)
    xj = _normalize(uv_j, K_j)
    ones = jnp.ones(xi.shape[:-1] + (1,), xi.dtype)
    xi_h = jnp.concatenate([xi, ones], axis=-1)
    xj_h = jnp.concatenate([xj, ones], axis=-1)
    Ex = jnp.einsum("...ij,...nj->...ni", E, xi_h, precision=_PREC)
    Etx = jnp.einsum("...ji,...nj->...ni", E, xj_h, precision=_PREC)
    xEx = jnp.sum(xj_h * Ex, axis=-1)
    # symmetric epipolar distance
    d2 = xEx**2 * (
        1.0 / (Ex[..., 0] ** 2 + Ex[..., 1] ** 2 + 1e-12)
        + 1.0 / (Etx[..., 0] ** 2 + Etx[..., 1] ** 2 + 1e-12)
    )
    f_mean = 0.5 * (K_i[..., 0, 0] + K_i[..., 1, 1])
    d_px = jnp.sqrt(d2) * f_mean[..., None]
    ok = d_px < threshold_px
    if valid is not None:
        ok = ok & valid
    return ok
