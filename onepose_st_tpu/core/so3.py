"""SO(3)/SE(3) operations in pure JAX.

TPU-native replacement for the reference's pytorch3d usage
(`so3_exponential_map` / `so3_log_map`, reference
src/KeypointFreeSfM/post_optimization/optimizer/optimizer.py:264) and the
Ceres-style `AngleAxisRotatePoint`
(reference src/KeypointFreeSfM/post_optimization/optimizer/residual_utils.py:3).

All functions are batched over leading axes, jit-safe (no data-dependent
control flow), and Taylor-guarded near theta=0 so gradients are finite —
required because the LM solver differentiates through them.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def exp(w: jax.Array) -> jax.Array:
    """Angle-axis [..., 3] -> rotation matrix [..., 3, 3] (Rodrigues).

    Uses Taylor expansions of sin(t)/t and (1-cos t)/t^2 near 0 so that the
    function (and its JVP/VJP, used for BA Jacobians) is smooth everywhere.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS**2)
    # sin(t)/t and (1 - cos t)/t^2 with small-angle Taylor fallback
    small = theta2 < 1e-8
    sin_t_over_t = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    one_minus_cos_over_t2 = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS**2)
    )
    K = hat(w)
    # pinned: TPU default matmul precision is bf16, which costs ~1e-3 of
    # rotation accuracy here and poisons every solver differentiating
    # through exp (PnP refine, BA Jacobians)
    KK = jnp.matmul(K, K, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return (
        eye
        + sin_t_over_t[..., None, None] * K
        + one_minus_cos_over_t2[..., None, None] * KK
    )


def log(R: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> angle-axis [..., 3].

    Valid for theta in [0, pi); the BA parameterization keeps increments small
    so the theta≈pi branch is not needed on the hot path.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    # vee of the antisymmetric part
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    theta2 = theta * theta
    small = theta2 < 1e-8
    # w = theta / (2 sin theta) * v ; Taylor: 1/2 + t^2/12
    scale = jnp.where(
        small, 0.5 + theta2 / 12.0, theta / (2.0 * jnp.sin(theta) + _EPS)
    )
    return scale[..., None] * v


def rotate_point(w: jax.Array, p: jax.Array) -> jax.Array:
    """Rotate points [..., 3] by angle-axis [..., 3] without forming R.

    Rodrigues applied directly to the point: cheaper than exp(w) @ p for the
    per-observation BA residual (one rotation per observation).
    """
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + _EPS**2)
    small = theta2 < 1e-8
    cos_t = jnp.cos(theta)
    sin_t_over_t = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    one_minus_cos_over_t2 = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - cos_t) / (theta2 + _EPS**2)
    )
    w_cross_p = jnp.cross(w, p)
    w_dot_p = jnp.sum(w * p, axis=-1, keepdims=True)
    return (
        p * cos_t
        + w_cross_p * sin_t_over_t
        + w * (w_dot_p * one_minus_cos_over_t2)
    )


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3].

    Matches COLMAP's qvec convention (reference
    src/utils/colmap/read_write_model.py `qvec2rotmat`).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (w, x, y, z).

    Branch-free Shepperd-style selection via where, jit-safe.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    trace = m00 + m11 + m22

    # four candidate constructions; pick the numerically best
    def cand_w():
        s = jnp.sqrt(jnp.clip(1.0 + trace, _EPS, None)) * 2.0
        return jnp.stack(
            [0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], axis=-1
        )

    def cand_x():
        s = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS, None)) * 2.0
        return jnp.stack(
            [(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], axis=-1
        )

    def cand_y():
        s = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, _EPS, None)) * 2.0
        return jnp.stack(
            [(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], axis=-1
        )

    def cand_z():
        s = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, _EPS, None)) * 2.0
        return jnp.stack(
            [(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], axis=-1
        )

    qw, qx, qy, qz = cand_w(), cand_x(), cand_y(), cand_z()
    cond_w = trace > 0
    cond_x = (m00 > m11) & (m00 > m22)
    cond_y = m11 > m22
    q = jnp.where(
        cond_w[..., None],
        qw,
        jnp.where(cond_x[..., None], qx, jnp.where(cond_y[..., None], qy, qz)),
    )
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# SE(3) as (angle-axis[3], translation[3]) "pose6" vectors — the BA state.
# Convention: x_cam = R(w) @ x_world + t  (world->camera, like COLMAP).
# ---------------------------------------------------------------------------


def pose6_from_Rt(R: jax.Array, t: jax.Array) -> jax.Array:
    """([..., 3, 3], [..., 3]) -> [..., 6] (angle-axis ++ translation)."""
    return jnp.concatenate([log(R), t], axis=-1)


def pose6_to_Rt(pose6: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., 6] -> ([..., 3, 3], [..., 3])."""
    return exp(pose6[..., :3]), pose6[..., 3:6]


def pose6_inverse(pose6: jax.Array) -> jax.Array:
    """Invert a world->camera pose6: returns camera->world pose6."""
    w, t = pose6[..., :3], pose6[..., 3:6]
    w_inv = -w
    t_inv = -rotate_point(w_inv, t)
    return jnp.concatenate([w_inv, t_inv], axis=-1)


def pose6_apply(pose6: jax.Array, p: jax.Array) -> jax.Array:
    """Apply pose6 transform to points [..., 3]."""
    return rotate_point(pose6[..., :3], p) + pose6[..., 3:6]
