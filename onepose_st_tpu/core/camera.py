"""Pinhole camera algebra in pure JAX.

Replaces the reference's scattered projection code and the crop/resize
intrinsics math of src/utils/data_utils.py:249-290 (get_K_crop_resize /
get_image_crop_resize) with jit-able, batched equivalents. Host-side image
warping lives in `onepose_st_tpu.data`; here is only the linear algebra.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import so3

# Geometry must stay f32 on TPU — the MXU's default bf16 passes cost ~0.3 px
# on projections. All einsums here pin HIGHEST precision.
_PREC = jax.lax.Precision.HIGHEST


def project(
    points_w: jax.Array, pose6: jax.Array, K: jax.Array, eps: float = 1e-4
) -> tuple[jax.Array, jax.Array]:
    """Project world points into a camera.

    Args:
      points_w: [..., 3] world points.
      pose6:    [..., 6] world->camera (angle-axis ++ t), broadcastable.
      K:        [..., 3, 3] intrinsics, broadcastable.
    Returns:
      (uv [..., 2], depth [...]) — depth is the camera-frame z used to divide,
      so callers can mask points behind the camera (depth <= 0).

    The + eps on the divisor mirrors the reference BA residual
    (src/KeypointFreeSfM/post_optimization/optimizer/residual.py:76).
    """
    p_cam = so3.pose6_apply(pose6, points_w)
    p_img = jnp.einsum("...ij,...j->...i", K, p_cam, precision=_PREC)
    depth = p_img[..., 2]
    uv = p_img[..., :2] / (depth[..., None] + eps)
    return uv, depth


def project_Rt(
    points_w: jax.Array, R: jax.Array, t: jax.Array, K: jax.Array, eps: float = 1e-4
) -> tuple[jax.Array, jax.Array]:
    """Same as `project` with explicit (R, t)."""
    p_cam = jnp.einsum("...ij,...j->...i", R, points_w, precision=_PREC) + t
    p_img = jnp.einsum("...ij,...j->...i", K, p_cam, precision=_PREC)
    depth = p_img[..., 2]
    uv = p_img[..., :2] / (depth[..., None] + eps)
    return uv, depth


def unproject(uv: jax.Array, depth: jax.Array, K: jax.Array) -> jax.Array:
    """Lift pixels [..., 2] with depth [...] to camera-frame points [..., 3].

    Uses a closed-form K^{-1} for upper-triangular pinhole K (no generic
    matrix inverse on the hot path).
    """
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    s = K[..., 0, 1]  # skew, normally 0
    y = (uv[..., 1] - cy) / fy
    x = (uv[..., 0] - cx - s * y) / fx
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def cam_to_world(p_cam: jax.Array, pose6: jax.Array) -> jax.Array:
    """Camera-frame points -> world frame given world->camera pose6."""
    return so3.pose6_apply(so3.pose6_inverse(pose6), p_cam)


# ---------------------------------------------------------------------------
# Crop / resize intrinsics algebra.
#
# The reference crops a square region around the object and resizes to
# (H, W), tracking the 3x3 affine "M" so intrinsics can be updated:
#   K_crop = T_crop @ K  with T_crop the homogeneous 2D affine.
# Semantics match src/utils/data_utils.py:32-62 (get_affine_transform with
# rot=0) + :268-290 (get_K_crop_resize).
# ---------------------------------------------------------------------------


def crop_affine(box: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Homogeneous 2D affine mapping full-image pixels -> crop pixels.

    Args:
      box: [..., 4] (x0, y0, x1, y1) crop box in source pixels.
      out_hw: (H, W) of the crop.
    Returns: [..., 3, 3].

    For rot=0 the reference's three-point affine reduces to scale from the
    box-width (x) and an equal scale on y anchored at the box center; we use
    the same convention: uniform scale = W_out / box_width on x, and the
    reference's get_dir([0, -w/2]) construction makes y share that scale.
    """
    x0, y0, x1, y1 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    cx = (x0 + x1) * 0.5
    cy = (y0 + y1) * 0.5
    src_w = x1 - x0
    H, W = out_hw
    scale = W / src_w
    # dst center is (W/2, H/2)
    tx = W * 0.5 - scale * cx
    ty = H * 0.5 - scale * cy
    zeros = jnp.zeros_like(scale)
    ones = jnp.ones_like(scale)
    return jnp.stack(
        [
            jnp.stack([scale, zeros, tx], axis=-1),
            jnp.stack([zeros, scale, ty], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )


def crop_K(K: jax.Array, box: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Update intrinsics for a crop+resize: K_crop = A @ K (A = crop_affine)."""
    A = crop_affine(box, out_hw)
    return jnp.matmul(A, K, precision=_PREC)


def bbox_from_points(uv: jax.Array, valid: jax.Array | None = None) -> jax.Array:
    """Axis-aligned (x0, y0, x1, y1) box of 2D points [..., N, 2]."""
    if valid is not None:
        big = jnp.finfo(uv.dtype).max
        lo = jnp.min(jnp.where(valid[..., None], uv, big), axis=-2)
        hi = jnp.max(jnp.where(valid[..., None], uv, -big), axis=-2)
    else:
        lo = jnp.min(uv, axis=-2)
        hi = jnp.max(uv, axis=-2)
    return jnp.concatenate([lo, hi], axis=-1)


def square_box(box: jax.Array, pad_ratio: float = 0.0) -> jax.Array:
    """Expand a box to a square (max side), optionally padded, center kept."""
    x0, y0, x1, y1 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    cx, cy = (x0 + x1) * 0.5, (y0 + y1) * 0.5
    half = jnp.maximum(x1 - x0, y1 - y0) * 0.5 * (1.0 + pad_ratio)
    return jnp.stack([cx - half, cy - half, cx + half, cy + half], axis=-1)


def box3d_corners(extent: jax.Array, center: jax.Array | None = None) -> jax.Array:
    """8 corners [..., 8, 3] of an axis-aligned 3D box from extents [..., 3]."""
    half = extent * 0.5
    signs = jnp.array(
        [
            [-1, -1, -1], [-1, -1, 1], [-1, 1, -1], [-1, 1, 1],
            [1, -1, -1], [1, -1, 1], [1, 1, -1], [1, 1, 1],
        ],
        dtype=extent.dtype,
    )
    corners = signs * half[..., None, :]
    if center is not None:
        corners = corners + center[..., None, :]
    return corners


def normalize_2d_keypoints(kpts: jax.Array, hw: tuple[int, int]) -> jax.Array:
    """Pixel coords -> roughly [-1, 1] (reference utils/normalize.py:4-15)."""
    h, w = hw
    size = jnp.array([w, h], dtype=kpts.dtype)
    center = size / 2.0
    scaling = jnp.max(size) * 0.7
    return (kpts - center) / scaling


def normalize_3d_keypoints(
    kpts: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    """Center + scale a 3D cloud by its tight bbox.

    Matches reference src/models/OnePosePlus/utils/normalize.py:17-28:
    scaling = 0.6 * max(extent), center = mean.  Batched over leading dims;
    statistics computed per batch element over axis -2.

    `mask` [..., L] excludes padding slots from the statistics. (The
    reference pads clouds with copies of real points so its unmasked stats
    are unbiased; this framework zero-pads, which would otherwise drag the
    center toward the origin and inflate the extent.)
    """
    if mask is None:
        extent = jnp.max(kpts, axis=-2) - jnp.min(kpts, axis=-2)  # [..., 3]
        center = jnp.mean(kpts, axis=-2)  # [..., 3]
    else:
        m = mask[..., None]
        mx = jnp.max(jnp.where(m, kpts, -jnp.inf), axis=-2)
        mn = jnp.min(jnp.where(m, kpts, jnp.inf), axis=-2)
        extent = mx - mn
        center = jnp.sum(jnp.where(m, kpts, 0.0), axis=-2) / jnp.maximum(
            jnp.sum(m, axis=-2), 1
        )
    scaling = jnp.maximum(
        jnp.max(extent, axis=-1, keepdims=True) * 0.6, 1e-6
    )  # [..., 1]
    return (kpts - center[..., None, :]) / scaling[..., None, :]
