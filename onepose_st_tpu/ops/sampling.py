"""Bilinear feature sampling at continuous pixel coordinates.

Replaces the reference's kornia grid_sample path
(src/KeypointFreeSfM/loftr_for_sfm/utils/sample_feature_from_featuremap.py:28)
used to pull backbone descriptors at match locations for the SfM feature DB.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(feat: jax.Array, uv: jax.Array) -> jax.Array:
    """Sample [B, H, W, C] at pixel coords [B, K, 2] (x, y), zero padding.

    Coordinates follow the align_corners=True convention on the feature
    grid: uv in pixels of the feature map itself (callers rescale image-pixel
    coords by the stride first).
    """
    B, H, W, C = feat.shape
    x = uv[..., 0]
    y = uv[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        flat = yi_c * W + xi_c
        vals = jax.vmap(lambda f, idx: jnp.take(f, idx, axis=0))(
            feat.reshape(B, H * W, C), flat
        )
        return vals * inb[..., None].astype(feat.dtype)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def sample_descriptors(
    feat: jax.Array, uv_img: jax.Array, stride: float, normalize: bool = True
) -> jax.Array:
    """Sample L2-normalized descriptors at image-pixel coords [B, K, 2].

    Image pixel (u, v) maps to feature-grid coords (u/stride - 0.5 + 0.5/stride)
    under the half-pixel-center convention both grids share; the reference's
    `coord_normalization` (residual_utils.py:64-80) encodes the same shift.
    """
    uv_feat = (uv_img + 0.5) / stride - 0.5
    d = bilinear_sample(feat, uv_feat)
    if normalize:
        d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
    return d
