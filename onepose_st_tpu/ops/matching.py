"""Dual-softmax similarity + static-shape match extraction.

TPU-native replacement for the dynamic `torch.where`-based extraction in the
reference (src/models/OnePosePlus/utils/coarse_matching.py:126-217 and the
LoFTR submodule equivalent): everything here has static output shapes —
matches come back as fixed-capacity (top-K by confidence) index arrays plus a
validity mask, which is what downstream jit stages require.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def dual_softmax(
    feat0: jax.Array,
    feat1: jax.Array,
    temperature: float,
    mask1: jax.Array | None = None,
    mask0: jax.Array | None = None,
) -> jax.Array:
    """Dual-softmax confidence matrix.

    conf = softmax_rows(sim) * softmax_cols(sim), sim = <f0, f1> / (d^0.5 · T)
    — the 'sqrt_feat_dim' normalization + temperature of the reference
    (coarse_matching.py:46-56, 104-123).

    Args:
      feat0: [B, L, C]; feat1: [B, S, C]; masks: [B, L]/[B, S] bool (True=valid).
    Returns: conf [B, L, S] float32.
    """
    c = feat0.shape[-1]
    scale = 1.0 / (c**0.5)
    sim = jnp.einsum(
        "blc,bsc->bls", feat0, feat1, preferred_element_type=jnp.float32
    ) * (scale * scale / (temperature + 1e-4))
    if mask1 is not None:
        sim = jnp.where(mask1[:, None, :], sim, -1e9)
    if mask0 is not None:
        sim = jnp.where(mask0[:, :, None], sim, -1e9)
    return jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)


class Matches(NamedTuple):
    """Fixed-capacity match set (capacity K, invalid slots masked out)."""

    i_ids: jax.Array  # [B, K] int32 — row (point / grid-0) index
    j_ids: jax.Array  # [B, K] int32 — col (grid-1) index
    conf: jax.Array   # [B, K] float32 — dual-softmax confidence
    valid: jax.Array  # [B, K] bool


def grid_border_mask(hw: tuple[int, int], border: int) -> jax.Array:
    """[h*w] bool mask, False inside `border` cells of the grid edge.

    Equivalent to reference mask_border (coarse_matching.py:10-21).
    """
    h, w = hw
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ok = (
        (row >= border) & (row < h - border) & (col >= border) & (col < w - border)
    )
    return ok.reshape(h * w)


def extract_matches(
    conf: jax.Array,
    threshold: float,
    max_matches: int,
    border_mask_rows: jax.Array | None = None,
    border_mask_cols: jax.Array | None = None,
    col_mask: jax.Array | None = None,
) -> Matches:
    """Mutual-nearest + threshold matches with a static top-K cap.

    Args:
      conf: [B, L, S] dual-softmax confidences.
      border_mask_rows: optional [L] bool (True=keep) for grid-shaped rows.
      border_mask_cols: optional [S] bool for grid-shaped cols.
      col_mask: optional PER-SAMPLE [B, S] bool (True=keep) — e.g. the
        visibility mask of crop cells backed by real source pixels (black
        warp-fill cells must not produce matches).
    Returns: Matches with K = max_matches, ranked by confidence.
    """
    B, L, S = conf.shape
    row_max = jnp.max(conf, axis=2, keepdims=True)
    col_max = jnp.max(conf, axis=1, keepdims=True)
    mutual = (conf >= row_max) & (conf >= col_max) & (conf > threshold)
    if border_mask_cols is not None:
        mutual = mutual & border_mask_cols[None, None, :]
    if border_mask_rows is not None:
        mutual = mutual & border_mask_rows[None, :, None]
    if col_mask is not None:
        mutual = mutual & col_mask[:, None, :]

    masked = jnp.where(mutual, conf, 0.0)
    row_conf = jnp.max(masked, axis=2)            # [B, L]
    j_of_row = jnp.argmax(masked, axis=2).astype(jnp.int32)  # [B, L]

    k = min(max_matches, L)
    top_conf, i_ids = jax.lax.top_k(row_conf, k)  # [B, K]
    i_ids = i_ids.astype(jnp.int32)
    j_ids = jnp.take_along_axis(j_of_row, i_ids, axis=1)
    valid = top_conf > 0.0
    # neutralize invalid slots so downstream gathers are in-bounds & harmless
    i_ids = jnp.where(valid, i_ids, 0)
    j_ids = jnp.where(valid, j_ids, 0)
    return Matches(i_ids=i_ids, j_ids=j_ids, conf=top_conf, valid=valid)


def grid_coords(j_ids: jax.Array, grid_w: int, stride: float) -> jax.Array:
    """Flat grid index [B, K] -> pixel coords [B, K, 2] at given stride.

    Matches reference coarse->pixel mapping (coarse_matching.py:222-227):
    uv = (j % w, j // w) * stride, i.e. the top-left corner convention.
    """
    x = (j_ids % grid_w).astype(jnp.float32) * stride
    y = (j_ids // grid_w).astype(jnp.float32) * stride
    return jnp.stack([x, y], axis=-1)


def spatial_expectation(heatmap: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Soft-argmax over a [..., W, W] heatmap on the [-1, 1] grid + std.

    Re-implements kornia dsnt.spatial_expectation2d + the std computation of
    reference fine_matching.py:84-100 without kornia.

    Returns: (coords [..., 2] in [-1,1] (x, y), std [...]).
    """
    *lead, h, w = heatmap.shape
    hm = heatmap.reshape(*lead, h * w)
    xs = jnp.linspace(-1.0, 1.0, w, dtype=heatmap.dtype)
    ys = jnp.linspace(-1.0, 1.0, h, dtype=heatmap.dtype)
    grid_x = jnp.tile(xs, h)
    grid_y = jnp.repeat(ys, w)
    ex = jnp.sum(hm * grid_x, axis=-1)
    ey = jnp.sum(hm * grid_y, axis=-1)
    coords = jnp.stack([ex, ey], axis=-1)
    e2x = jnp.sum(hm * grid_x * grid_x, axis=-1)
    e2y = jnp.sum(hm * grid_y * grid_y, axis=-1)
    var = jnp.stack([e2x, e2y], axis=-1) - coords * coords
    std = jnp.sum(jnp.sqrt(jnp.clip(var, 1e-10, None)), axis=-1)
    return coords, std
