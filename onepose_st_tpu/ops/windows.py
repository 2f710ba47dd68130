"""Fine-level window gathering.

Replaces the reference's F.unfold-then-index pattern
(src/models/OnePosePlus/loftr_module/fine_preprocess.py:41-54): instead of
materializing all Hc*Wc windows and selecting K of them, we gather only the
K needed windows straight from the (zero-padded) fine feature map with one
batched gather — O(K·W²) memory instead of O(Hc·Wc·W²).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_windows(
    feat_f: jax.Array,
    j_ids: jax.Array,
    coarse_hw: tuple[int, int],
    window: int,
) -> jax.Array:
    """Gather W×W fine-feature windows centered on coarse grid cells.

    Args:
      feat_f: [B, Hf, Wf, C] fine feature map (NHWC).
      j_ids: [B, K] flat coarse-grid indices (j = y*Wc + x).
      coarse_hw: (Hc, Wc) coarse grid shape; stride ratio = Hf // Hc.
      window: W (odd).
    Returns: [B, K, W*W, C].

    Window placement matches F.unfold(kernel=W, stride=r, padding=W//2) at
    window index j: rows y*r - W//2 + [0..W), same for cols.
    """
    B, Hf, Wf, C = feat_f.shape
    Hc, Wc = coarse_hw
    K = j_ids.shape[1]
    r = Hf // Hc
    pad = window // 2
    padded = jnp.pad(feat_f, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    yc = (j_ids // Wc).astype(jnp.int32)  # [B, K]
    xc = (j_ids % Wc).astype(jnp.int32)
    # one W x W x C block dynamic-slice per window (top-left corner in
    # padded coords is y*r, x*r): batched under vmap this lowers to a
    # single XLA gather with slice_sizes (W, W, C) — W*C-contiguous runs,
    # much friendlier to HBM than gathering W*W scattered C-rows
    def slice_one(img, y0, x0):
        return jax.lax.dynamic_slice(img, (y0, x0, 0), (window, window, C))

    win = jax.vmap(  # over batch
        jax.vmap(slice_one, in_axes=(None, 0, 0))  # over K windows
    )(padded, yc * r, xc * r)                      # [B, K, W, W, C]
    return win.reshape(B, K, window * window, C)
