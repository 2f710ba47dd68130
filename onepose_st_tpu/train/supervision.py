"""On-device ground-truth construction and training match-slot selection.

Replaces two host-side pieces of the reference:
  * the dataset's materialized `conf_matrix_gt` / `fine_location_matrix_gt`
    int16 tensors (src/datasets/OnePosePlus_dataset.py:174-437) — we project
    the 3D cloud with the GT pose inside the jitted step instead;
  * the training-time match padding (coarse_matching.py:177-217) — fixed
    slot layout: the first (K - pad) slots take the model's top-K predicted
    matches, the last `pad` slots take uniformly sampled GT pairs (their
    conf is 0, marking them as GT pads like the reference's mconf==0).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import camera


class Supervision(NamedTuple):
    gt_j: jax.Array       # [B, L] int32 — GT coarse cell per 3D point
    gt_valid: jax.Array   # [B, L] bool — projects inside the image
    uv_gt: jax.Array      # [B, L, 2] f32 — exact projected pixel coords


def project_gt(
    kpts3d: jax.Array,      # [B, L, 3]
    pose_gt: jax.Array,     # [B, 6] world->cam
    K_crop: jax.Array,      # [B, 3, 3]
    image_hw: tuple[int, int],
    coarse_stride: int,
    point_mask: jax.Array | None = None,
    img_mask: jax.Array | None = None,   # [B, Hc*Wc] bool (True = real px)
) -> Supervision:
    """Project the cloud with the GT pose; derive coarse-cell assignment.

    `img_mask` gates GT matches to cells backed by real source pixels:
    jittered training crops contain black warp-fill past the frame edge,
    and a 3D point projecting there must NOT be supervised as a positive —
    that teaches the matcher to hallucinate matches on dead pixels (the
    round-3 truncated-frame 3-4 deg rotation floor)."""
    uv, depth = jax.vmap(lambda p, po, k: camera.project(p, po, k, eps=1e-6))(
        kpts3d, pose_gt, K_crop
    )
    H, W = image_hw
    Wc = W // coarse_stride
    Hc = H // coarse_stride
    x_cell = jnp.floor(uv[..., 0] / coarse_stride).astype(jnp.int32)
    y_cell = jnp.floor(uv[..., 1] / coarse_stride).astype(jnp.int32)
    inb = (
        (x_cell >= 0) & (x_cell < Wc) & (y_cell >= 0) & (y_cell < Hc) & (depth > 0)
    )
    if point_mask is not None:
        inb = inb & point_mask
    gt_j = jnp.clip(y_cell, 0, Hc - 1) * Wc + jnp.clip(x_cell, 0, Wc - 1)
    if img_mask is not None:
        inb = inb & jnp.take_along_axis(img_mask, gt_j, axis=1)
    return Supervision(gt_j=gt_j, gt_valid=inb, uv_gt=uv)


def select_train_slots(
    rng: jax.Array,
    pred_i: jax.Array,     # [B, K] predicted i_ids (top-K ranked)
    pred_j: jax.Array,     # [B, K]
    pred_valid: jax.Array, # [B, K]
    sup: Supervision,
    n_gt_pad: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Build the fixed fine-stage slot set: predictions ++ sampled GT pairs.

    Returns (i_ids, j_ids, is_gt_pad) each [B, K] with the last n_gt_pad
    slots replaced by GT samples. GT sampling is uniform over valid GT rows
    via Gumbel top-k on the validity mask (static shape, no rejection loop).
    """
    B, K = pred_i.shape
    L = sup.gt_j.shape[1]
    g = jax.random.gumbel(rng, (B, L))
    scores = jnp.where(sup.gt_valid, g, -jnp.inf)
    # sample n_gt_pad distinct valid rows (if fewer valid, top-k pads with
    # -inf rows; their gt_valid gathers False and the loss masks them)
    _, gt_rows = jax.lax.top_k(scores, n_gt_pad)          # [B, P]
    gt_rows = gt_rows.astype(jnp.int32)
    gt_cols = jnp.take_along_axis(sup.gt_j, gt_rows, axis=1)
    pad_ok = jnp.take_along_axis(sup.gt_valid, gt_rows, axis=1)

    i_ids = jnp.concatenate([pred_i[:, : K - n_gt_pad], gt_rows], axis=1)
    j_ids = jnp.concatenate([pred_j[:, : K - n_gt_pad], gt_cols], axis=1)
    is_gt_pad = jnp.concatenate(
        [jnp.zeros((B, K - n_gt_pad), bool), pad_ok], axis=1
    )
    return i_ids, j_ids, is_gt_pad


def fine_gt_offsets(
    i_ids: jax.Array,
    j_ids: jax.Array,
    sup: Supervision,
    coarse_hw: tuple[int, int],
    coarse_stride: int,
    fine_stride: int,
    window_size: int,
) -> tuple[jax.Array, jax.Array]:
    """Window-normalized GT offsets for the fine loss.

    expec_f_gt = (uv_gt[i] - grid_coords(j)) / (fine_stride * radius)
    (reference utils/fine_supervision.py:4-31). Slots whose j differs from
    the GT cell produce |offset| > 1 and are dropped by the loss's
    correct_mask; we additionally require gt_valid[i].
    """
    Hc, Wc = coarse_hw
    radius = window_size // 2
    uv_i = jnp.take_along_axis(sup.uv_gt, i_ids[..., None], axis=1)  # [B,K,2]
    x = (j_ids % Wc).astype(jnp.float32) * coarse_stride
    y = (j_ids // Wc).astype(jnp.float32) * coarse_stride
    grid_uv = jnp.stack([x, y], axis=-1)
    expec_f_gt = (uv_i - grid_uv) / (fine_stride * radius)
    slot_valid = jnp.take_along_axis(sup.gt_valid, i_ids, axis=1)
    return expec_f_gt, slot_valid
