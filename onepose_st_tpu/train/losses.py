"""Focal coarse loss + std-weighted L2 fine loss.

Re-design of reference src/lightning_model/losses.py with masked static
shapes: instead of boolean indexing (`conf[conf_gt == 1]`) we compute masked
means, which is exactly equivalent and jit-friendly. The DDP-deadlock
workarounds of the reference (fake supervision, losses.py:86-91) are
unnecessary — a masked mean over zero elements is just guarded by max(count, 1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import LossConfig


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def coarse_focal_loss(
    conf: jax.Array,          # [B, L, S] dual-softmax confidences (f32)
    gt_j: jax.Array,          # [B, L] int32 GT grid cell per point
    gt_valid: jax.Array,      # [B, L] bool — point has a GT projection
    point_mask: jax.Array,    # [B, L] bool — real (non-padding) point
    cfg: LossConfig,
) -> jax.Array:
    """Focal BCE over the (points x grid) confidence matrix.

    GT is the one-hot of gt_j on valid rows (reference builds conf_matrix_gt
    on host, OnePosePlus_dataset.py:174; we fuse it on device).
    Positive cells: (l, gt_j[l]) for valid l. Negative cells: everything else
    on real-point rows.
    """
    B, L, S = conf.shape
    conf = jnp.clip(conf, 1e-6, 1 - 1e-6)
    row_valid = gt_valid & point_mask
    pos_mask = (
        jax.nn.one_hot(gt_j, S, dtype=jnp.bool_) & row_valid[..., None]
    )
    neg_mask = (~pos_mask) & point_mask[..., None]
    a, g = cfg.focal_alpha, cfg.focal_gamma
    loss_pos = -a * jnp.power(1 - conf, g) * jnp.log(conf)
    loss_neg = -(1 - a) * jnp.power(conf, g) * jnp.log(1 - conf)
    return cfg.pos_weight * _masked_mean(loss_pos, pos_mask) + (
        cfg.neg_weight * _masked_mean(loss_neg, neg_mask)
    )


def fine_l2_std_loss(
    expec_f: jax.Array,       # [B, K, 3] predicted (x, y, std), window-normed
    expec_f_gt: jax.Array,    # [B, K, 2] GT offsets, window-normed
    slot_valid: jax.Array,    # [B, K] bool — slot has a usable GT
    cfg: LossConfig,
) -> jax.Array:
    """L2 on sub-pixel offsets weighted by inverse predicted std
    (reference losses.py:66-101)."""
    correct = (
        jnp.max(jnp.abs(expec_f_gt), axis=-1) < cfg.fine_correct_thr
    ) & slot_valid
    std = expec_f[..., 2]
    inv_std = 1.0 / jnp.clip(std, 1e-10, None)
    mean_inv = _masked_mean(inv_std, correct)
    weight = jax.lax.stop_gradient(inv_std / jnp.maximum(mean_inv, 1e-10))
    offset_l2 = jnp.sum((expec_f_gt - expec_f[..., :2]) ** 2, axis=-1)
    return _masked_mean(offset_l2 * weight, correct)


def total_loss(
    conf: jax.Array,
    gt_j: jax.Array,
    gt_valid: jax.Array,
    point_mask: jax.Array,
    expec_f: jax.Array,
    expec_f_gt: jax.Array,
    slot_valid: jax.Array,
    cfg: LossConfig,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    lc = coarse_focal_loss(conf, gt_j, gt_valid, point_mask, cfg)
    lf = fine_l2_std_loss(expec_f, expec_f_gt, slot_valid, cfg)
    loss = cfg.coarse_weight * lc + cfg.fine_weight * lf
    return loss, {"loss": loss, "loss_coarse": lc, "loss_fine": lf}
