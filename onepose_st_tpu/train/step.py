"""Sharded training step for the 2D-3D matcher.

Replaces the reference's PyTorch-Lightning DDP stack
(src/lightning_model/OnePosePlus_lightning_model.py + train.yaml:16-166)
with a single jitted function over a `jax.sharding.Mesh`: the batch is
sharded on the "data" axis, parameters are replicated, and XLA inserts the
gradient all-reduce. LR scaling follows train_onepose_plus.py:24-39.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import EngineConfig, TrainConfig
from ..models import OnePoseMatcher
from . import losses, supervision


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


class Batch(NamedTuple):
    """One training batch (all leading dims = B, static shapes)."""

    query_image: jax.Array   # [B, H, W, 1]
    kpts3d: jax.Array        # [B, L, 3]
    desc3d_coarse: jax.Array # [B, L, Cc]
    desc3d_fine: jax.Array   # [B, L, Cf]
    point_mask: jax.Array    # [B, L] bool
    pose_gt: jax.Array       # [B, 6]
    K_crop: jax.Array        # [B, 3, 3]
    # visibility of coarse cells (True = real source pixels; black
    # warp-fill cells are excluded from attention/matching/supervision).
    # None = everything valid (non-jittered crops).
    img_mask: jax.Array | None = None   # [B, Hc*Wc] bool


def _accumulate_branchless(tx, k: int):
    """Gradient accumulation without optax.MultiSteps.

    MultiSteps' lax.cond compiles (on TPU) into a rolled while loop that
    copies every optimizer-state leaf through ~270 per-leaf async copies —
    measured 34 ms of a 102 ms train step (trace, round 4). This wrapper is
    branchless: the inner update is COMPUTED every micro-step (AdamW math
    is ~1 ms) and the state/updates are selected with jnp.where, which XLA
    fuses into the elementwise stream. Semantics match MultiSteps: the
    MEAN of k consecutive gradients feeds one inner update; the inner step
    count (bias correction, LR schedule) advances once per k micro-steps.
    """

    def init(params):
        return {
            "inner": tx.init(params),
            "acc": jax.tree.map(jnp.zeros_like, params),
            "i": jnp.zeros((), jnp.int32),
        }

    def update(grads, state, params=None):
        i = state["i"]
        apply_now = (i % k) == (k - 1)
        acc = jax.tree.map(lambda a, g: a + g / k, state["acc"], grads)
        updates, inner_new = tx.update(acc, state["inner"], params)
        gate = apply_now.astype(jnp.float32)
        updates = jax.tree.map(
            lambda u: u * gate.astype(u.dtype), updates
        )
        inner = jax.tree.map(
            lambda n, o: jnp.where(apply_now, n, o) if hasattr(n, "dtype")
            else n,
            inner_new, state["inner"],
        )
        acc = jax.tree.map(
            lambda a: a * (1.0 - gate).astype(a.dtype), acc
        )
        return updates, {"inner": inner, "acc": acc, "i": i + 1}

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: TrainConfig, world_size: int, steps_per_epoch: int):
    """AdamW + MultiStepLR(gamma @ milestones) + global-norm clip.

    With accumulate_steps > 1, gradients of k consecutive micro-steps are
    averaged into one optimizer update (the reference's
    accumulate_grad_batches, train.yaml:33) via a branchless accumulator
    (see _accumulate_branchless); `steps_per_epoch` stays in micro-steps,
    so LR milestones land on the same data boundaries.
    """
    lr = cfg.true_lr(world_size)
    k = max(cfg.accumulate_steps, 1)
    boundaries = {
        max(int(m * steps_per_epoch) // k, 1): cfg.lr_gamma
        for m in cfg.lr_milestones
    }
    schedule = optax.piecewise_constant_schedule(lr, boundaries)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )
    if k > 1:
        tx = _accumulate_branchless(tx, k)
    return tx


def init_state(
    rng: jax.Array, model: OnePoseMatcher, tx, sample: Batch
) -> TrainState:
    variables = model.init(
        rng,
        sample.query_image,
        sample.kpts3d,
        sample.desc3d_coarse,
        sample.desc3d_fine,
        sample.point_mask,
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _gate_subtree(tree, key: str, gate: jax.Array):
    """Multiply every leaf under tree[key] by `gate` (0.0 or 1.0)."""
    return {
        k: jax.tree.map(lambda u: u * gate, v) if k == key else v
        for k, v in tree.items()
    }


def train_step(
    state: TrainState,
    batch: Batch,
    rng: jax.Array,
    model: OnePoseMatcher,
    tx,
    cfg: EngineConfig,
) -> tuple[TrainState, dict[str, jax.Array]]:
    """One optimizer step. Jit with static (model, tx, cfg)."""
    mcfg = cfg.matcher
    H, W = batch.query_image.shape[1:3]
    sup = supervision.project_gt(
        batch.kpts3d,
        batch.pose_gt,
        batch.K_crop,
        (H, W),
        mcfg.backbone.coarse_stride,
        batch.point_mask,
        img_mask=batch.img_mask,
    )

    fused = cfg.train.loss.fused_coarse and cfg.train.loss.focal_gamma == 2.0

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        if fused:
            # fused path: tokens once; match extraction through the
            # inference Pallas kernel on stopped gradients (slot indices
            # are integers — no gradient flows); the dense [B, L, S] conf
            # matrix never exists, the focal loss runs through the fused
            # custom-VJP kernel (ops/pallas_kernels/focal_dsmax.py)
            from ..ops import matching as match_ops
            from ..ops import pallas_kernels as fused_ops

            # img_mask is deliberately NOT passed to coarse_tokens: the
            # filter-only design (matcher2d3d.py coarse() docstring) keeps
            # attention/softmax unmasked in BOTH train paths and inference
            # — full masking measured a 0.06 AP train/test-distribution
            # regression (logs/ffe_r4a.log). The mask acts only through
            # project_gt (supervision gating) and the col_mask post-filter
            # below, matching the dense method=coarse branch.
            (q_tok, p_tok, feat_f, chw), mutated = model.apply(
                variables,
                batch.query_image,
                batch.kpts3d,
                batch.desc3d_coarse,
                batch.point_mask,
                train=True,
                mutable=["batch_stats"],
                method=OnePoseMatcher.coarse_tokens,
            )
            border = match_ops.grid_border_mask(
                chw, mcfg.coarse_matching.border_rm
            )
            matches = fused_ops.extract_matches_fused(
                jax.lax.stop_gradient(p_tok),
                jax.lax.stop_gradient(q_tok),
                temperature=mcfg.coarse_matching.temperature,
                threshold=mcfg.coarse_matching.threshold,
                max_matches=mcfg.coarse_matching.max_matches,
                point_mask=batch.point_mask,
                border_mask_cols=border,
                col_mask=batch.img_mask,
            )
            out = {
                "matches": matches, "feat_f": feat_f, "coarse_hw": chw,
                "conf_matrix": None, "_tokens": (p_tok, q_tok),
            }
        else:
            out, mutated = model.apply(
                variables,
                batch.query_image,
                batch.kpts3d,
                batch.desc3d_coarse,
                batch.point_mask,
                train=True,
                img_mask=batch.img_mask,
                mutable=["batch_stats"],
                method=OnePoseMatcher.coarse,
            )
        m = out["matches"]
        # slot layout: model's own top-K predictions ++ sampled GT pads
        # (reference coarse_matching.py:177-217 semantics, static shapes)
        # predictions keep at most train_coarse_percent of the slot budget;
        # GT pairs fill the rest (reference coarse_matching.py:177-217)
        cm = mcfg.coarse_matching
        n_gt_pad = max(
            cm.train_pad_num_gt_min,
            cm.max_matches - int(cm.max_matches * cm.train_coarse_percent),
        )
        n_gt_pad = min(n_gt_pad, cm.max_matches)
        i_ids, j_ids, _ = supervision.select_train_slots(
            rng, m.i_ids, m.j_ids, m.valid, sup, n_gt_pad=n_gt_pad
        )
        fine_out = model.apply(
            variables,
            out["feat_f"],
            batch.desc3d_fine,
            i_ids,
            j_ids,
            out["coarse_hw"],
            method=OnePoseMatcher.fine,
        )
        expec_f_gt, slot_valid = supervision.fine_gt_offsets(
            i_ids, j_ids, sup, out["coarse_hw"],
            mcfg.backbone.coarse_stride,
            mcfg.backbone.fine_stride,
            mcfg.fine.window_size,
        )
        if fused:
            from ..ops.pallas_kernels.focal_dsmax import (
                fused_coarse_focal_loss,
            )

            p_tok, q_tok = out["_tokens"]
            lcfg = cfg.train.loss
            lc = fused_coarse_focal_loss(
                p_tok, q_tok, sup.gt_j, sup.gt_valid, batch.point_mask,
                mcfg.coarse_matching.temperature,
                lcfg.focal_alpha, lcfg.pos_weight, lcfg.neg_weight,
            )
            lf = losses.fine_l2_std_loss(
                fine_out["expec_f"], expec_f_gt, slot_valid, lcfg
            )
            loss = lcfg.coarse_weight * lc + lcfg.fine_weight * lf
            scalars = {"loss": loss, "loss_coarse": lc, "loss_fine": lf}
        else:
            loss, scalars = losses.total_loss(
                out["conf_matrix"], sup.gt_j, sup.gt_valid, batch.point_mask,
                fine_out["expec_f"], expec_f_gt, slot_valid, cfg.train.loss,
            )
        return loss, (scalars, mutated["batch_stats"])

    (loss, (scalars, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    if cfg.train.freeze_backbone_steps:
        # backbone frozen for the first N steps (reference
        # src/callbacks/custom_callbacks.py). Gating both grads (keeps Adam
        # moments at zero) and updates (blocks AdamW weight decay).
        gate = (state.step >= cfg.train.freeze_backbone_steps).astype(
            jnp.float32
        )
        grads = _gate_subtree(grads, "backbone", gate)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    if cfg.train.freeze_backbone_steps:
        updates = _gate_subtree(updates, "backbone", gate)
    new_params = optax.apply_updates(state.params, updates)
    scalars = dict(scalars)
    scalars["grad_norm"] = optax.global_norm(grads)
    return (
        TrainState(new_params, new_stats, new_opt, state.step + 1),
        scalars,
    )
