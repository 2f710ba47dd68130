"""Training step for the learned point tracker.

Loss follows the RAFT/CoTracker recipe: Huber distance on every update
iteration's trajectory with exponentially increasing weight toward the
final iteration, plus balanced sigmoid cross-entropy on visibility.
Position supervision is applied to *visible* ground-truth samples only
(an occluded point's true position is unobservable from the frame); the
visibility head is supervised everywhere.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import TrackerConfig
from ..models.tracker import CoTrackerNet


class TrackerTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(lr: float = 3e-4, steps: int = 20000, warmup: int = 200):
    warmup = min(warmup, max(steps // 10, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=warmup, decay_steps=steps, end_value=lr * 0.05
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=1e-4),
    )


def init_state(
    rng: jax.Array, model: CoTrackerNet, tx, sample: dict
) -> TrackerTrainState:
    variables = jax.jit(model.init)(
        rng,
        jnp.asarray(sample["frames"]),
        jnp.asarray(sample["query_uv"]),
        jnp.asarray(sample["query_frame"]),
        jnp.asarray(sample["point_mask"]),
    )
    params = variables["params"]
    return TrackerTrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )


def tracker_loss(
    out: dict,
    gt_uv: jax.Array,      # [B, T, N, 2]
    gt_vis: jax.Array,     # [B, T, N] bool
    point_mask: jax.Array, # [B, N] bool
    cfg: TrackerConfig,
    gamma: float = 0.8,
    huber_delta: float = 4.0,
):
    m = point_mask[:, None, :] & gt_vis          # supervise visible samples
    mf = m.astype(jnp.float32)
    denom = jnp.sum(mf) + 1e-6

    pos_loss = 0.0
    M = out["coords_per_iter"].shape[0]
    for i in range(M):
        err = out["coords_per_iter"][i] - gt_uv
        l = optax.huber_loss(err, delta=huber_delta).sum(-1)  # [B, T, N]
        pos_loss = pos_loss + (gamma ** (M - 1 - i)) * jnp.sum(l * mf) / denom

    vm = point_mask[:, None, :].astype(jnp.float32)
    vt = gt_vis.astype(jnp.float32)
    bce = optax.sigmoid_binary_cross_entropy(out["vis_logit"], vt)
    vis_loss = jnp.sum(bce * vm) / (jnp.sum(vm) + 1e-6)

    final_err = jnp.sqrt(
        jnp.sum((out["coords"] - gt_uv) ** 2, axis=-1) + 1e-12
    )
    epe = jnp.sum(final_err * mf) / denom
    return pos_loss + vis_loss, {
        "pos_loss": pos_loss,
        "vis_loss": vis_loss,
        "epe": epe,
    }


def train_step(
    state: TrackerTrainState,
    batch: dict,
    *,
    model: CoTrackerNet,
    tx,
    cfg: TrackerConfig,
):
    def loss_fn(params):
        out = model.apply(
            {"params": params},
            batch["frames"],
            batch["query_uv"],
            batch["query_frame"],
            batch["point_mask"],
        )
        return tracker_loss(
            out, batch["gt_uv"], batch["gt_vis"], batch["point_mask"], cfg
        )

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    scalars = {
        "loss": loss,
        "grad_norm": optax.global_norm(grads),
        **aux,
    }
    return TrackerTrainState(params, opt_state, state.step + 1), scalars
