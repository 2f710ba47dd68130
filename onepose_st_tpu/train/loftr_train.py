"""Training step + loop for the 2D-2D LoFTR-style matcher.

The reference ships LoFTR as a frozen pretrained submodule; this framework
trains it from scratch on synthetic supervision (train/loftr_data.py).
The step mirrors the 2D-3D matcher's (train/step.py): dense coarse focal
loss over the S0 x S1 dual-softmax matrix, GT-padded fine slots, fine
std-weighted L2 — the same losses and slot machinery, with image-0 coarse
cells playing the role of the 3D points.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import LoFTRConfig, TrainConfig
from ..models.loftr import LoFTRMatcher
from ..ops import matching as match_ops
from ..parallel import make_mesh, mesh as mesh_lib
from . import losses, supervision
from .loftr_data import LoFTRBatch
from .step import TrainState, make_optimizer


def init_state(
    rng: jax.Array, model: LoFTRMatcher, tx, sample: LoFTRBatch
) -> TrainState:
    variables = model.init(
        rng, jnp.asarray(sample.image0), jnp.asarray(sample.image1), train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def train_step(
    state: TrainState,
    batch: LoFTRBatch,
    rng: jax.Array,
    model: LoFTRMatcher,
    tx,
    cfg: LoFTRConfig,
    train_cfg: TrainConfig,
) -> tuple[TrainState, dict[str, jax.Array]]:
    """One optimizer step. Jit with static (model, tx, cfg, train_cfg)."""
    sup = supervision.Supervision(
        gt_j=batch.gt_j, gt_valid=batch.gt_valid, uv_gt=batch.uv_gt
    )

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        out, mutated = model.apply(
            variables,
            batch.image0,
            batch.image1,
            train=True,
            mutable=["batch_stats"],
            method=LoFTRMatcher.coarse,
        )
        m = out["matches"]
        cm = cfg.coarse_matching
        n_gt_pad = max(
            cm.train_pad_num_gt_min,
            cm.max_matches - int(cm.max_matches * cm.train_coarse_percent),
        )
        # never more GT slots than match slots or coarse rows (S0 = coarse
        # cells of image0 caps the available GT pool at small image sizes)
        n_gt_pad = min(n_gt_pad, cm.max_matches, int(batch.gt_j.shape[1]))
        i_ids, j_ids, _ = supervision.select_train_slots(
            rng, m.i_ids, m.j_ids, m.valid, sup, n_gt_pad=n_gt_pad
        )
        fine_out = model.apply(
            variables,
            out["feat_f0"],
            out["feat_f1"],
            i_ids,
            j_ids,
            out["coarse_hw"],
            method=LoFTRMatcher.fine,
        )
        expec_f_gt, slot_valid = supervision.fine_gt_offsets(
            i_ids, j_ids, sup, out["coarse_hw"],
            cfg.backbone.coarse_stride,
            cfg.backbone.fine_stride,
            cfg.fine.window_size,
        )
        border = match_ops.grid_border_mask(
            out["coarse_hw"], cm.border_rm
        )
        point_mask = batch.row_mask & border[None]
        loss, scalars = losses.total_loss(
            out["conf_matrix"], sup.gt_j, sup.gt_valid, point_mask,
            fine_out["expec_f"], expec_f_gt, slot_valid, train_cfg.loss,
        )
        return loss, (scalars, mutated["batch_stats"])

    (_, (scalars, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    scalars = dict(scalars)
    scalars["grad_norm"] = optax.global_norm(grads)
    return (
        TrainState(new_params, new_stats, new_opt, state.step + 1),
        scalars,
    )


def match_precision(
    model: LoFTRMatcher,
    variables,
    batch: LoFTRBatch,
    cell_tolerance: int = 1,
) -> dict[str, float]:
    """Fraction of extracted matches within `cell_tolerance` of GT.

    The quantitative sanity gate for a trained matcher (the reference has
    no such eval; its LoFTR ships pretrained).
    """
    out = jax.jit(
        lambda v, a, b: model.apply(v, a, b, dense_conf=True)
    )(variables, jnp.asarray(batch.image0), jnp.asarray(batch.image1))
    i_ids = np.asarray(out["i_ids"])
    j_ids = np.asarray(out["j_ids"])
    valid = np.asarray(out["valid"])
    B = i_ids.shape[0]
    Hc, Wc = out["coarse_hw"]
    n_ok = n_tot = 0
    for b in range(B):
        rows = i_ids[b][valid[b]]
        cols = j_ids[b][valid[b]]
        has_gt = batch.gt_valid[b][rows]
        gt = batch.gt_j[b][rows]
        dx = np.abs((cols % Wc) - (gt % Wc))
        dy = np.abs((cols // Wc) - (gt // Wc))
        ok = has_gt & (dx <= cell_tolerance) & (dy <= cell_tolerance)
        n_ok += int(ok.sum())
        n_tot += int(has_gt.sum())
    return {
        "precision": n_ok / max(n_tot, 1),
        "n_matches": n_tot / max(B, 1),
    }


def fit_loftr(
    cfg: LoFTRConfig,
    train_cfg: TrainConfig,
    model: LoFTRMatcher,
    batches: Iterable[LoFTRBatch],
    n_steps: int,
    seed: int | None = None,
    mesh=None,
    ckpt_dir: str | Path | None = None,
    ckpt_every: int = 1000,
    log_every: int = 50,
    log_fn: Callable[[int, dict], None] | None = None,
    steps_per_epoch: int = 1000,
    init: TrainState | None = None,
    tb_dir=None,
) -> tuple[TrainState, list[dict]]:
    """Train the 2D-2D matcher; mirrors train/loop.fit for the 2D-3D one."""
    seed = train_cfg.seed if seed is None else seed
    mesh = mesh or make_mesh(1)
    world = int(np.prod(list(mesh.shape.values())))
    tx = make_optimizer(train_cfg, world, steps_per_epoch)

    it = iter(batches)
    first = next(it)
    batch0 = mesh_lib.shard_pytree(first, mesh)
    if init is None:
        state = init_state(jax.random.key(seed), model, tx, first)
        state = mesh_lib.replicate_pytree(state, mesh)
    else:
        state = init

    jitted = jax.jit(
        train_step, static_argnames=("model", "tx", "cfg", "train_cfg")
    )
    ckpt_mgr = None
    if ckpt_dir is not None:
        import orbax.checkpoint as ocp

        ckpt_mgr = ocp.CheckpointManager(
            Path(ckpt_dir).absolute(),
            options=ocp.CheckpointManagerOptions(max_to_keep=3),
        )

    tb = None
    if tb_dir is None and ckpt_dir is not None:
        tb_dir = Path(ckpt_dir) / "tb"
    if tb_dir is not None:
        from ..utils.tboard import SummaryWriter

        tb = SummaryWriter(tb_dir)
    history: list[dict] = []
    # fold_in(base, global_step) RNG: resume replays the exact stream
    base_rng = jax.random.key(seed + 1)
    start = int(jax.device_get(state.step))
    batch = batch0
    t0 = time.time()
    with mesh:
        for i in range(n_steps):
            g = start + i + 1
            sub = jax.random.fold_in(base_rng, g)
            state, scalars = jitted(
                state, batch, sub, model=model, tx=tx, cfg=cfg,
                train_cfg=train_cfg,
            )
            if i + 1 < n_steps:
                batch = mesh_lib.shard_pytree(next(it), mesh)
            if (i + 1) % log_every == 0 or i == 0:
                rec = {k: float(v) for k, v in scalars.items()}
                rec["step"] = g
                rec["steps_per_sec"] = (i + 1) / (time.time() - t0)
                history.append(rec)
                if tb is not None:
                    tb.add_scalars(rec, g, prefix="train/")
                if log_fn:
                    log_fn(g, rec)
            if ckpt_mgr is not None and (i + 1) % ckpt_every == 0:
                ckpt_mgr.save(g, args=_ckpt_args(state))
    if ckpt_mgr is not None:
        ckpt_mgr.save(start + n_steps, args=_ckpt_args(state))
        ckpt_mgr.wait_until_finished()
    if tb is not None:
        tb.flush()
        tb.close()
    if ckpt_dir is not None and history:
        import json

        with open(Path(ckpt_dir) / "history.jsonl", "a") as f:
            for rec in history:
                f.write(json.dumps(rec) + "\n")
    return state, history


def _ckpt_args(state: TrainState):
    from .loop import _ckpt_args as full_ckpt_args

    return full_ckpt_args(state)
