"""Training loop driver.

Replaces the reference's PyTorch-Lightning trainer + callbacks
(train_onepose_plus.py, src/lightning_model/, configs/experiment/train.yaml)
with a plain jitted-step loop: data-parallel sharding over the mesh, orbax
checkpointing (save_last + best-by-metric like the reference's
ModelCheckpoint), and host-side metric aggregation.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Iterable

import jax
import numpy as np

from ..config import EngineConfig
from ..models import OnePoseMatcher
from ..parallel import make_mesh, mesh as mesh_lib
from . import step as step_lib


def fit(
    cfg: EngineConfig,
    model: OnePoseMatcher,
    batches: Iterable[step_lib.Batch],
    n_steps: int,
    seed: int | None = None,
    mesh=None,
    ckpt_dir: str | Path | None = None,
    ckpt_every: int = 1000,
    log_every: int = 50,
    log_fn: Callable[[int, dict], None] | None = None,
    steps_per_epoch: int = 1000,
    init_state: step_lib.TrainState | None = None,
    val_fn: Callable[[step_lib.TrainState], dict] | None = None,
    val_every: int = 1000,
    select_metric: str = "3cm@3degree",
    tb_dir: str | Path | None = None,
    artifacts_dir: str | Path | None = None,
) -> tuple[step_lib.TrainState, list[dict]]:
    """Run `n_steps` of training over `batches` (an iterable of host Batches).

    Returns (final_state, history). With a mesh, batches are sharded on the
    "data" axis and parameters replicated (XLA inserts the gradient psum).

    val_fn: optional callback returning scalar metrics (e.g. pose APs from
    infer.evaluate); run every `val_every` steps and at the end, logged into
    history as val/<k>. When checkpointing, the step whose `select_metric`
    is best is additionally recorded in ckpt_dir/best.json — the reference's
    ModelCheckpoint(monitor='3cm@3degree') model selection
    (OnePose_ST configs/experiment/train.yaml:204-213).
    """
    import jax.numpy as jnp

    seed = cfg.train.seed if seed is None else seed
    mesh = mesh or make_mesh(1)
    world = int(np.prod(list(mesh.shape.values())))
    tx = step_lib.make_optimizer(cfg.train, world, steps_per_epoch)

    it = iter(batches)
    first = next(it)
    batch0 = mesh_lib.shard_pytree(first, mesh)
    if init_state is None:
        state = step_lib.init_state(
            jax.random.key(seed), model, tx, batch0
        )
        state = mesh_lib.replicate_pytree(state, mesh)
    else:
        state = init_state

    jitted = jax.jit(
        step_lib.train_step, static_argnames=("model", "tx", "cfg")
    )

    ckpt_mgr = None
    best_mgr = None
    if ckpt_dir is not None:
        import orbax.checkpoint as ocp

        ckpt_mgr = ocp.CheckpointManager(
            Path(ckpt_dir).absolute(),
            options=ocp.CheckpointManagerOptions(max_to_keep=3),
        )
        if val_fn is not None:
            # separate manager so periodic max_to_keep GC can never delete
            # the best-metric checkpoint (loads via
            # load_checkpoint(ckpt_dir + "/best"))
            best_mgr = ocp.CheckpointManager(
                Path(ckpt_dir).absolute() / "best",
                options=ocp.CheckpointManagerOptions(max_to_keep=1),
            )

    tb = None
    if tb_dir is None and ckpt_dir is not None:
        tb_dir = Path(ckpt_dir) / "tb"
    if tb_dir is not None:
        from ..utils.tboard import SummaryWriter

        tb = SummaryWriter(tb_dir)

    history: list[dict] = []
    best = {"step": -1, "metric": -float("inf")}
    # per-step RNG is fold_in(base, global_step): a resumed run replays the
    # exact RNG stream of an uninterrupted one (see load_train_state)
    base_rng = jax.random.key(seed + 1)
    start = int(jax.device_get(state.step))
    batch = batch0
    t0 = time.time()

    def run_val(step):
        metrics = val_fn(state)
        # val_fn may return figures (HxW[xC] arrays) alongside scalars —
        # the reference logs both (lightning_model:141-157)
        figs = {
            k: v for k, v in metrics.items()
            if getattr(v, "ndim", 0) >= 2
        }
        # any non-scalar that is not a figure (e.g. a 1-D per-frame metric
        # array) cannot go through float(); log its mean as the scalar
        rec = {
            f"val/{k}": float(np.mean(v)) if getattr(v, "ndim", 0) >= 1
            else float(v)
            for k, v in metrics.items() if k not in figs
        }
        rec["step"] = step
        history.append(rec)
        if tb is not None:
            tb.add_scalars(rec, step)
            for k, v in figs.items():
                tb.add_image(f"val/{k}", v, step)
        if log_fn:
            log_fn(step, rec)
        m = metrics.get(select_metric)
        if m is not None and float(m) > best["metric"]:
            best.update(step=step, metric=float(m))
            if best_mgr is not None:
                best_mgr.save(step, args=_ckpt_args(state))

    with mesh:
        for i in range(n_steps):
            g = start + i + 1
            sub = jax.random.fold_in(base_rng, g)
            state, scalars = jitted(
                state, batch, sub, model=model, tx=tx, cfg=cfg
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
            if val_fn is not None and (i + 1) % val_every == 0 and i + 1 < n_steps:
                run_val(g)
            if ckpt_mgr is not None and (i + 1) % ckpt_every == 0:
                ckpt_mgr.save(
                    g, args=_ckpt_args(state)
                )
    if val_fn is not None:
        run_val(start + n_steps)
    if ckpt_dir is not None and best["step"] >= 0:
        import json

        (Path(ckpt_dir) / "best.json").write_text(
            json.dumps({"metric": select_metric, **best})
        )
    if ckpt_mgr is not None:
        ckpt_mgr.save(start + n_steps, args=_ckpt_args(state))
        ckpt_mgr.wait_until_finished()
    if best_mgr is not None:
        best_mgr.wait_until_finished()
    if tb is not None:
        tb.flush()
        tb.close()
    if ckpt_dir is not None and history:
        # scalar history as JSONL next to the checkpoints (the role of the
        # reference's CSV logger, configs/experiment/train.yaml:218-228)
        import json

        with open(Path(ckpt_dir) / "history.jsonl", "a") as f:
            for rec in history:
                f.write(json.dumps(rec) + "\n")
    if artifacts_dir is not None and ckpt_dir is not None:
        # versioned run artifact (role of the reference's W&B artifact
        # callback, src/callbacks/wandb_callbacks.py:17-83): snapshot the
        # selection-metric-best checkpoint (falling back to last) with a
        # content-hashed manifest
        from ..utils.artifacts import ArtifactRegistry

        reg = ArtifactRegistry(artifacts_dir)
        best_dir = Path(ckpt_dir) / "best"
        files: dict[str, str | Path] = {}
        src = best_dir if best_mgr is not None and best["step"] >= 0 else Path(ckpt_dir)
        steps = [p for p in src.iterdir() if p.name.isdigit()] if src.is_dir() else []
        if steps:
            newest = max(steps, key=lambda p: int(p.name))
            files[f"ckpt/{newest.name}"] = newest
        for extra in ("best.json", "history.jsonl", "model_config.json"):
            if (Path(ckpt_dir) / extra).exists():
                files[extra] = Path(ckpt_dir) / extra
        if files:
            reg.log_artifact(
                "train-run",
                files,
                metadata={
                    "select_metric": select_metric,
                    # no validation ran -> null, not non-RFC -Infinity/-1
                    "best_step": best["step"] if best["step"] >= 0 else None,
                    "best_metric": (
                        best["metric"] if best["step"] >= 0 else None
                    ),
                    "final_step": start + n_steps,
                },
            )
    return state, history


def _ckpt_args(state):
    """Full-state checkpoint: params, batch stats, optimizer state, step.

    The optimizer state is saved as its flat leaf list — optax states are
    nested NamedTuples (incl. field-less EmptyState) that orbax cannot
    round-trip without a target; the treedef is rebuilt from tx.init at
    restore (load_train_state). Inference-only loads (load_checkpoint)
    ignore the extra items.
    """
    import orbax.checkpoint as ocp

    return ocp.args.Composite(
        params=ocp.args.PyTreeSave(state.params),
        batch_stats=ocp.args.PyTreeSave(state.batch_stats),
        opt_leaves=ocp.args.PyTreeSave(
            {"leaves": list(jax.tree.leaves(state.opt_state)),
             "step": state.step}
        ),
    )


def load_checkpoint(ckpt_dir: str | Path, step: int | None = None):
    """Load (params, batch_stats) from an orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(Path(ckpt_dir).absolute())
    step = step if step is not None else mgr.latest_step()
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            params=ocp.args.PyTreeRestore(),
            batch_stats=ocp.args.PyTreeRestore(),
        ),
    )
    return {"params": restored["params"], "batch_stats": restored["batch_stats"]}


def load_train_state(
    ckpt_dir: str | Path, tx, step: int | None = None
) -> step_lib.TrainState:
    """Restore a full TrainState for resumption (reference: PL
    resume_from_checkpoint). `tx` must be built with the same recipe as the
    interrupted run — its init supplies the optax treedef that the saved
    flat leaves are unflattened into. Training resumed from the returned
    state replays the identical RNG stream (fit folds the base key with the
    global step) and continues checkpoint numbering.
    """
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(Path(ckpt_dir).absolute())
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            params=ocp.args.PyTreeRestore(),
            batch_stats=ocp.args.PyTreeRestore(),
            opt_leaves=ocp.args.PyTreeRestore(),
        ),
    )
    params = restored["params"]
    treedef = jax.tree.structure(tx.init(params))
    opt_state = jax.tree.unflatten(
        treedef, restored["opt_leaves"]["leaves"]
    )
    return step_lib.TrainState(
        params=params,
        batch_stats=restored["batch_stats"],
        opt_state=opt_state,
        step=jnp.asarray(restored["opt_leaves"]["step"], jnp.int32),
    )
