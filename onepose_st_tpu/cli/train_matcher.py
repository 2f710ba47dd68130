"""2D-3D matcher training CLI.

Framework analogue of reference `train_onepose_plus.py +experiment=train`:
data-parallel over the device mesh, AdamW + MultiStepLR with world-size LR
scaling, orbax checkpoints.

Usage:
  python -m onepose_st_tpu.cli.train_matcher --data_dir data/obj \
      --map map.npz --ckpt_dir ckpts/matcher --steps 20000 [--batch 4]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", default=None,
                    help="single-object mode: dir of *-annotate sequences")
    ap.add_argument("--map", default=None, help="single-object mode: map npz")
    ap.add_argument("--data_index", default=None,
                    help="multi-object mode: merged index JSON "
                         "(data.annotations.merge_objects)")
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=4, help="per-device batch")
    ap.add_argument("--seed", type=int, default=12345)
    ap.add_argument("--val_every", type=int, default=1000,
                    help="pose-AP validation cadence (multi-object mode; "
                         "best ckpt by 3cm@3degree like the reference)")
    ap.add_argument("--val_frames", type=int, default=16)
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation micro-steps per update "
                         "(reference accumulate_grad_batches: 2)")
    ap.add_argument("--artifacts_dir", default=None,
                    help="versioned artifact registry root: snapshot the "
                         "best checkpoint + manifest at the end of the run "
                         "(utils/artifacts.py; the reference's W&B artifact "
                         "callback role)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in --ckpt_dir "
                         "(full optimizer state; --steps = additional steps)")
    args = ap.parse_args()

    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from .. import config as cfg_lib
    from ..data import parse_arkit
    from ..models import OnePoseMatcher
    from ..parallel import make_mesh
    from ..sfm.map import SfMMap
    from ..train import data as data_mod, loop as loop_mod

    cfg = cfg_lib.adapt_dtypes(cfg_lib.EngineConfig())
    # keep the linear LR-scaling recipe consistent with the actual batch
    # (true_lr scales by world * batch_size_per_device / canonical_bs)
    cfg = cfg_lib.replace(
        cfg, train=cfg_lib.replace(
            cfg.train, batch_size_per_device=args.batch,
            accumulate_steps=args.accum,
        )
    )
    cfg_lib.save_model_config(args.ckpt_dir, cfg)
    mesh = make_mesh()
    n_dev = len(jax.devices())
    rng = np.random.default_rng(args.seed)
    model = OnePoseMatcher(cfg.matcher)

    val_fn = None
    if args.data_index:
        from ..data import annotations as anno

        entries = anno.load_index(args.data_index)
        objects = anno.load_training_objects(entries)
        n_frames = sum(len(o[1]) for o in objects)
        print(f"{len(objects)} objects, {n_frames} training frames")
        batches = data_mod.multi_object_batches(
            objects, cfg, rng, batch_size=args.batch * n_dev,
            homography_prob=0.2, photometric="dark",
        )
        val_objects = anno.load_training_objects(entries, split="val")
        if val_objects:
            val_fn = _make_val_fn(
                cfg, model, val_objects, n_frames=args.val_frames
            )
    else:
        if not (args.data_dir and args.map):
            raise SystemExit("need --data_index, or --data_dir with --map")
        sfm_map = SfMMap.load(args.map)
        seq_dirs = sorted(Path(args.data_dir).glob("*-annotate"))
        seqs = [parse_arkit.load_sequence(s) for s in seq_dirs]
        frames = np.concatenate([s.images for s in seqs])
        poses = np.concatenate([s.poses for s in seqs])
        Ks = np.concatenate([s.Ks for s in seqs])
        print(f"{len(frames)} training frames; map {len(sfm_map.keypoints3d)} pts")
        batches = data_mod.map_training_batches(
            sfm_map, frames, poses, Ks, cfg, rng,
            batch_size=args.batch * n_dev, augment_brightness=0.1,
        )
    def log_fn(s, r):
        if "loss" in r:
            print(
                f"step {s}: loss {r['loss']:.4f} "
                f"(coarse {r['loss_coarse']:.4f} fine {r['loss_fine']:.4f}) "
                f"{r['steps_per_sec']:.2f} it/s"
            )
        else:
            print(f"step {s}: {r}")

    init_state = None
    if args.resume:
        import numpy as _np

        from ..parallel import mesh as mesh_lib
        from ..train import step as step_lib

        world = int(_np.prod(list(mesh.shape.values())))
        tx = step_lib.make_optimizer(cfg.train, world, steps_per_epoch=1000)
        init_state = loop_mod.load_train_state(args.ckpt_dir, tx)
        init_state = mesh_lib.replicate_pytree(init_state, mesh)
        print(f"resumed from step {int(init_state.step)} in {args.ckpt_dir}")

    state, history = loop_mod.fit(
        cfg, model, batches, n_steps=args.steps, mesh=mesh,
        ckpt_dir=args.ckpt_dir, log_every=100, log_fn=log_fn,
        val_fn=val_fn, val_every=args.val_every, init_state=init_state,
        artifacts_dir=args.artifacts_dir,
    )
    print(f"done; checkpoints in {args.ckpt_dir}")


def _make_val_fn(cfg, model, val_objects, n_frames: int = 16):
    """Pose-AP validation over held-out frames (the reference's
    validation_epoch_end: matcher forward -> RANSAC PnP -> aggregate APs,
    OnePosePlus_lightning_model.py:112-160)."""
    import jax
    import jax.numpy as jnp

    from ..core import metrics as metrics_mod, so3
    from ..solvers import ransac_pnp

    # pre-select a fixed, reproducible validation set across objects
    rng = np.random.default_rng(0)
    picks = []  # (cloud tuple, frame image, pose, K)
    L = cfg.matcher.n_points
    for m, frames, poses, Ks in val_objects:
        cloud = m.padded(L, rng)
        for f in rng.choice(
            len(frames), min(len(frames), max(1, n_frames // len(val_objects))),
            replace=False,
        ):
            picks.append((cloud, frames[f], poses[f], Ks[f]))
    apply = jax.jit(
        lambda v, im, k_, dc_, df_, m_: model.apply(v, im, k_, dc_, df_, m_)
    )

    def val_fn(state):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        r_errs, t_errs = [], []
        for (k, dc, df, _, mask), img, pose_gt, K in picks:
            out = apply(
                variables, jnp.asarray(img[None, ..., None]),
                jnp.asarray(k)[None], jnp.asarray(dc)[None],
                jnp.asarray(df)[None], jnp.asarray(mask)[None],
            )
            res = ransac_pnp(
                jax.random.key(0),
                out["mkpts3d"][0], out["mkpts_query_f"][0],
                jnp.asarray(K), out["matches"].valid[0], cfg.pnp,
            )
            R_pred, t_pred = so3.pose6_to_Rt(res.pose6)
            T_pred = np.eye(4)
            T_pred[:3, :3] = np.asarray(R_pred)
            T_pred[:3, 3] = np.asarray(t_pred)
            T_gt = np.eye(4)
            T_gt[:3, :3] = np.asarray(so3.exp(jnp.asarray(pose_gt[:3])))
            T_gt[:3, 3] = pose_gt[3:]
            r, t = metrics_mod.query_pose_error(T_pred, T_gt)
            r_errs.append(r)
            t_errs.append(t)
        return metrics_mod.aggregate_metrics(
            np.asarray(r_errs), np.asarray(t_errs)
        )

    return val_fn


if __name__ == "__main__":
    main()
