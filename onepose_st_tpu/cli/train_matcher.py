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
    args = ap.parse_args()

    import jax

    from .. import config as cfg_lib
    from ..data import parse_arkit
    from ..models import OnePoseMatcher
    from ..parallel import make_mesh
    from ..sfm.map import SfMMap
    from ..train import data as data_mod, loop as loop_mod

    cfg = cfg_lib.adapt_dtypes(cfg_lib.EngineConfig())
    mesh = make_mesh()
    n_dev = len(jax.devices())
    rng = np.random.default_rng(args.seed)
    model = OnePoseMatcher(cfg.matcher)

    if args.data_index:
        from ..data import annotations as anno

        objects = anno.load_training_objects(anno.load_index(args.data_index))
        n_frames = sum(len(o[1]) for o in objects)
        print(f"{len(objects)} objects, {n_frames} training frames")
        batches = data_mod.multi_object_batches(
            objects, cfg, rng, batch_size=args.batch * n_dev,
            homography_prob=0.2, photometric="dark",
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
    state, history = loop_mod.fit(
        cfg, model, batches, n_steps=args.steps, mesh=mesh,
        ckpt_dir=args.ckpt_dir, log_every=100,
        log_fn=lambda s, r: print(
            f"step {s}: loss {r['loss']:.4f} "
            f"(coarse {r['loss_coarse']:.4f} fine {r['loss_fine']:.4f}) "
            f"{r['steps_per_sec']:.2f} it/s"
        ),
    )
    print(f"done; checkpoints in {args.ckpt_dir}")


if __name__ == "__main__":
    main()
