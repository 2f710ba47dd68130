"""Batch evaluation CLI: pose metrics over many objects/sequences.

Framework analogue of reference src/inference/inference_OnePosePlus.py
(the Ray-fanned eval harness driving `compute_query_pose_errors` +
`aggregate_metrics` over every test sequence): iterate the object index,
run the pose pipeline on each val sequence, print a per-object metric table
and the aggregate.

Usage:
  python -m onepose_st_tpu.cli.evaluate --data_index index.json \
      --matcher_ckpt ckpts/matcher [--refine]
"""
from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_index", required=True)
    ap.add_argument("--matcher_ckpt", default=None)
    ap.add_argument("--loftr_ckpt", default=None,
                    help="orbax checkpoint dir for the 2D-2D detector matcher")
    ap.add_argument("--refine", action="store_true")
    ap.add_argument("--split", default="val", choices=["val", "train"])
    args = ap.parse_args()

    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from .. import config as cfg_lib
    from ..core import so3
    from ..data import annotations as anno, parse_arkit
    from ..infer.detector import DetectorDB, ObjectDetector
    from ..infer.evaluate import evaluate_poses
    from ..infer.pipeline import PoseEstimator
    from ..models import LoFTRMatcher, OnePoseMatcher
    from ..parallel import partition
    from ..sfm.map import SfMMap
    from ..train.loop import load_checkpoint

    cfg = cfg_lib.adapt_dtypes(cfg_lib.EngineConfig())
    entries = anno.load_index(args.data_index)
    # multi-host: each process evaluates its shard of the object list
    entries = partition.host_shard(entries)

    matcher = OnePoseMatcher(cfg.matcher)
    loftr = LoFTRMatcher(cfg.loftr)
    variables = load_checkpoint(args.matcher_ckpt) if args.matcher_ckpt else None
    loftr_trained = (
        load_checkpoint(args.loftr_ckpt) if args.loftr_ckpt else None
    )
    # init caches keyed by image shape: sequences usually share crop sizes,
    # so both models initialize (and compile) once for the whole run
    matcher_init = jax.jit(matcher.init)
    loftr_init = jax.jit(loftr.init)
    init_cache: dict[tuple, tuple] = {}

    def get_variables(image_hw):
        if image_hw not in init_cache:
            L = cfg.matcher.n_points
            zi = jnp.zeros((1, *image_hw, 1))
            m_vars = variables if variables is not None else matcher_init(
                jax.random.key(0), zi, jnp.zeros((1, L, 3)),
                jnp.zeros((1, L, cfg.matcher.coarse.d_model)),
                jnp.zeros((1, L, cfg.matcher.fine.d_model)),
            )
            l_vars = (
                loftr_trained
                if loftr_trained is not None
                else loftr_init(jax.random.key(1), zi, zi)
            )
            init_cache[image_hw] = (m_vars, l_vars)
        return init_cache[image_hw]

    rows = []
    all_r, all_t = [], []
    for e in entries:
        sfm_map = SfMMap.load(e.map_path)
        seq_dirs = e.val_seq_dirs if args.split == "val" else e.train_seq_dirs
        for seq_dir in seq_dirs:
            seq = parse_arkit.load_sequence(seq_dir)
            vars_obj, loftr_vars = get_variables(tuple(seq.images.shape[1:3]))
            if sfm_map.ref_images is not None:
                db = DetectorDB(
                    images=sfm_map.ref_images.astype(np.float32) / 255.0,
                    boxes=sfm_map.ref_boxes,
                )
            else:
                db = DetectorDB(
                    images=seq.images[:8],
                    boxes=np.tile(
                        np.asarray(
                            [0, 0, seq.images.shape[2], seq.images.shape[1]],
                            np.float32,
                        ),
                        (min(8, len(seq.images)), 1),
                    ),
                )
            detector = ObjectDetector(loftr, loftr_vars, db)
            estimator = PoseEstimator(cfg, matcher, vars_obj, sfm_map, detector)

            results = [
                estimator.estimate(seq.images[f], seq.Ks[f], frame_idx=f)
                for f in range(len(seq.images))
            ]
            final_T = [r.T44 for r in results]
            if args.refine:
                from ..infer.tracker import TemporalTracker, refine_sequence

                tracker = TemporalTracker(matcher, vars_obj)
                refined = refine_sequence(cfg, tracker, seq.images, results, seq.Ks)
                final_T = [r.T44 for r in refined]

            gt_T = []
            for f in range(len(seq.images)):
                T = np.eye(4)
                T[:3, :3] = np.asarray(so3.exp(jnp.asarray(seq.poses[f, :3])))
                T[:3, 3] = seq.poses[f, 3:]
                gt_T.append(T)
            rep = evaluate_poses(
                np.stack(final_T), np.stack(gt_T),
                model_points=sfm_map.keypoints3d, K=seq.Ks,
                success=np.asarray([r.success for r in results]),
            )
            rows.append((e.name, seq_dir, rep))
            all_r.append(rep.r_errs)
            all_t.append(rep.t_errs)
            print(f"{e.name} {seq_dir}: {rep.row()}")

    if rows:
        from ..core import metrics as metrics_mod

        r = np.concatenate(all_r)
        t = np.concatenate(all_t)
        agg = metrics_mod.aggregate_metrics(r, t)
        print(f"\nAGGREGATE over {len(rows)} sequences / {len(r)} frames:")
        print(agg)


if __name__ == "__main__":
    main()
