"""Inference CLI: pose estimation on a test sequence + optional temporal
refinement and demo video.

Framework analogue of reference `inference.py --obj_name ... --test_dirs ...`.

Usage:
  python -m onepose_st_tpu.cli.run_inference --data_dir data/obj/test-seq \
      --map map.npz --matcher_ckpt ckpts/matcher \
      [--refine] [--video out.mp4] [--eval]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", required=True, help="parsed test sequence dir")
    ap.add_argument("--map", required=True)
    ap.add_argument("--matcher_ckpt", default=None)
    ap.add_argument("--loftr_ckpt", default=None,
                    help="orbax checkpoint dir for the 2D-2D detector matcher")
    ap.add_argument("--refine", action="store_true",
                    help="temporal tracking second pass")
    ap.add_argument("--tracker_ckpt", default=None,
                    help="learned-tracker weights (examples/train_tracker.py "
                         "msgpack); without it --refine uses the correlation "
                         "tracker")
    ap.add_argument("--video", default=None)
    ap.add_argument("--eval", action="store_true",
                    help="report pose APs vs the sequence's GT poses")
    ap.add_argument("--pose_cache", default=None,
                    help="npz cache of per-frame estimation results "
                         "(reference pose_estimation_cache.pkl); reused when "
                         "present so --refine can rerun alone")
    ap.add_argument("--calib_ckpt", default=None,
                    help="CalibNet checkpoint: infer K from the frames when "
                         "the sequence has no intrinsics (reference "
                         "inference.py:121-123 infer_K path)")
    args = ap.parse_args()

    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from .. import config as cfg_lib
    from ..core import so3
    from ..data import parse_arkit
    from ..infer.detector import DetectorDB, ObjectDetector
    from ..infer.evaluate import evaluate_poses
    from ..infer.pipeline import PoseEstimator
    from ..infer.tracker import TemporalTracker, refine_sequence
    from ..models import LoFTRMatcher, OnePoseMatcher
    from ..sfm.map import SfMMap
    from ..train.loop import load_checkpoint
    from ..utils import viz

    cfg = cfg_lib.adapt_dtypes(cfg_lib.EngineConfig())
    # rebuild each model exactly as its checkpoint was trained
    # (model_config.json written by the train CLIs next to the ckpt)
    if args.matcher_ckpt:
        saved = cfg_lib.load_model_config(args.matcher_ckpt)
        if saved is not None:
            m = saved.matcher if isinstance(saved, cfg_lib.EngineConfig) else saved
            cfg = cfg_lib.replace(cfg, matcher=cfg_lib.adapt_dtypes(m))
    if args.loftr_ckpt:
        saved = cfg_lib.load_model_config(args.loftr_ckpt)
        if saved is not None:
            if not isinstance(saved, cfg_lib.LoFTRConfig):
                raise SystemExit(
                    f"{args.loftr_ckpt}/model_config.json holds a "
                    f"{type(saved).__name__}, not a LoFTRConfig — is "
                    f"--loftr_ckpt pointing at a 2D-3D matcher checkpoint?"
                )
            cfg = cfg_lib.replace(cfg, loftr=cfg_lib.adapt_dtypes(saved))
    if args.tracker_ckpt:
        saved = cfg_lib.load_model_config(Path(args.tracker_ckpt).parent
                                          if Path(args.tracker_ckpt).is_file()
                                          else args.tracker_ckpt)
        if saved is not None:
            if not isinstance(saved, cfg_lib.TrackerConfig):
                raise SystemExit(
                    f"model_config.json next to {args.tracker_ckpt} holds a "
                    f"{type(saved).__name__}, not a TrackerConfig"
                )
            cfg = cfg_lib.replace(cfg, tracker=cfg_lib.adapt_dtypes(saved))
    sfm_map = SfMMap.load(args.map)
    # layout auto-detect: ARKit test sequences carry poses/ + intrin/ (crop
    # K); LINEMOD sequences only poses_ba/ + intrin_ba/ (also the crop K)
    if (Path(args.data_dir) / "poses").is_dir():
        pose_dir, intrin_dir = "poses", "intrin"
    else:
        pose_dir, intrin_dir = "poses_ba", "intrin_ba"
    seq = parse_arkit.load_sequence(
        args.data_dir, pose_dir=pose_dir, intrin_dir=intrin_dir
    )

    if args.calib_ckpt:
        from ..calib import CalibNet, infer_K
        from ..calib.model import CalibConfig

        calib_model = CalibNet(CalibConfig())
        calib_vars = load_checkpoint(args.calib_ckpt)
        full_dir = Path(args.data_dir) / "color_full"
        K_full = infer_K(calib_model, calib_vars, full_dir)
        print(f"inferred K (full frame):\n{K_full}")
        # M maps crop->full; K_crop = inv(M) @ K_full
        Ks = np.stack([
            np.linalg.inv(seq.M_crop2full[f]) @ K_full
            for f in range(len(seq.images))
        ]).astype(np.float32)
        import dataclasses as _dc

        seq = _dc.replace(seq, Ks=Ks)

    matcher = OnePoseMatcher(cfg.matcher)
    L = cfg.matcher.n_points
    if args.matcher_ckpt:
        variables = load_checkpoint(args.matcher_ckpt)
    else:
        print("WARNING: untrained matcher (no --matcher_ckpt)")
        variables = jax.jit(matcher.init)(
            jax.random.key(0), jnp.asarray(seq.images[:1, ..., None]),
            jnp.zeros((1, L, 3)),
            jnp.zeros((1, L, cfg.matcher.coarse.d_model)),
            jnp.zeros((1, L, cfg.matcher.fine.d_model)),
        )

    loftr = LoFTRMatcher(cfg.loftr)
    if args.loftr_ckpt:
        loftr_vars = load_checkpoint(args.loftr_ckpt)
    else:
        print("WARNING: untrained LoFTR detector weights (no --loftr_ckpt)")
        loftr_vars = jax.jit(loftr.init)(
            jax.random.key(1), jnp.asarray(seq.images[:1, ..., None]),
            jnp.asarray(seq.images[:1, ..., None]),
        )
    if sfm_map.ref_images is not None:
        # detector DB stored with the map by run_sfm (make_reference_db)
        db = DetectorDB(
            images=sfm_map.ref_images.astype(np.float32) / 255.0,
            boxes=sfm_map.ref_boxes,
        )
    else:
        print("WARNING: map has no detector views; using test frames as DB")
        db = DetectorDB(
            images=seq.images[:8],
            boxes=np.tile(
                np.asarray([0, 0, seq.images.shape[2], seq.images.shape[1]], np.float32),
                (min(8, len(seq.images)), 1),
            ),
        )
    detector = ObjectDetector(loftr, loftr_vars, db)
    estimator = PoseEstimator(cfg, matcher, variables, sfm_map, detector)

    from ..infer import pipeline as infer_pipeline

    if args.pose_cache and Path(args.pose_cache).exists():
        results = infer_pipeline.load_results(args.pose_cache)
        print(f"loaded {len(results)} cached frame results")
    else:
        results = []
        for f in range(len(seq.images)):
            r = estimator.estimate(seq.images[f], seq.Ks[f], frame_idx=f)
            results.append(r)
            print(
                f"frame {seq.frame_ids[f]}: inliers {r.n_inliers} "
                f"{'tracked' if r.tracked else 'detected'} "
                f"{'ok' if r.success else 'LOST'}"
            )
        if args.pose_cache:
            infer_pipeline.save_results(args.pose_cache, results)

    final_T = [r.T44 for r in results]
    if args.refine:
        if args.tracker_ckpt:
            from ..infer.tracker import LearnedTemporalTracker

            tracker = LearnedTemporalTracker.load(cfg.tracker, args.tracker_ckpt)
            window = cfg.tracker.window
        else:
            tracker = TemporalTracker(matcher, variables)
            window = 6
        refined = refine_sequence(
            cfg, tracker, seq.images, results, seq.Ks, window=window
        )
        final_T = [r.T44 for r in refined]

    if args.eval:
        gt_T = []
        for f in range(len(seq.images)):
            R = np.asarray(so3.exp(jnp.asarray(seq.poses[f, :3])))
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = seq.poses[f, 3:]
            gt_T.append(T)
        rep = evaluate_poses(
            np.stack(final_T), np.stack(gt_T),
            model_points=sfm_map.keypoints3d,
            K=seq.Ks,
            success=np.asarray([r.success for r in results]),
        )
        print(rep.row())

    if args.video and sfm_map.box_corners is not None:
        frames_out = [
            viz.save_demo_image(
                seq.images[f], sfm_map.box_corners, final_T[f], seq.Ks[f]
            )
            for f in range(len(seq.images))
        ]
        viz.make_video(frames_out, args.video)
        print(f"video -> {args.video}")


if __name__ == "__main__":
    main()
