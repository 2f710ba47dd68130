"""Full-frame in-the-wild inference loop (reference inference.py:136-224).

The r1 e2e ran pre-cropped only; this drives the WHOLE state machine on
full frames with an off-center, wandering object over background clutter:

  detect (LoFTR vs DB views + affine RANSAC) -> crop + K rewrite
  -> 2D-3D match -> RANSAC PnP -> next frame tracked via previous-pose box
  -> lost track (forced corrupted frames) -> re-detect -> recover.

Map building + matcher training happen on GT-box crops of the training
frames (the reference's parse step crops scans the same way,
parse_scanned_data.py:98-163). Reports held-out pose APs + ATE + redetect
stats, and verifies lost-track recovery.

  python examples/full_frame_e2e.py --preset full --steps 6000 \
      --loftr_ckpt ckpts/loftr_full_r2 [--refine learned --tracker_ckpt ...]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from synthetic_e2e import build_cfg  # shared presets


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="small", choices=["tiny", "small", "full"])
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--points", type=int, default=400)
    ap.add_argument("--bg_points", type=int, default=700)
    ap.add_argument("--full_image", type=int, default=512)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--db_views", type=int, default=8)
    ap.add_argument("--corrupt", type=int, default=2,
                    help="corrupt N eval frames (noise) to force lost "
                         "tracks and exercise re-detection")
    ap.add_argument("--loftr_ckpt", default=None,
                    help="trained 2D-2D matcher (detector + optionally the "
                         "SfM front-end); without it the detector uses "
                         "random weights and will fail cold starts")
    ap.add_argument("--loftr_matches_for_map", action="store_true",
                    help="build the map from LoFTR matches over covis pairs "
                         "instead of GT correspondences")
    ap.add_argument("--eval_conf_thr", type=float, default=None)
    ap.add_argument("--wander", type=float, default=0.12)
    ap.add_argument("--ground_grid", action="store_true",
                    help="render a gravity-aligned ground grid background "
                         "(the calibration net's physical cues)")
    ap.add_argument("--calib_ckpt", default=None,
                    help="CalibNet checkpoint (examples/train_calib.py): "
                         "additionally run inference with the INFERRED K "
                         "(reference inference.py:121-123 infer_K) and "
                         "report the AP delta vs ground-truth K")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.core import camera
    from onepose_st_tpu.data import images as img_ops, synthetic
    from onepose_st_tpu.infer.detector import DetectorDB, ObjectDetector
    from onepose_st_tpu.infer.evaluate import evaluate_poses
    from onepose_st_tpu.infer.pipeline import PoseEstimator
    from onepose_st_tpu.models import LoFTRMatcher, OnePoseMatcher
    from onepose_st_tpu.sfm import pipeline as sfm_pipeline, tracks as tracks_mod
    from onepose_st_tpu.train import data as data_mod, loop as loop_mod
    from onepose_st_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}")
    cfg = build_cfg(args.preset)
    rng = np.random.default_rng(args.seed)
    from scipy.spatial.transform import Rotation

    # --- full-frame scene ---------------------------------------------------
    t0 = time.time()
    wild = synthetic.make_wild_scene(
        rng, n_points=args.points, n_bg=args.bg_points,
        n_frames=args.frames, image_hw=(args.full_image, args.full_image),
        object_size=0.2, wander=args.wander,
    )
    scene = wild.scene
    frames_full = synthetic.render_wild_sequence(
        wild, rng, sigma_px=2.0, ground_grid=args.ground_grid,
    )
    eval_ids = np.arange(2, args.frames, 5)
    train_ids = np.setdiff1d(np.arange(args.frames), eval_ids)
    print(f"rendered {args.frames} full frames "
          f"({args.full_image}px) in {time.time()-t0:.1f}s")

    # --- GT-box crops of training frames (the parse step's role) -----------
    ext = np.array([0.22, 0.22, 0.22], np.float32)
    corners = np.asarray(camera.box3d_corners(jnp.asarray(ext)))
    crop_hw = (args.crop, args.crop)
    crops = np.zeros((args.frames, args.crop, args.crop), np.float32)
    K_crops = np.zeros((args.frames, 3, 3), np.float32)
    A3s = np.zeros((args.frames, 3, 3), np.float32)
    for f in range(args.frames):
        uv_box, _ = camera.project(
            jnp.asarray(corners), jnp.asarray(scene.poses[f]),
            jnp.asarray(scene.Ks[f]),
        )
        box = camera.square_box(camera.bbox_from_points(uv_box), pad_ratio=0.1)
        crops[f], A3s[f] = img_ops.crop_image(frames_full[f], np.asarray(box), crop_hw)
        K_crops[f] = np.asarray(
            camera.crop_K(jnp.asarray(scene.Ks[f]), box, crop_hw)
        )

    # object-point projections in crop coords
    uv_crop = np.einsum(
        "fij,fpj->fpi", A3s,
        np.concatenate([scene.uv, np.ones_like(scene.uv[..., :1])], axis=-1),
    )[..., :2]
    vis_crop = (
        scene.visible
        & (uv_crop[..., 0] > 0) & (uv_crop[..., 0] < args.crop)
        & (uv_crop[..., 1] > 0) & (uv_crop[..., 1] < args.crop)
    )

    # --- map building on crops ---------------------------------------------
    model = OnePoseMatcher(cfg.matcher)
    L = cfg.matcher.n_points
    Cc = cfg.matcher.coarse.d_model
    Cf = cfg.matcher.fine.d_model
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.asarray(crops[:1, ..., None]),
        jnp.zeros((1, L, 3)), jnp.zeros((1, L, Cc)), jnp.zeros((1, L, Cf)),
    )
    sample_desc = sfm_pipeline.make_descriptor_sampler(model, variables, crops)

    loftr = None
    lvars = None
    if args.loftr_ckpt:
        from onepose_st_tpu.train.loop import load_checkpoint

        lcfg = cfg_lib.load_model_config(args.loftr_ckpt)
        assert isinstance(lcfg, cfg_lib.LoFTRConfig), args.loftr_ckpt
        lcfg = cfg_lib.adapt_dtypes(lcfg)
        loftr = LoFTRMatcher(lcfg)
        lvars = load_checkpoint(args.loftr_ckpt)
        print(f"LoFTR config source: {args.loftr_ckpt}/model_config.json")

    if args.loftr_matches_for_map:
        assert loftr is not None, "--loftr_matches_for_map needs --loftr_ckpt"
        from onepose_st_tpu.sfm import pairs as pairs_mod

        Rs, ts = pairs_mod.poses_to_Rt(scene.poses[train_ids])
        local_pairs = pairs_mod.pairs_from_poses(
            Rs, ts, covis_num=10, min_rotation_deg=10.0
        )
        t0 = time.time()
        pms = sfm_pipeline.match_pairs_loftr(
            loftr, lvars, crops, train_ids[local_pairs].astype(np.int32),
            batch_size=args.batch,
        )
        print(f"LoFTR-matched {len(local_pairs)} covis pairs in "
              f"{time.time()-t0:.1f}s")
    else:
        pms = []
        for a in range(len(train_ids)):
            for b in range(a + 1, len(train_ids)):
                i, j = int(train_ids[a]), int(train_ids[b])
                vis = vis_crop[i] & vis_crop[j]
                ids = np.nonzero(vis)[0]
                if len(ids) < 8:
                    continue
                noise = rng.normal(size=(len(ids), 2)).astype(np.float32) * 0.3
                pms.append(tracks_mod.PairMatches(
                    i, j, uv_crop[i, ids].astype(np.float32),
                    uv_crop[j, ids].astype(np.float32) + noise,
                    np.ones(len(ids), np.float32),
                ))
    sfm_map, diag = sfm_pipeline.build_map_from_matches(
        pms, scene.poses, K_crops, cfg, box_corners=corners,
        sample_descriptors=sample_desc, desc_dims=(Cc, Cf),
    )
    print(f"map: {len(sfm_map.keypoints3d)} pts (tracks {diag.n_tracks}, "
          f"BA {diag.ba_initial_cost:.2f} -> {diag.ba_final_cost:.2f})")

    # --- train the 2D-3D matcher on crops ----------------------------------
    batches = data_mod.map_training_batches(
        sfm_map, crops, scene.poses, K_crops, cfg, rng,
        batch_size=args.batch, frame_ids=train_ids,
        homography_prob=0.15, photometric="dark",
    )
    t0 = time.time()
    state, _ = loop_mod.fit(
        cfg, model, batches, n_steps=args.steps, log_every=500,
        log_fn=lambda s, r: print(
            f"  step {s}: loss {r['loss']:.4f} ({r['steps_per_sec']:.2f} it/s)"
        ),
    )
    print(f"trained {args.steps} steps in {time.time()-t0:.1f}s")
    trained = {"params": state.params, "batch_stats": state.batch_stats}

    # --- full-frame inference with the detector state machine --------------
    eval_cfg = cfg
    if args.eval_conf_thr is not None:
        eval_cfg = cfg_lib.replace(cfg, matcher=cfg_lib.replace(
            cfg.matcher, coarse_matching=cfg_lib.replace(
                cfg.matcher.coarse_matching, threshold=args.eval_conf_thr)))
    eval_model = OnePoseMatcher(eval_cfg.matcher)

    if loftr is None:
        print("WARNING: no --loftr_ckpt; random detector weights")
        loftr = LoFTRMatcher(cfg_lib.adapt_dtypes(cfg_lib.LoFTRConfig()))
        lvars = jax.jit(loftr.init)(
            jax.random.key(1), jnp.asarray(frames_full[:1, ..., None]),
            jnp.asarray(frames_full[:1, ..., None]),
        )
    db_ids = train_ids[:: max(1, len(train_ids) // args.db_views)][: args.db_views]
    db_boxes = []
    for f in db_ids:
        uv_box, _ = camera.project(
            jnp.asarray(corners), jnp.asarray(scene.poses[f]),
            jnp.asarray(scene.Ks[f]),
        )
        db_boxes.append(np.asarray(camera.bbox_from_points(uv_box)))
    db = DetectorDB(
        images=frames_full[db_ids], boxes=np.stack(db_boxes).astype(np.float32)
    )
    detector = ObjectDetector(loftr, lvars, db, crop_hw=crop_hw)
    sfm_map_box = sfm_map if sfm_map.box_corners is not None else None
    estimator = PoseEstimator(eval_cfg, eval_model, trained, sfm_map, detector)

    # corrupt a couple of eval frames to force lost tracks
    corrupt_ids = set()
    if args.corrupt > 0:
        step = max(1, len(eval_ids) // (args.corrupt + 1))
        corrupt_ids = {int(eval_ids[(k + 1) * step]) for k in range(args.corrupt)}
    frames_eval = frames_full.copy()
    for f in corrupt_ids:
        frames_eval[f] = rng.uniform(0, 1, frames_eval[f].shape)
    print(f"corrupted frames (forced track loss): {sorted(corrupt_ids)}")

    n_detect = n_track = n_redetect = 0
    results = []
    was_lost = True
    t0 = time.time()
    for f in range(args.frames):
        r = estimator.estimate(frames_eval[f], scene.Ks[f], frame_idx=f)
        results.append(r)
        if r.tracked:
            n_track += 1
        else:
            n_detect += 1
            if not was_lost and f > 0:
                n_redetect += 1
        state_s = "TRACK" if r.tracked else "DETECT"
        if f in corrupt_ids or not r.success or f % 16 == 0:
            print(f"  frame {f:3d}: {state_s} inliers {r.n_inliers:4d} "
                  f"{'ok' if r.success else 'LOST'}"
                  f"{' [corrupted]' if f in corrupt_ids else ''}")
        was_lost = not r.success
    dt = time.time() - t0
    print(f"inference: {args.frames} frames in {dt:.1f}s "
          f"({args.frames/dt:.1f} fps closed-loop)")
    print(f"stats: {n_track} tracked, {n_detect} detector calls, "
          f"{n_redetect} re-detections after loss")

    # recovery check: every corrupted frame's successor must succeed again
    recovered = all(
        results[min(f + 1, args.frames - 1)].success for f in corrupt_ids
    )
    print(f"lost-track recovery: {'OK' if recovered else 'FAILED'}")

    # --- held-out eval (corrupted frames excluded: no pose is recoverable) -
    eval_clean = [int(f) for f in eval_ids if int(f) not in corrupt_ids]
    gt_T = []
    for f in eval_clean:
        G = np.eye(4)
        G[:3, :3] = Rotation.from_rotvec(scene.poses[f, :3]).as_matrix()
        G[:3, 3] = scene.poses[f, 3:]
        gt_T.append(G)
    pred_T = np.stack([results[f].T44 for f in eval_clean])
    succ = np.asarray([results[f].success for f in eval_clean])
    rep = evaluate_poses(
        pred_T, np.stack(gt_T), model_points=sfm_map.keypoints3d,
        K=scene.Ks[0], success=succ,
    )
    print("held-out full-frame pose metrics:", rep.row())

    # --- optional: repeat inference with the calibration net's inferred K --
    if args.calib_ckpt:
        from onepose_st_tpu.calib.calibrate import infer_K
        from onepose_st_tpu.calib.model import CalibNet
        from onepose_st_tpu.train.loop import load_checkpoint

        ccfg = cfg_lib.load_model_config(args.calib_ckpt)
        calib_model = CalibNet(ccfg)
        calib_vars = load_checkpoint(args.calib_ckpt)
        sample_ids = eval_clean[:: max(1, len(eval_clean) // 12)]
        rgb = (np.repeat(frames_eval[f][..., None], 3, axis=-1)
               for f in sample_ids)
        K_inf = infer_K(calib_model, calib_vars, rgb)
        f_gt = scene.Ks[0][0, 0]
        print(f"inferred K: f={K_inf[0, 0]:.1f}/{K_inf[1, 1]:.1f} px "
              f"(GT {f_gt:.1f}; err "
              f"{100 * abs(K_inf[1, 1] - f_gt) / f_gt:.1f}%)")
        estimator.reset()
        results_inf = []
        for f in range(args.frames):
            results_inf.append(estimator.estimate(
                frames_eval[f], K_inf.astype(np.float32), frame_idx=f
            ))
        pred_T_inf = np.stack([results_inf[f].T44 for f in eval_clean])
        succ_inf = np.asarray([results_inf[f].success for f in eval_clean])
        rep_inf = evaluate_poses(
            pred_T_inf, np.stack(gt_T), model_points=sfm_map.keypoints3d,
            K=scene.Ks[0], success=succ_inf,
        )
        print("held-out metrics with INFERRED K:", rep_inf.row())
        print(f"AP delta (3cm@3deg): GT-K {rep.aps['3cm@3degree']:.3f} -> "
              f"inferred-K {rep_inf.aps['3cm@3degree']:.3f}")


if __name__ == "__main__":
    main()
