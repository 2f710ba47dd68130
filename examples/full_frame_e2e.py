"""Full-frame in-the-wild inference loop (reference inference.py:136-224).

Two-phase protocol, matching the reference's data flow (demo.sh:8-24): the
SfM map and the 2D-3D matcher come from an object-centred, rotation-rich
*scan* phase (the reference's `*-annotate` orbit sequences, captured as
several rings at different elevations), and the wandering in-the-wild
sequence is PURE inference — every wild frame is a novel view:

  detect (LoFTR vs DB scan views + affine RANSAC) -> crop + K rewrite
  -> 2D-3D match -> RANSAC PnP -> next frame tracked via previous-pose box
  -> lost track (forced corrupted frames) -> re-detect -> recover.

Scan-phase SfM matches are masked to the projected 3D-box rectangle
(sfm_pipeline.mask_matches_to_boxes) — the explicit equivalent of the
reference only ever feeding object-centred 512^2 parse crops to SfM
(parse_scanned_data.py:98-163) — so background texture (the ground grid)
cannot soak up track capacity. Reports wild-sequence pose APs + ATE +
redetect stats, and verifies lost-track recovery.

  python examples/full_frame_e2e.py --preset full --steps 6000 \
      --loftr_ckpt ckpts/loftr_full_r2 --loftr_matches_for_map --ground_grid
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
    ap.add_argument("--frames", type=int, default=80,
                    help="wild (test) sequence length")
    ap.add_argument("--scan_frames", type=int, default=96,
                    help="scan (annotate) phase length, split across "
                         "elevation rings")
    ap.add_argument("--scan_rings", type=float, nargs="+",
                    default=[0.08, -0.05, -0.18, -0.31],
                    help="scan orbit-ring elevations (the reference captures "
                         "~5 annotate sequences at different heights; rings "
                         "bracketing the wild sequence's elevation band keep "
                         "novel-view deltas small)")
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
    ap.add_argument("--strict_map", action="store_true",
                    help="tight SfM gates (epipolar 1.5 px, reproj 2 px, "
                         "huber 1 px); see synthetic_e2e --strict_map")
    ap.add_argument("--no_box_mask", action="store_true",
                    help="ablation: skip masking SfM matches to the "
                         "projected object box")
    ap.add_argument("--eval_conf_thr", type=float, default=None)
    ap.add_argument("--pnp_recenter", type=int, default=0,
                    help="inference-time fine re-centering rounds "
                         "(PnPConfig.recenter_iters)")
    ap.add_argument("--pnp_tight", type=float, default=0.0,
                    help="tight second GN stage threshold px "
                         "(PnPConfig.tight_refine_px)")
    ap.add_argument("--pipelined", action="store_true",
                    help="use the one-frame-lag pipelined sequence driver "
                         "(PoseEstimator.run_sequence): host prep + "
                         "dispatch of frame t+1 overlap device exec of t")
    ap.add_argument("--wander", type=float, default=0.12)
    ap.add_argument("--wild_radius", type=float, default=None,
                    help="wild-sequence camera orbit radius (default: the "
                         "scan's 0.6). The default wild scenario is a "
                         "truncation STRESS test: the object fills ~85% of "
                         "the frame and the wander regularly pushes it past "
                         "the frame edge. A larger radius (e.g. 0.85) gives "
                         "the reference-like regime (Spot videos keep the "
                         "object inside the frame at moderate scale)")
    ap.add_argument("--ground_grid", action="store_true",
                    help="render a gravity-aligned ground grid background "
                         "(the calibration net's physical cues)")
    ap.add_argument("--calib_ckpt", default=None,
                    help="CalibNet checkpoint (examples/train_calib.py): "
                         "additionally run inference with the INFERRED K "
                         "(reference inference.py:121-123 infer_K) and "
                         "report the AP delta vs ground-truth K")
    ap.add_argument("--refine_focal", action="store_true",
                    help="with --calib_ckpt: self-calibrate the focal from "
                         "the object's 2D-3D matches (joint pose+focal GN, "
                         "PoseEstimator.self_calibrate) before the "
                         "inferred-K pass")
    ap.add_argument("--calib_method", default="joint",
                    choices=["joint", "median"],
                    help="self-calibration estimator: 'joint' = one shared "
                         "log-focal across sampled frames (breaks the "
                         "per-frame f/tz degeneracy); 'median' = the r4 "
                         "per-frame inlier-weighted median")
    ap.add_argument("--calib_stride", type=int, default=8,
                    help="self-calibration frame sampling stride (smaller "
                         "= more frames in the joint bundle)")
    ap.add_argument("--calib_rounds", type=int, default=1,
                    help="self-calibration outer rounds (re-detect + "
                         "re-estimate with the refined K between rounds)")
    ap.add_argument("--refine", default=None, choices=[None, "correlation"],
                    help="temporal second pass over the wild sequence")
    ap.add_argument("--save_run", default=None,
                    help="directory to save map + trained matcher for "
                         "--reuse_run iteration on the inference phase")
    ap.add_argument("--reuse_run", default=None,
                    help="skip map building + training; load artifacts "
                         "saved by --save_run (scenes are regenerated "
                         "deterministically from --seed)")
    ap.add_argument("--reuse_map", default=None,
                    help="load ONLY the map from a saved run dir and "
                         "retrain the matcher (training-recipe iteration "
                         "without re-running LoFTR matching + SfM)")
    ap.add_argument("--jitter_shift", type=float, default=0.15,
                    help="training-crop framing jitter: max box shift as a "
                         "fraction of box side. Large values (~0.35) push "
                         "crop windows past the frame edge, teaching the "
                         "matcher the truncated-object + black-fill framing "
                         "the wild sequence produces when the object leaves "
                         "the frame")
    ap.add_argument("--jitter_scale", type=float, nargs=2, default=[0.95, 1.4],
                    help="training-crop rescale range")
    ap.add_argument("--n_aug", type=int, default=2,
                    help="jittered crop copies of the scan set")
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
    if args.strict_map:
        cfg = cfg_lib.replace(cfg, sfm=cfg_lib.replace(
            cfg.sfm, epipolar_threshold_px=1.5, max_reproj_error_px=2.0,
            ba_huber_px=1.0,
        ))
    rng = np.random.default_rng(args.seed)
    from scipy.spatial.transform import Rotation

    # --- phase 1 geometry: object-centred scan (annotate) + wild (test) ----
    t0 = time.time()
    scan = synthetic.make_wild_scene(
        rng, n_points=args.points, n_bg=args.bg_points,
        n_frames=args.scan_frames, image_hw=(args.full_image, args.full_image),
        object_size=0.2, wander=0.0,
        elevations=tuple(args.scan_rings), elevation_jitter=0.02, phase=0.33,
    )
    wild = synthetic.make_wild_scene(
        rng, n_frames=args.frames, image_hw=(args.full_image, args.full_image),
        object_size=0.2, wander=args.wander,
        points=scan.scene.points, bg_points=scan.bg_points,
        **({"radius": args.wild_radius} if args.wild_radius else {}),
    )
    scene = scan.scene          # scan geometry (map building + training)
    wscene = wild.scene         # wild geometry (inference only)
    # shared per-point appearance: scan and wild render the same world
    amps = rng.uniform(
        0.3, 1.0, size=args.points + len(scan.bg_points)
    ).astype(np.float32)
    scan_full = synthetic.render_wild_sequence(
        scan, rng, sigma_px=2.0, ground_grid=args.ground_grid, amps=amps,
    )
    frames_full = synthetic.render_wild_sequence(
        wild, rng, sigma_px=2.0, ground_grid=args.ground_grid, amps=amps,
    )
    print(f"rendered scan {args.scan_frames} + wild {args.frames} full "
          f"frames ({args.full_image}px) in {time.time()-t0:.1f}s")

    # --- GT-box crops of SCAN frames (the parse step's role) ---------------
    ext = np.array([0.22, 0.22, 0.22], np.float32)
    corners = np.asarray(camera.box3d_corners(jnp.asarray(ext)))
    crop_hw = (args.crop, args.crop)
    n_scan = args.scan_frames
    crops = np.zeros((n_scan, args.crop, args.crop), np.float32)
    K_crops = np.zeros((n_scan, 3, 3), np.float32)
    A3s = np.zeros((n_scan, 3, 3), np.float32)
    boxes_crop = np.zeros((n_scan, 4), np.float32)  # projected 3D box, crop px
    for f in range(n_scan):
        uv_box, _ = camera.project(
            jnp.asarray(corners), jnp.asarray(scene.poses[f]),
            jnp.asarray(scene.Ks[f]),
        )
        box = camera.square_box(camera.bbox_from_points(uv_box), pad_ratio=0.1)
        crops[f], A3s[f] = img_ops.crop_image(scan_full[f], np.asarray(box), crop_hw)
        K_crops[f] = np.asarray(
            camera.crop_K(jnp.asarray(scene.Ks[f]), box, crop_hw)
        )
        # the object's tight projected box, mapped into crop coords
        ub = np.asarray(uv_box)
        ub_crop = (
            A3s[f] @ np.concatenate([ub, np.ones((len(ub), 1))], 1).T
        ).T[:, :2]
        boxes_crop[f] = [ub_crop[:, 0].min(), ub_crop[:, 1].min(),
                         ub_crop[:, 0].max(), ub_crop[:, 1].max()]

    # object-point projections in crop coords (GT-match fallback path)
    uv_crop = np.einsum(
        "fij,fpj->fpi", A3s,
        np.concatenate([scene.uv, np.ones_like(scene.uv[..., :1])], axis=-1),
    )[..., :2]
    vis_crop = (
        scene.visible
        & (uv_crop[..., 0] > 0) & (uv_crop[..., 0] < args.crop)
        & (uv_crop[..., 1] > 0) & (uv_crop[..., 1] < args.crop)
    )

    # --- map building on scan crops ----------------------------------------
    model = OnePoseMatcher(cfg.matcher)
    L = cfg.matcher.n_points
    Cc = cfg.matcher.coarse.d_model
    Cf = cfg.matcher.fine.d_model
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.asarray(crops[:1, ..., None]),
        jnp.zeros((1, L, 3)), jnp.zeros((1, L, Cc)), jnp.zeros((1, L, Cf)),
    )

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

    if args.reuse_run:
        import flax.serialization as ser

        from onepose_st_tpu.sfm.map import SfMMap

        sfm_map = SfMMap.load(str(Path(args.reuse_run) / "map.npz"))
        with open(Path(args.reuse_run) / "matcher.msgpack", "rb") as f:
            trained = ser.from_bytes(
                {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})},
                f.read(),
            )
        print(f"reused map ({len(sfm_map.keypoints3d)} pts) + trained "
              f"matcher from {args.reuse_run}")
    elif args.reuse_map:
        from onepose_st_tpu.sfm.map import SfMMap

        sfm_map = SfMMap.load(str(Path(args.reuse_map) / "map.npz"))
        print(f"reused map ({len(sfm_map.keypoints3d)} pts) from "
              f"{args.reuse_map}; retraining the matcher")
    elif args.loftr_matches_for_map:
        assert loftr is not None, "--loftr_matches_for_map needs --loftr_ckpt"
        from onepose_st_tpu.sfm import pairs as pairs_mod

        Rs, ts = pairs_mod.poses_to_Rt(scene.poses)
        local_pairs = pairs_mod.pairs_from_poses(
            Rs, ts, covis_num=10, min_rotation_deg=10.0,
            seq_ids=scan.seq_ids,
        )
        t0 = time.time()
        pms = sfm_pipeline.match_pairs_loftr(
            loftr, lvars, crops, local_pairs.astype(np.int32),
            batch_size=args.batch,
        )
        print(f"LoFTR-matched {len(local_pairs)} covis pairs in "
              f"{time.time()-t0:.1f}s "
              f"({sum(len(pm.uv_i) for pm in pms)} raw matches)")
    else:
        pms = []
        for i in range(n_scan):
            for j in range(i + 1, n_scan):
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
    if not args.reuse_run and not args.reuse_map:
        if not args.no_box_mask:
            n_before = sum(len(pm.uv_i) for pm in pms)
            pms = sfm_pipeline.mask_matches_to_boxes(
                pms, boxes_crop, margin_px=4.0
            )
            n_after = sum(len(pm.uv_i) for pm in pms)
            print(f"box mask: {n_before} -> {n_after} matches "
                  f"({100.0 * n_after / max(n_before, 1):.0f}% inside object box)")
        sample_desc = sfm_pipeline.make_descriptor_sampler(
            model, variables, crops
        )
        sfm_map, diag = sfm_pipeline.build_map_from_matches(
            pms, scene.poses, K_crops, cfg, box_corners=corners,
            sample_descriptors=sample_desc, desc_dims=(Cc, Cf),
        )
        print(f"map: {len(sfm_map.keypoints3d)} pts (tracks {diag.n_tracks}, "
              f"tri-survival {100.0 * diag.n_triangulated / max(diag.n_tracks, 1):.0f}%, "
              f"reproj {diag.mean_reproj_err_px:.2f}px, "
              f"BA {diag.ba_initial_cost:.2f} -> {diag.ba_final_cost:.2f})")

    if not args.reuse_run:
        # --- train the 2D-3D matcher on scan crops -------------------------
        # training-crop framing jitter: inference crops come from detector
        # boxes (off-center object, box hanging past the frame edge ->
        # black warp fill, object truncated by the frame boundary).
        # Always-centered GT crops overfit to perfect framing — per extra
        # crop, shift the box by up to jitter_shift of its side and rescale
        # before cropping so the matcher trains on the same distribution
        # the detector produces (the reference gets this robustness from
        # its large-scale pretraining; our per-object matcher has to learn
        # it from the scan). Shifts ~0.35 reproduce the wild sequence's
        # truncated-object framing (wild_diag_r3f: bad frames have up to
        # 49% of the box past the frame edge).
        n_aug = args.n_aug
        full_hw = (args.full_image, args.full_image)
        crops_tr = [crops]
        K_tr = [K_crops]
        pose_tr = [scene.poses]
        quads_tr = [np.stack([
            img_ops.valid_quad_from_affine(A3s[f], full_hw)
            for f in range(n_scan)
        ])]
        for a in range(n_aug):
            cj = np.zeros_like(crops)
            kj = np.zeros_like(K_crops)
            qj = np.zeros((n_scan, 4, 2), np.float32)
            for f in range(n_scan):
                uv_box, _ = camera.project(
                    jnp.asarray(corners), jnp.asarray(scene.poses[f]),
                    jnp.asarray(scene.Ks[f]),
                )
                base = camera.square_box(
                    camera.bbox_from_points(uv_box), pad_ratio=0.1
                )
                b = np.asarray(base, np.float64)
                side = b[2] - b[0]
                shift = rng.uniform(
                    -args.jitter_shift, args.jitter_shift, size=2
                ) * side
                scale = rng.uniform(*args.jitter_scale)
                cx, cy = (b[0] + b[2]) / 2 + shift[0], (b[1] + b[3]) / 2 + shift[1]
                half = side * scale / 2
                bj = np.array([cx - half, cy - half, cx + half, cy + half],
                              np.float32)
                cj[f], A3j = img_ops.crop_image(scan_full[f], bj, crop_hw)
                kj[f] = (A3j @ scene.Ks[f]).astype(np.float32)
                qj[f] = img_ops.valid_quad_from_affine(A3j, full_hw)
            crops_tr.append(cj)
            K_tr.append(kj)
            pose_tr.append(scene.poses)
            quads_tr.append(qj)
        crops_all = np.concatenate(crops_tr)
        K_all = np.concatenate(K_tr)
        poses_all = np.concatenate(pose_tr)
        # per-crop valid quads: jittered windows past the frame edge carry
        # black warp-fill — masked out of attention/matching/supervision
        # instead of supervised as (hallucinated) positives
        quads_all = np.concatenate(quads_tr)
        batches = data_mod.map_training_batches(
            sfm_map, crops_all, poses_all, K_all, cfg, rng,
            batch_size=args.batch,
            homography_prob=0.3, photometric="dark",
            valid_quads=quads_all,
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

        if args.save_run:
            import flax.serialization as ser

            out_dir = Path(args.save_run)
            out_dir.mkdir(parents=True, exist_ok=True)
            sfm_map.save(out_dir / "map.npz")
            with open(out_dir / "matcher.msgpack", "wb") as f:
                f.write(ser.to_bytes(trained))
            cfg_lib.save_model_config(out_dir, cfg)
            print(f"saved run artifacts -> {out_dir}")

    # --- wild-sequence inference with the detector state machine -----------
    eval_cfg = cfg
    if args.eval_conf_thr is not None:
        eval_cfg = cfg_lib.replace(cfg, matcher=cfg_lib.replace(
            cfg.matcher, coarse_matching=cfg_lib.replace(
                cfg.matcher.coarse_matching, threshold=args.eval_conf_thr)))
    if args.pnp_recenter or args.pnp_tight:
        eval_cfg = cfg_lib.replace(eval_cfg, pnp=cfg_lib.replace(
            eval_cfg.pnp, recenter_iters=args.pnp_recenter,
            tight_refine_px=args.pnp_tight,
        ))
    eval_model = OnePoseMatcher(eval_cfg.matcher)

    if loftr is None:
        print("WARNING: no --loftr_ckpt; random detector weights")
        loftr = LoFTRMatcher(cfg_lib.adapt_dtypes(cfg_lib.LoFTRConfig()))
        lvars = jax.jit(loftr.init)(
            jax.random.key(1), jnp.asarray(scan_full[:1, ..., None]),
            jnp.asarray(scan_full[:1, ..., None]),
        )
    # detector DB: scan views spread across the rings (reference loads ~15
    # reference views from the SfM workspace, local_feature_2D_detector.py:40)
    db_ids = np.arange(n_scan)[:: max(1, n_scan // args.db_views)][: args.db_views]
    db_boxes = []
    for f in db_ids:
        uv_box, _ = camera.project(
            jnp.asarray(corners), jnp.asarray(scene.poses[f]),
            jnp.asarray(scene.Ks[f]),
        )
        db_boxes.append(np.asarray(camera.bbox_from_points(uv_box)))
    db = DetectorDB(
        images=scan_full[db_ids], boxes=np.stack(db_boxes).astype(np.float32)
    )
    detector = ObjectDetector(loftr, lvars, db, crop_hw=crop_hw)
    estimator = PoseEstimator(eval_cfg, eval_model, trained, sfm_map, detector)

    # corrupt a couple of wild frames to force lost tracks
    corrupt_ids = set()
    if args.corrupt > 0:
        step = max(1, args.frames // (args.corrupt + 1))
        corrupt_ids = {(k + 1) * step for k in range(args.corrupt)}
    frames_eval = frames_full.copy()
    for f in corrupt_ids:
        frames_eval[f] = rng.uniform(0, 1, frames_eval[f].shape)
    print(f"corrupted frames (forced track loss): {sorted(corrupt_ids)}")

    n_detect = n_track = n_redetect = 0
    was_lost = True
    t0 = time.time()
    if args.pipelined:
        results = estimator.run_sequence(frames_eval, wscene.Ks)
        assert len(results) == args.frames
    else:
        results = [
            estimator.estimate(frames_eval[f], wscene.Ks[f], frame_idx=f)
            for f in range(args.frames)
        ]
    for f in range(args.frames):
        r = results[f]
        if r.tracked:
            n_track += 1
        else:
            n_detect += 1
            if not was_lost and f > 0:
                n_redetect += 1
        state_s = "TRACK" if r.tracked else "DETECT"
        if f in corrupt_ids or not r.success or f % 16 == 0:
            print(f"  frame {f:3d}: {state_s} matches {r.n_matches:4d} "
                  f"inliers {r.n_inliers:4d} "
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

    # --- wild-sequence eval (ALL wild frames are held out; corrupted
    # frames excluded: no pose is recoverable from noise) -------------------
    eval_clean = [f for f in range(args.frames) if f not in corrupt_ids]
    gt_T = []
    for f in eval_clean:
        G = np.eye(4)
        G[:3, :3] = Rotation.from_rotvec(wscene.poses[f, :3]).as_matrix()
        G[:3, 3] = wscene.poses[f, 3:]
        gt_T.append(G)
    pred_T = np.stack([results[f].T44 for f in eval_clean])
    succ = np.asarray([results[f].success for f in eval_clean])
    rep = evaluate_poses(
        pred_T, np.stack(gt_T), model_points=sfm_map.keypoints3d,
        K=wscene.Ks[0], success=succ,
    )
    print("wild-sequence pose metrics:", rep.row())

    # --- diagnostic: oracle GT-box crops of the wild frames ----------------
    # separates matcher scan->wild generalization from detector/crop issues:
    # if this is healthy but the detector path is not, the crop box is the
    # problem; if both collapse, the matcher does not transfer.
    est_oracle = PoseEstimator(eval_cfg, eval_model, trained, sfm_map, None)
    # training-view sanity: scan crops through the same estimator — if THIS
    # is unhealthy the matcher/map themselves are broken, not the transfer
    s_inl = []
    for f in range(0, n_scan, max(1, n_scan // 8)):
        r = est_oracle.estimate(crops[f], K_crops[f], frame_idx=1000 + f)
        s_inl.append(r.n_inliers)
    print(f"scan-view (train) sanity: inliers {s_inl}")
    o_results = []
    for f in eval_clean:
        uv_box, _ = camera.project(
            jnp.asarray(corners), jnp.asarray(wscene.poses[f]),
            jnp.asarray(wscene.Ks[f]),
        )
        box = camera.square_box(camera.bbox_from_points(uv_box), pad_ratio=0.1)
        crop_f, A3_f = img_ops.crop_image(
            frames_eval[f], np.asarray(box), crop_hw
        )
        K_crop_f = np.asarray(
            camera.crop_K(jnp.asarray(wscene.Ks[f]), box, crop_hw)
        )
        o_results.append(est_oracle.estimate(
            crop_f, K_crop_f, frame_idx=f,
            crop_affine=A3_f, src_frame_hw=frames_eval[f].shape[:2],
        ))
    o_pred = np.stack([r.T44 for r in o_results])
    o_succ = np.asarray([r.success for r in o_results])
    o_rep = evaluate_poses(
        o_pred, np.stack(gt_T), model_points=sfm_map.keypoints3d,
        K=wscene.Ks[0], success=o_succ,
    )
    o_inl = np.asarray([r.n_inliers for r in o_results])
    o_mat = np.asarray([r.n_matches for r in o_results])
    print(f"oracle-crop wild metrics (matches median {np.median(o_mat):.0f}, "
          f"inliers median {np.median(o_inl):.0f}):", o_rep.row())

    # --- optional temporal second pass (reference CoTracker phase) ---------
    if args.refine == "correlation":
        from onepose_st_tpu.infer.tracker import TemporalTracker, refine_sequence

        ttracker = TemporalTracker(eval_model, trained)
        t0 = time.time()
        refined = refine_sequence(
            eval_cfg, ttracker, frames_eval, results, wscene.Ks,
        )
        print(f"temporal refinement in {time.time()-t0:.1f}s "
              f"({sum(1 for r in refined if r.gated is False)} accepted)")
        pred_T_r = np.stack([refined[f].T44 for f in eval_clean])
        rep_r = evaluate_poses(
            pred_T_r, np.stack(gt_T), model_points=sfm_map.keypoints3d,
            K=wscene.Ks[0], success=succ,
        )
        print("wild-sequence metrics (refined):", rep_r.row())

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
        f_gt = wscene.Ks[0][0, 0]
        print(f"inferred K: f={K_inf[0, 0]:.1f}/{K_inf[1, 1]:.1f} px "
              f"(GT {f_gt:.1f}; err "
              f"{100 * abs(K_inf[1, 1] - f_gt) / f_gt:.1f}%)")
        if args.refine_focal:
            K_inf, cal_info = estimator.self_calibrate(
                frames_eval, K_inf.astype(np.float32),
                method=args.calib_method,
                sample_stride=args.calib_stride,
                rounds=args.calib_rounds,
            )
            print(f"self-calibrated focal ({args.calib_method}): "
                  f"scale {cal_info['scale']:.4f} "
                  f"over {cal_info['n_frames_used']} frames -> "
                  f"f={K_inf[0, 0]:.1f}/{K_inf[1, 1]:.1f} px (GT {f_gt:.1f}; "
                  f"err {100 * abs(K_inf[1, 1] - f_gt) / f_gt:.1f}%)")
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
            K=wscene.Ks[0], success=succ_inf,
        )
        print("wild-sequence metrics with INFERRED K:", rep_inf.row())
        print(f"AP delta (3cm@3deg): GT-K {rep.aps['3cm@3degree']:.3f} -> "
              f"inferred-K {rep_inf.aps['3cm@3degree']:.3f}")


if __name__ == "__main__":
    main()
