"""Full-scale synthetic end-to-end experiment (the demo.sh analogue).

The reference validates itself on the bundled spot_demo scan (demo.sh:1-24);
this framework's substitute is a synthetic scene where ground truth is known
by construction: render a splat object -> build the SfM map from
epipolar-verified matches -> train the 2D-3D matcher -> estimate poses on
held-out views with RANSAC PnP -> report {1,3,5}cm@{1,3,5}deg pose APs.

Runs on a single TPU chip (or CPU with --preset tiny). Example:

  python examples/synthetic_e2e.py --preset small --steps 2000
  python examples/synthetic_e2e.py --preset full --steps 8000   # flagship
"""
from __future__ import annotations

import argparse
import hashlib
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_cfg(preset: str):
    from onepose_st_tpu import config as cfg_lib

    if preset == "full":
        return cfg_lib.adapt_dtypes(cfg_lib.EngineConfig())
    if preset == "small":
        matcher = cfg_lib.MatcherConfig(
            backbone=cfg_lib.BackboneConfig(initial_dim=32, block_dims=(32, 48, 64)),
            coarse=cfg_lib.TransformerConfig(d_model=64, nhead=4, layer_iter_n=2),
            coarse_matching=cfg_lib.CoarseMatchingConfig(
                max_matches=256, train_pad_num_gt_min=64
            ),
            fine=cfg_lib.FineMatchingConfig(window_size=5, d_model=32, nhead=4),
            kpt_encoding=cfg_lib.KeypointEncodingConfig(hidden=(16, 32), descriptor_dim=64),
            n_points=512,
        )
        return cfg_lib.adapt_dtypes(cfg_lib.EngineConfig(matcher=matcher))
    # tiny: CPU smoke (coarse d_model == block_dims[-1], fine == block_dims[0])
    matcher = cfg_lib.MatcherConfig(
        backbone=cfg_lib.BackboneConfig(initial_dim=16, block_dims=(16, 24, 32), dtype="float32"),
        coarse=cfg_lib.TransformerConfig(d_model=32, nhead=2, layer_iter_n=1, dtype="float32"),
        coarse_matching=cfg_lib.CoarseMatchingConfig(max_matches=64, train_pad_num_gt_min=32),
        fine=cfg_lib.FineMatchingConfig(window_size=5, d_model=16, nhead=2, dtype="float32"),
        kpt_encoding=cfg_lib.KeypointEncodingConfig(hidden=(8,), descriptor_dim=32),
        n_points=128,
    )
    return cfg_lib.adapt_dtypes(cfg_lib.EngineConfig(matcher=matcher))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="small", choices=["tiny", "small", "full"])
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--points", type=int, default=400)
    ap.add_argument("--image", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval_train", action="store_true",
                    help="also evaluate 4 training views (mechanics check)")
    ap.add_argument("--split", default="interleave",
                    choices=["interleave", "tail"])
    ap.add_argument("--elev_jitter", type=float, default=0.05,
                    help="per-frame elevation jitter (rad); lower = smoother "
                         "scan trajectory")
    ap.add_argument("--refine", default="none",
                    choices=["none", "correlation", "learned"],
                    help="temporal second pass over the whole orbit as a "
                         "video (the reference's CoTracker POSE OPTIMIZATION "
                         "loop); reports APs before/after. 'correlation' is "
                         "the shipped default backend; 'learned' is "
                         "experimental (loses to correlation on every "
                         "round-3 study)")
    ap.add_argument("--tracker_ckpt", default=None,
                    help="weights for --refine learned "
                         "(examples/train_tracker.py output)")
    ap.add_argument("--tracker_preset", default="small",
                    choices=["tiny", "small", "full"],
                    help="TrackerConfig the ckpt was trained with")
    ap.add_argument("--save_run", default=None,
                    help="directory to save the built map + trained matcher "
                         "(stage cache in the spirit of the reference's "
                         "raw_matches.h5 / ckpt reuse)")
    ap.add_argument("--reuse_run", default=None,
                    help="directory from --save_run: skip map building and "
                         "training, go straight to eval/refinement (the "
                         "scene is re-rendered deterministically from "
                         "--seed)")
    ap.add_argument("--tracker_polish", action="store_true",
                    help="with --refine learned: polish the learned track "
                         "positions with a small-radius correlation pass on "
                         "the matcher's fine features (hybrid backend: "
                         "learned visibility + correlation localization)")
    ap.add_argument("--tracker_vis_thr", type=float, default=0.5,
                    help="visibility-probability gate for learned-tracker "
                         "points entering the union PnP")
    ap.add_argument("--degrade_keep_n", type=int, default=0,
                    help="keep only N random valid matches per frame in the "
                         "video pass (starves per-frame PnP — the scenario "
                         "temporal refinement exists for)")
    ap.add_argument("--degrade_only_eval", action="store_true",
                    help="apply the degradations only to held-out frames: "
                         "the reference's intermittent-failure scenario "
                         "(momentary blur/occlusion) — neighboring clean "
                         "frames feed good tracks into the degraded ones")
    ap.add_argument("--occlude_eval", type=float, default=0.0,
                    help="momentary-occlusion protocol: paint a textured "
                         "occluder covering this fraction of the object "
                         "bbox onto HELD-OUT frames of the --refine video "
                         "pass (matcher and tracker both see it; clean "
                         "neighbors feed tracks). The scenario where a "
                         "visibility-aware tracker should beat the blind "
                         "correlation chain")
    ap.add_argument("--degrade_noise_px", type=float, default=0.0,
                    help="add Gaussian pixel noise to the per-frame 2D "
                         "matches of the --refine video pass (simulates a "
                         "worse matcher, the reference's motivation for the "
                         "CoTracker phase) so the temporal tracker's "
                         "improvement is measurable")
    ap.add_argument("--pnp_recenter", type=int, default=0,
                    help="inference-time fine re-centering rounds "
                         "(PnPConfig.recenter_iters): re-run the fine stage "
                         "with windows at the current pose's reprojections, "
                         "then re-run PnP")
    ap.add_argument("--pnp_tight", type=float, default=0.0,
                    help="second Gauss-Newton stage on inliers reselected "
                         "at this tight px threshold "
                         "(PnPConfig.tight_refine_px)")
    ap.add_argument("--eval_conf_thr", type=float, default=None,
                    help="override the coarse confidence threshold at eval "
                         "(mutual-NN + RANSAC tolerate low-conf matches; "
                         "small models under-shoot the flagship's 0.1)")
    ap.add_argument("--loftr_ckpt", default=None,
                    help="trained 2D-2D matcher checkpoint "
                         "(cli/train_loftr.py output). When given, pair "
                         "matches come from the LoFTR matcher over "
                         "pose-covisibility pairs — the reference's full "
                         "detector-free front-end (coarse_match.py) — "
                         "instead of ground-truth correspondences.")
    ap.add_argument("--loftr_preset", default="small",
                    choices=["tiny", "small", "full"],
                    help="LoFTRConfig the --loftr_ckpt was trained with")
    ap.add_argument("--loftr_conf_thr", type=float, default=None,
                    help="override the 2D-2D coarse confidence threshold")
    ap.add_argument("--fine_refine", action="store_true",
                    help="with --loftr_ckpt: fine-only re-refinement of "
                         "track observations before triangulation/BA (the "
                         "reference's post-optimization fine_matcher pass)")
    ap.add_argument("--matches_cache", default=None,
                    help="pair-matches stage cache (reference raw_matches.h5 "
                         "role, coarse_match.py:49): load LoFTR pair matches "
                         "from this npz when it exists, else match and save")
    ap.add_argument("--refine_iters", type=int, default=1,
                    help="with --fine_refine: total fine-refinement passes; "
                         "passes >=2 re-center fine windows on reprojected "
                         "BA points and re-solve (SfMConfig.refine_iters)")
    ap.add_argument("--covis_num", type=int, default=10,
                    help="pose-covisibility pairs per image (sfm_demo.yaml)")
    ap.add_argument("--strict_map", action="store_true",
                    help="tight SfM gates (epipolar 1.5 px, reproj 2 px, "
                         "huber 1 px) — affordable once fine matching is "
                         "sub-pixel; cuts along-epipolar-line mismatches")
    ap.add_argument("--min_rotation", type=float, default=10.0,
                    help="min relative rotation (deg) for a covis pair")
    ap.add_argument("--n_objects", type=int, default=1,
                    help="train ONE matcher over N distinct objects' maps "
                         "(the reference's merged-annotation multi-object "
                         "training, merge.py) and evaluate each object "
                         "separately; objects use derived seeds")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.core import camera
    from onepose_st_tpu.data import synthetic
    from onepose_st_tpu.infer.evaluate import evaluate_poses
    from onepose_st_tpu.models import OnePoseMatcher
    from onepose_st_tpu.sfm import pipeline as sfm_pipeline, tracks as tracks_mod
    from onepose_st_tpu.solvers import ransac_pnp
    from onepose_st_tpu.train import data as data_mod, loop as loop_mod

    from onepose_st_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    print(f"devices: {jax.devices()}")
    cfg = build_cfg(args.preset)
    if args.strict_map:
        # sub-pixel fine matching makes tight gates affordable: mismatches
        # sliding along epipolar lines are the residual observation noise
        cfg = cfg_lib.replace(cfg, sfm=cfg_lib.replace(
            cfg.sfm, epipolar_threshold_px=1.5, max_reproj_error_px=2.0,
            ba_huber_px=1.0,
        ))
    if args.refine_iters != 1:
        cfg = cfg_lib.replace(cfg, sfm=cfg_lib.replace(
            cfg.sfm, refine_iters=args.refine_iters))
    if args.n_objects > 1:
        return _multi_object_main(args, cfg)
    rng = np.random.default_rng(args.seed)

    # --- scene + rendering -------------------------------------------------
    t0 = time.time()
    scene = synthetic.make_scene(
        rng, n_points=args.points, n_frames=args.frames,
        image_hw=(args.image, args.image), focal=1.4 * args.image,
        object_size=0.25, elevation_jitter=args.elev_jitter,
    )
    frames = synthetic.render_sequence(scene, rng, sigma_px=1.8)
    if args.split == "interleave":
        # held-out = every 5th view: novel frames with covered viewpoints,
        # the reference's scenario (test video around the scanned object)
        eval_ids = np.arange(2, args.frames, 5)
        train_ids = np.setdiff1d(np.arange(args.frames), eval_ids)
    else:  # 'tail': viewpoint extrapolation (much harder)
        n_train = int(args.frames * 0.8)
        train_ids = np.arange(n_train)
        eval_ids = np.arange(n_train, args.frames)
    if args.eval_train:
        eval_ids = np.concatenate([train_ids[:4], eval_ids])
    print(f"rendered {args.frames} frames in {time.time()-t0:.1f}s")

    # --- map building ------------------------------------------------------
    model = OnePoseMatcher(cfg.matcher)
    L = cfg.matcher.n_points
    Cc = cfg.matcher.coarse.d_model
    Cf = cfg.matcher.fine.d_model
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.asarray(frames[:1, ..., None]),
        jnp.zeros((1, L, 3)), jnp.zeros((1, L, Cc)), jnp.zeros((1, L, Cf)),
    )

    if args.reuse_run is not None:
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
        return _evaluate(args, cfg, model, trained, sfm_map, scene, frames,
                         eval_ids, rng)

    sample_desc = sfm_pipeline.make_descriptor_sampler(model, variables, frames)

    if args.loftr_ckpt is not None:
        # full detector-free front-end: trained 2D-2D matcher over
        # pose-covisibility pairs (reference sfm_core run.py:144 ->
        # pairs_from_poses + detector_free_coarse_matching)
        from onepose_st_tpu.cli.train_loftr import build_loftr_cfg
        from onepose_st_tpu.models.loftr import LoFTRMatcher
        from onepose_st_tpu.sfm import pairs as pairs_mod
        from onepose_st_tpu.train.loop import load_checkpoint

        lcfg = cfg_lib.load_model_config(args.loftr_ckpt)
        if lcfg is not None:
            if not isinstance(lcfg, cfg_lib.LoFTRConfig):
                raise SystemExit(
                    f"{args.loftr_ckpt}/model_config.json holds a "
                    f"{type(lcfg).__name__}, not a LoFTRConfig"
                )
            if args.loftr_preset != ap.get_default("loftr_preset"):
                print(
                    f"NOTE: --loftr_preset {args.loftr_preset} ignored; using "
                    f"the saved config in {args.loftr_ckpt}/model_config.json"
                )
            else:
                print(f"LoFTR config source: {args.loftr_ckpt}/model_config.json")
            lcfg = cfg_lib.adapt_dtypes(lcfg)
        else:
            print(
                f"LoFTR config source: --loftr_preset {args.loftr_preset} "
                f"(no model_config.json in {args.loftr_ckpt})"
            )
            lcfg = build_loftr_cfg(args.loftr_preset)
        if args.loftr_conf_thr is not None:
            lcfg = cfg_lib.replace(lcfg, coarse_matching=cfg_lib.replace(
                lcfg.coarse_matching, threshold=args.loftr_conf_thr))
        loftr = LoFTRMatcher(lcfg)
        lvars = load_checkpoint(args.loftr_ckpt)
        Rs, ts = pairs_mod.poses_to_Rt(scene.poses[train_ids])
        local_pairs = pairs_mod.pairs_from_poses(
            Rs, ts, covis_num=args.covis_num,
            min_rotation_deg=args.min_rotation,
        )
        train_pairs_arr = train_ids[local_pairs].astype(np.int32)
        # stale-cache guard: key the cache to the actual scene/pair set, not
        # just the file path
        cache_fp = {
            "seed": args.seed,
            "n_frames": args.frames,
            "pairs_sha": hashlib.sha256(
                np.ascontiguousarray(train_pairs_arr).tobytes()
            ).hexdigest()[:16],
        }
        if args.matches_cache and Path(args.matches_cache).exists():
            pms = sfm_pipeline.load_pair_matches(
                args.matches_cache, expect_fingerprint=cache_fp)
            print(f"loaded {len(pms)} cached pair matches "
                  f"({sum(len(pm.uv_i) for pm in pms)} raw) from "
                  f"{args.matches_cache}")
        else:
            t0 = time.time()
            pms = sfm_pipeline.match_pairs_loftr(
                loftr, lvars, frames, train_pairs_arr, batch_size=args.batch,
            )
            n_m = sum(len(pm.uv_i) for pm in pms)
            print(
                f"LoFTR-matched {len(train_pairs_arr)} covis pairs in "
                f"{time.time()-t0:.1f}s ({n_m} raw matches)"
            )
            if args.matches_cache:
                Path(args.matches_cache).parent.mkdir(
                    parents=True, exist_ok=True)
                sfm_pipeline.save_pair_matches(
                    args.matches_cache, pms, fingerprint=cache_fp)
    else:
        pms = []
        train_pairs = [
            (int(train_ids[a]), int(train_ids[b]))
            for a in range(len(train_ids))
            for b in range(a + 1, len(train_ids))
        ]
        for i, j in train_pairs:
            vis = scene.visible[i] & scene.visible[j]
            ids = np.nonzero(vis)[0]
            if len(ids) < 8:
                continue
            noise = rng.normal(size=(len(ids), 2)) * 0.3
            pms.append(tracks_mod.PairMatches(
                i, j,
                scene.uv[i, ids].astype(np.float32),
                (scene.uv[j, ids] + noise).astype(np.float32),
                np.ones(len(ids), np.float32),
            ))
    corners = np.asarray(camera.box3d_corners(jnp.asarray([0.3, 0.3, 0.3])))
    refine_obs = None
    if args.fine_refine:
        assert args.loftr_ckpt, "--fine_refine needs --loftr_ckpt"
        refine_obs = lambda a, centers=None: (
            sfm_pipeline.refine_track_observations(
                loftr, lvars, frames, a, batch_pairs=args.batch,
                j_centers=centers,
            )
        )
    sfm_map, diag = sfm_pipeline.build_map_from_matches(
        pms, scene.poses, scene.Ks, cfg, box_corners=corners,
        sample_descriptors=sample_desc, desc_dims=(Cc, Cf),
        refine_observations=refine_obs,
    )
    print(
        f"map: {len(sfm_map.keypoints3d)} pts "
        f"(tracks {diag.n_tracks}, tri {diag.n_triangulated}, "
        f"BA {diag.ba_initial_cost:.3f} -> {diag.ba_final_cost:.3f}, "
        f"mean reproj {diag.mean_reproj_err_px:.3f}px, "
        f"mean track len {diag.mean_track_length:.1f})"
    )

    # --- training ----------------------------------------------------------
    batches = data_mod.map_training_batches(
        sfm_map, frames, scene.poses, scene.Ks, cfg, rng,
        batch_size=args.batch, frame_ids=train_ids,
        homography_prob=0.15, photometric="dark",
    )
    t0 = time.time()
    state, history = loop_mod.fit(
        cfg, model, batches, n_steps=args.steps, log_every=200,
        log_fn=lambda s, r: print(
            f"  step {s}: loss {r['loss']:.4f} ({r['steps_per_sec']:.2f} it/s)"
        ),
    )
    print(f"trained {args.steps} steps in {time.time()-t0:.1f}s")

    trained = {"params": state.params, "batch_stats": state.batch_stats}
    if args.save_run:
        import flax.serialization as ser

        out = Path(args.save_run)
        out.mkdir(parents=True, exist_ok=True)
        sfm_map.save(out / "map.npz")
        with open(out / "matcher.msgpack", "wb") as f:
            f.write(ser.to_bytes(trained))
        from onepose_st_tpu import config as _cfg

        _cfg.save_model_config(out, cfg)
        print(f"saved run artifacts -> {out}")
    return _evaluate(args, cfg, model, trained, sfm_map, scene, frames,
                     eval_ids, rng)


def _multi_object_main(args, cfg):
    """N distinct splat objects -> N maps -> ONE jointly trained matcher
    (train.data.multi_object_batches, the reference's merged-COCO
    multi-object training, merge.py:13-197) -> per-object held-out eval.

    Derived seeds give each object its own geometry/texture; train frames
    of every object mix freely in each batch."""
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.core import camera
    from onepose_st_tpu.data import synthetic
    from onepose_st_tpu.models import OnePoseMatcher
    from onepose_st_tpu.sfm import pipeline as sfm_pipeline
    from onepose_st_tpu.sfm import tracks as tracks_mod
    from onepose_st_tpu.train import data as data_mod, loop as loop_mod
    from onepose_st_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    eval_ids = np.arange(2, args.frames, 5)
    train_ids = np.setdiff1d(np.arange(args.frames), eval_ids)

    model = OnePoseMatcher(cfg.matcher)
    L = cfg.matcher.n_points
    Cc = cfg.matcher.coarse.d_model
    Cf = cfg.matcher.fine.d_model

    loftr = lvars = None
    if args.loftr_ckpt is not None:
        from onepose_st_tpu.models.loftr import LoFTRMatcher
        from onepose_st_tpu.train.loop import load_checkpoint

        lcfg = cfg_lib.load_model_config(args.loftr_ckpt)
        assert lcfg is not None, "multi-object LoFTR path needs a saved config"
        lcfg = cfg_lib.adapt_dtypes(lcfg)
        if args.loftr_conf_thr is not None:
            lcfg = cfg_lib.replace(lcfg, coarse_matching=cfg_lib.replace(
                lcfg.coarse_matching, threshold=args.loftr_conf_thr))
        loftr = LoFTRMatcher(lcfg)
        lvars = load_checkpoint(args.loftr_ckpt)

    objects, scenes, all_frames, maps = [], [], [], []
    variables = None
    corners = np.asarray(camera.box3d_corners(jnp.asarray([0.3, 0.3, 0.3])))
    for o in range(args.n_objects):
        o_seed = args.seed + 7919 * o
        rng_o = np.random.default_rng(o_seed)
        scene = synthetic.make_scene(
            rng_o, n_points=args.points, n_frames=args.frames,
            image_hw=(args.image, args.image), focal=1.4 * args.image,
            object_size=0.25, elevation_jitter=args.elev_jitter,
        )
        frames = synthetic.render_sequence(scene, rng_o, sigma_px=1.8)
        if variables is None:
            variables = jax.jit(model.init)(
                jax.random.key(0), jnp.asarray(frames[:1, ..., None]),
                jnp.zeros((1, L, 3)), jnp.zeros((1, L, Cc)),
                jnp.zeros((1, L, Cf)),
            )
        sample_desc = sfm_pipeline.make_descriptor_sampler(
            model, variables, frames
        )
        if loftr is not None:
            from onepose_st_tpu.sfm import pairs as pairs_mod

            Rs, ts = pairs_mod.poses_to_Rt(scene.poses[train_ids])
            local_pairs = pairs_mod.pairs_from_poses(
                Rs, ts, covis_num=args.covis_num,
                min_rotation_deg=args.min_rotation,
            )
            pair_arr = train_ids[local_pairs].astype(np.int32)
            t0 = time.time()
            pms = sfm_pipeline.match_pairs_loftr(
                loftr, lvars, frames, pair_arr, batch_size=args.batch,
            )
            print(f"obj{o}: LoFTR-matched {len(pair_arr)} pairs in "
                  f"{time.time()-t0:.1f}s")
        else:
            pms = []
            for a in range(len(train_ids)):
                for b in range(a + 1, len(train_ids)):
                    i, j = int(train_ids[a]), int(train_ids[b])
                    vis = scene.visible[i] & scene.visible[j]
                    ids = np.nonzero(vis)[0]
                    if len(ids) < 8:
                        continue
                    noise = rng_o.normal(size=(len(ids), 2)) * 0.3
                    pms.append(tracks_mod.PairMatches(
                        i, j, scene.uv[i, ids].astype(np.float32),
                        (scene.uv[j, ids] + noise).astype(np.float32),
                        np.ones(len(ids), np.float32),
                    ))
        refine_obs = None
        if args.fine_refine and loftr is not None:
            refine_obs = lambda a, centers=None, _f=frames: (
                sfm_pipeline.refine_track_observations(
                    loftr, lvars, _f, a, batch_pairs=args.batch,
                    j_centers=centers,
                )
            )
        sfm_map, diag = sfm_pipeline.build_map_from_matches(
            pms, scene.poses, scene.Ks, cfg, box_corners=corners,
            sample_descriptors=sample_desc, desc_dims=(Cc, Cf),
            refine_observations=refine_obs,
        )
        print(f"obj{o} (seed {o_seed}) map: {len(sfm_map.keypoints3d)} pts, "
              f"mean reproj {diag.mean_reproj_err_px:.3f}px")
        scenes.append(scene)
        all_frames.append(frames)
        maps.append(sfm_map)
        objects.append((
            sfm_map, frames[train_ids], scene.poses[train_ids],
            scene.Ks[train_ids],
        ))

    rng = np.random.default_rng(args.seed)
    batches = data_mod.multi_object_batches(
        objects, cfg, rng, batch_size=args.batch,
        homography_prob=0.15, photometric="dark",
    )
    t0 = time.time()
    state, _ = loop_mod.fit(
        cfg, model, batches, n_steps=args.steps, log_every=200,
        log_fn=lambda s, r: print(
            f"  step {s}: loss {r['loss']:.4f} ({r['steps_per_sec']:.2f} it/s)"
        ),
    )
    print(f"jointly trained {args.steps} steps over {args.n_objects} "
          f"objects in {time.time()-t0:.1f}s")
    trained = {"params": state.params, "batch_stats": state.batch_stats}

    if args.save_run:
        import flax.serialization as ser

        out = Path(args.save_run)
        out.mkdir(parents=True, exist_ok=True)
        for o, m in enumerate(maps):
            m.save(out / f"map_obj{o}.npz")
        with open(out / "matcher.msgpack", "wb") as f:
            f.write(ser.to_bytes(trained))
        cfg_lib.save_model_config(out, cfg)
        print(f"saved run artifacts -> {out}")

    for o in range(args.n_objects):
        print(f"--- object {o} held-out eval ---")
        _evaluate(args, cfg, model, trained, maps[o], scenes[o],
                  all_frames[o], eval_ids, rng, save_scene3d=False)


def _evaluate(args, cfg, model, trained, sfm_map, scene, frames, eval_ids,
              rng, save_scene3d=True):
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.core import so3
    from onepose_st_tpu.infer.evaluate import evaluate_poses
    from onepose_st_tpu.models import OnePoseMatcher
    from onepose_st_tpu.solvers import ransac_pnp

    L = cfg.matcher.n_points

    # --- held-out inference + eval ----------------------------------------
    k, dc, df, s, mask = sfm_map.padded(L)
    eval_cfg = cfg
    if args.eval_conf_thr is not None:
        eval_cfg = cfg_lib.replace(eval_cfg, matcher=cfg_lib.replace(
            eval_cfg.matcher,
            coarse_matching=cfg_lib.replace(
                eval_cfg.matcher.coarse_matching,
                threshold=args.eval_conf_thr,
            ),
        ))
    if args.pnp_recenter or args.pnp_tight:
        eval_cfg = cfg_lib.replace(eval_cfg, pnp=cfg_lib.replace(
            eval_cfg.pnp, recenter_iters=args.pnp_recenter,
            tight_refine_px=args.pnp_tight,
        ))
    eval_model = OnePoseMatcher(eval_cfg.matcher)
    from onepose_st_tpu.infer.pipeline import make_fwd_pnp

    fwd_pnp = make_fwd_pnp(eval_model, eval_cfg)
    kB, dcB = jnp.asarray(k)[None], jnp.asarray(dc)[None]
    dfB, maskB = jnp.asarray(df)[None], jnp.asarray(mask)[None]
    pred_T, gt_T = [], []
    from scipy.spatial.transform import Rotation

    for t in eval_ids:
        _, _, _, res = fwd_pnp(
            trained, jnp.asarray(frames[t][None, ..., None]),
            kB, dcB, dfB, maskB,
            jnp.asarray(scene.Ks[t]), jax.random.key(int(t)),
        )
        T44 = np.eye(4)
        from onepose_st_tpu.core import so3

        R, tr = so3.pose6_to_Rt(res.pose6)
        T44[:3, :3] = np.asarray(R)
        T44[:3, 3] = np.asarray(tr)
        pred_T.append(T44)
        G = np.eye(4)
        G[:3, :3] = Rotation.from_rotvec(scene.poses[t, :3]).as_matrix()
        G[:3, 3] = scene.poses[t, 3:]
        gt_T.append(G)
        print(f"  frame {t}: {int(res.n_inliers)} PnP inliers")
    rep = evaluate_poses(
        np.stack(pred_T), np.stack(gt_T), model_points=sfm_map.keypoints3d,
        K=scene.Ks[0],
    )
    print("held-out pose metrics:", rep.row())

    if args.save_run and save_scene3d:
        # browsable 3D artifact (wis3d analogue): map + GT/pred eval cameras
        from onepose_st_tpu.utils.scene3d import SceneDump

        dump = SceneDump()
        dump.add_points("map", sfm_map.keypoints3d, (180, 180, 180))
        hw = frames.shape[1:3]
        for i, t in enumerate(eval_ids):
            dump.add_camera(f"gt_{t}", gt_T[i], scene.Ks[t], hw,
                            scale=0.04, color=(15, 157, 88))
            dump.add_camera(f"pred_{t}", pred_T[i], scene.Ks[t], hw,
                            scale=0.04, color=(219, 68, 55))
        dump.add_trajectory(
            "gt_traj",
            np.stack([-G[:3, :3].T @ G[:3, 3] for G in gt_T]),
            color=(66, 133, 244),
        )
        out = dump.save(Path(args.save_run) / "scene3d")
        print(f"3D scene dump: {out}/viewer.html")

    # --- optional temporal refinement over the full orbit as a video ------
    if args.refine != "none":
        from onepose_st_tpu.infer.pipeline import FrameResult
        from onepose_st_tpu.infer.tracker import (
            LearnedTemporalTracker, TemporalTracker, refine_sequence,
        )

        t0 = time.time()
        results, gt_all = [], []
        eval_set = {int(e) for e in eval_ids}
        if args.occlude_eval > 0:
            frames = frames.copy()
            for t in sorted(eval_set):
                vis_uv = scene.uv[t][scene.visible[t]]
                if len(vis_uv) == 0:
                    continue
                lo, hi = vis_uv.min(axis=0), vis_uv.max(axis=0)
                side = args.occlude_eval * float(np.max(hi - lo))
                c = lo + rng.uniform(0.25, 0.75, size=2) * (hi - lo)
                x0 = int(max(c[0] - side / 2, 0))
                y0 = int(max(c[1] - side / 2, 0))
                x1 = int(min(c[0] + side / 2, frames.shape[2]))
                y1 = int(min(c[1] + side / 2, frames.shape[1]))
                if x1 > x0 and y1 > y0:
                    patch = 0.45 + 0.1 * rng.uniform(
                        size=(y1 - y0, x1 - x0)
                    ).astype(np.float32)
                    frames[t, y0:y1, x0:x1] = patch
            print(f"occluder protocol: {args.occlude_eval:.0%} of object "
                  f"bbox painted over on {len(eval_set)} held-out frames")
        # the video pass needs the raw match tensors on host (the degrade_*
        # flags perturb them before PnP), so it keeps a separate unfused
        # matcher apply rather than make_fwd_pnp
        apply = jax.jit(
            lambda v, im, k_, dc_, df_, m_: eval_model.apply(
                v, im, k_, dc_, df_, m_
            )
        )
        for t in range(args.frames):
            out = apply(
                trained, jnp.asarray(frames[t][None, ..., None]),
                jnp.asarray(k)[None], jnp.asarray(dc)[None],
                jnp.asarray(df)[None], jnp.asarray(mask)[None],
            )
            valid = np.asarray(out["matches"].valid[0])
            P3 = np.asarray(out["mkpts3d"][0])
            P2 = np.asarray(out["mkpts_query_f"][0])
            degrade_this = (not args.degrade_only_eval) or (t in eval_set)
            if args.degrade_noise_px > 0 and degrade_this:
                P2 = P2 + rng.normal(size=P2.shape).astype(np.float32) * args.degrade_noise_px
            if args.degrade_keep_n > 0 and degrade_this:
                ids = np.nonzero(valid)[0]
                if len(ids) > args.degrade_keep_n:
                    drop = rng.choice(
                        ids, len(ids) - args.degrade_keep_n, replace=False
                    )
                    valid = valid.copy()
                    valid[drop] = False
            res = ransac_pnp(
                jax.random.key(int(t)), jnp.asarray(P3), jnp.asarray(P2),
                jnp.asarray(scene.Ks[t]), jnp.asarray(valid), cfg.pnp,
            )
            inl = np.asarray(res.inliers) & valid
            T44 = np.eye(4, dtype=np.float32)
            R, tr = so3.pose6_to_Rt(res.pose6)
            T44[:3, :3] = np.asarray(R)
            T44[:3, 3] = np.asarray(tr)
            n_inl = int(res.n_inliers)
            results.append(FrameResult(
                pose6=np.asarray(res.pose6), T44=T44, n_inliers=n_inl,
                n_matches=int(valid.sum()), tracked=True,
                success=bool(res.success) and n_inl >= cfg.pnp.min_inliers,
                mkpts3d=P3[inl].astype(np.float32),
                mkpts2d_full=P2[inl].astype(np.float32),
            ))
            G = np.eye(4)
            G[:3, :3] = Rotation.from_rotvec(scene.poses[t, :3]).as_matrix()
            G[:3, 3] = scene.poses[t, 3:]
            gt_all.append(G)
        print(f"per-frame pass over {args.frames} frames in {time.time()-t0:.1f}s")

        if args.refine == "learned":
            assert args.tracker_ckpt, "--refine learned needs --tracker_ckpt"
            import train_tracker as tt  # sibling example: preset configs

            tdir = Path(args.tracker_ckpt)
            tcfg = cfg_lib.load_model_config(
                tdir.parent if tdir.is_file() else tdir
            )
            if tcfg is not None:
                if not isinstance(tcfg, cfg_lib.TrackerConfig):
                    raise SystemExit(
                        f"model_config.json next to {args.tracker_ckpt} holds "
                        f"a {type(tcfg).__name__}, not a TrackerConfig"
                    )
                tcfg = cfg_lib.adapt_dtypes(tcfg)
            else:
                tcfg = tt.build_cfg(args.tracker_preset)
            tracker = LearnedTemporalTracker.load(
                tcfg, args.tracker_ckpt, vis_threshold=args.tracker_vis_thr,
                polish=(
                    TemporalTracker(model, trained)
                    if args.tracker_polish else None
                ),
            )
            window = tracker.cfg.window
        else:
            tracker = TemporalTracker(model, trained)
            window = 6
        t0 = time.time()
        refined = refine_sequence(
            cfg, tracker, frames, results, scene.Ks, window=window
        )
        print(f"refined in {time.time()-t0:.1f}s "
              f"(tracks used: {[r.used_tracks for r in refined[window:window+8]]}...)")
        sel = np.arange(window - 1, args.frames)
        base_T = np.stack([results[f].T44 for f in sel])
        ref_T = np.stack([refined[f].T44 for f in sel])
        gt_sel = np.stack([gt_all[f] for f in sel])
        rep_b = evaluate_poses(base_T, gt_sel, model_points=sfm_map.keypoints3d, K=scene.Ks[0])
        rep_r = evaluate_poses(ref_T, gt_sel, model_points=sfm_map.keypoints3d, K=scene.Ks[0])
        n_gated = sum(1 for r in refined if r.gated is True)
        n_acc = sum(1 for r in refined if r.gated is False)
        print(f"drift gate: accepted {n_acc}, rejected {n_gated} "
              f"(of {len(sel)} attempted)")
        print("video pass  (per-frame):", rep_b.row())
        print("video pass  (refined):  ", rep_r.row())
        ho = np.array([int(f) in eval_set for f in sel])
        if ho.any():
            rep_bh = evaluate_poses(base_T[ho], gt_sel[ho],
                                    model_points=sfm_map.keypoints3d, K=scene.Ks[0])
            rep_rh = evaluate_poses(ref_T[ho], gt_sel[ho],
                                    model_points=sfm_map.keypoints3d, K=scene.Ks[0])
            print("held-out    (per-frame):", rep_bh.row())
            print("held-out    (refined):  ", rep_rh.row())


if __name__ == "__main__":
    main()
