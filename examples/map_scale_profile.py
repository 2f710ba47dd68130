"""Profile build_map_from_matches at reference scale (15k tracks).

The reference caps its maps at 15000 3D points (filter_tkl.py:37,
sfm_demo.yaml:17); this script drives our whole map pipeline at that scale
and reports per-stage wall time, proving no host stage dominates the BA
solve (the r1 verdict's scale-test ask). Ground-truth correspondences are
generated from a synthetic scene so the geometry is exactly checkable.

  python examples/map_scale_profile.py                 # TPU (or default dev)
  python examples/map_scale_profile.py --cpu --points 4000

With --refine the fine re-refinement pass runs too (needs a LoFTR model;
random weights are fine for timing).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--points", type=int, default=15000)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--image", type=int, default=512)
    ap.add_argument("--covis_num", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--refine", action="store_true",
                    help="also time the fine re-refinement pass "
                         "(random-weight LoFTR, small preset)")
    ap.add_argument("--real_sampler", action="store_true",
                    help="use a real backbone descriptor sampler instead of "
                         "a host stub (times backbone+sampling on device)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.core import camera
    from onepose_st_tpu.data import synthetic
    from onepose_st_tpu import native
    from onepose_st_tpu.sfm import pairs as pairs_mod, pipeline as sfm_pipeline
    from onepose_st_tpu.sfm import tracks as tracks_mod
    from onepose_st_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}  "
          f"native_trackgraph: {native.get_lib() is not None}")
    rng = np.random.default_rng(args.seed)
    cfg = cfg_lib.adapt_dtypes(cfg_lib.EngineConfig())

    t0 = time.perf_counter()
    scene = synthetic.make_scene(
        rng, n_points=args.points, n_frames=args.frames,
        image_hw=(args.image, args.image), focal=1.4 * args.image,
        object_size=0.25, elevation_jitter=0.05,
    )
    Rs, ts = pairs_mod.poses_to_Rt(scene.poses)
    pair_list = pairs_mod.pairs_from_poses(
        Rs, ts, covis_num=args.covis_num, min_rotation_deg=10.0
    )
    print(f"scene: {args.points} pts, {args.frames} frames, "
          f"{len(pair_list)} covis pairs ({time.perf_counter()-t0:.2f}s)")

    t0 = time.perf_counter()
    pms = []
    for i, j in pair_list:
        vis = scene.visible[i] & scene.visible[j]
        ids = np.nonzero(vis)[0]
        if len(ids) < 8:
            continue
        noise = rng.normal(size=(len(ids), 2)).astype(np.float32) * 0.3
        pms.append(tracks_mod.PairMatches(
            int(i), int(j),
            scene.uv[i, ids].astype(np.float32),
            scene.uv[j, ids].astype(np.float32) + noise,
            np.ones(len(ids), np.float32),
        ))
    n_raw = sum(len(pm.uv_i) for pm in pms)
    print(f"GT matches: {n_raw} over {len(pms)} pairs "
          f"({time.perf_counter()-t0:.2f}s)")

    if args.real_sampler or args.refine:
        from onepose_st_tpu.cli.train_loftr import build_loftr_cfg
        from onepose_st_tpu.models.loftr import LoFTRMatcher

        lcfg = build_loftr_cfg("small")
        loftr = LoFTRMatcher(lcfg)
        lvars = jax.jit(loftr.init)(
            jax.random.key(0),
            jnp.zeros((1, args.image, args.image, 1)),
            jnp.zeros((1, args.image, args.image, 1)),
        )

    sample_desc = None
    desc_dims = (256, 128)
    if args.real_sampler:
        frames = synthetic.render_sequence(scene, rng, sigma_px=1.8)
        sample_desc = sfm_pipeline.make_descriptor_sampler(loftr, lvars, frames)
        desc_dims = (lcfg.coarse.d_model, lcfg.fine.d_model)
    else:
        Cc, Cf = desc_dims

        def sample_desc(img_id, uv):  # host stub: isolates aggregation cost
            n = len(uv)
            return (
                np.ones((n, Cc), np.float32),
                np.ones((n, Cf), np.float32),
            )

    refine = None
    if args.refine:
        frames2 = synthetic.render_sequence(scene, rng, sigma_px=1.8)

        def refine(assigned, centers=None):
            return sfm_pipeline.refine_track_observations(
                loftr, lvars, frames2, assigned, batch_pairs=4,
                j_centers=centers,
            )

    corners = np.asarray(camera.box3d_corners(jnp.asarray([0.3, 0.3, 0.3])))
    t0 = time.perf_counter()
    sfm_map, diag = sfm_pipeline.build_map_from_matches(
        pms, scene.poses, scene.Ks, cfg, box_corners=corners,
        sample_descriptors=sample_desc, desc_dims=desc_dims,
        refine_observations=refine,
    )
    total = time.perf_counter() - t0
    print(f"\nmap: {len(sfm_map.keypoints3d)} pts, tracks {diag.n_tracks}, "
          f"tri {diag.n_triangulated}, BA {diag.ba_initial_cost:.2f} -> "
          f"{diag.ba_final_cost:.2f}, mean reproj {diag.mean_reproj_err_px:.3f}px")
    print(f"total build_map_from_matches: {total:.2f}s")
    for k, v in diag.stage_seconds.items():
        print(f"  {k:>12}: {v:7.2f}s  ({100*v/total:4.1f}%)")
    ba_t = diag.stage_seconds.get("depth_ba", 1e-9)
    worst = max(
        (v, k) for k, v in diag.stage_seconds.items() if k != "depth_ba"
    )
    print(f"\nworst non-BA stage: {worst[1]} at {worst[0]:.2f}s = "
          f"{worst[0]/ba_t:.1f}x the BA solve")
    print(json.dumps({
        "metric": "map_build_15k_total_s", "value": round(total, 3),
        "unit": "s", "stages": {k: round(v, 3) for k, v in
                                diag.stage_seconds.items()},
    }))


if __name__ == "__main__":
    main()
