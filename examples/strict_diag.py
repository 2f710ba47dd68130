"""Per-frame error attribution for the sub-centimetre regime (round-4).

The strict-orbit flagship sits at ~1.6 deg median rotation per held-out
frame while the map's train-view reprojection is 1.05 px — VERDICT r3 says
the bottleneck moved to the inference side, but tight-PnP and fine
re-centering sweeps (logs/r4_recenter_sweep_driver.log) did not move it,
which points at CORRELATED error sources. This tool decomposes the
per-frame pose error by swapping in ground truth one ingredient at a time:

  A baseline      PnP(map 3D,      measured 2D)   — the shipped path
  B snap3d        PnP(GT-snapped 3D, measured 2D) — removes map 3D error
  C gt2d          PnP(map 3D,      GT-projected 2D of the matched points)
                                                  — removes match 2D error
  D both          PnP(snapped 3D,  GT-projected 2D)

If B >> A: the map's 3D point accuracy is the floor (attack BA/triangulation).
If C >> A: per-frame match localization is the floor (attack the fine head).

Usage:
  python examples/strict_diag.py --reuse_run runs/e2e_r3_strict_it2 \
      --preset full --frames 80 --eval_conf_thr 0.05
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from synthetic_e2e import build_cfg  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="full")
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--points", type=int, default=400)
    ap.add_argument("--image", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--elev_jitter", type=float, default=0.05)
    ap.add_argument("--eval_conf_thr", type=float, default=0.05)
    ap.add_argument("--reuse_run", required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.core import camera, metrics
    from onepose_st_tpu.core import so3
    from onepose_st_tpu.data import synthetic
    from onepose_st_tpu.models import OnePoseMatcher
    from onepose_st_tpu.sfm.map import SfMMap
    from onepose_st_tpu.solvers import ransac_pnp
    from onepose_st_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = build_cfg(args.preset)
    rng = np.random.default_rng(args.seed)
    scene = synthetic.make_scene(
        rng, n_points=args.points, n_frames=args.frames,
        image_hw=(args.image, args.image), focal=1.4 * args.image,
        object_size=0.25, elevation_jitter=args.elev_jitter,
    )
    frames = synthetic.render_sequence(scene, rng, sigma_px=1.8)
    eval_ids = np.arange(2, args.frames, 5)

    sfm_map = SfMMap.load(str(Path(args.reuse_run) / "map.npz"))
    import flax.serialization as ser

    model = OnePoseMatcher(cfg.matcher)
    L = cfg.matcher.n_points
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.asarray(frames[:1, ..., None]),
        jnp.zeros((1, L, 3)), jnp.zeros((1, L, cfg.matcher.coarse.d_model)),
        jnp.zeros((1, L, cfg.matcher.fine.d_model)),
    )
    with open(Path(args.reuse_run) / "matcher.msgpack", "rb") as f:
        trained = ser.from_bytes(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}, f.read(),
        )
    print(f"map {len(sfm_map.keypoints3d)} pts; eval frames {list(eval_ids)}")

    # map 3D accuracy: snap each map point to the nearest GT scene point
    from scipy.spatial import cKDTree

    tree = cKDTree(scene.points)
    d3, nn = tree.query(sfm_map.keypoints3d)
    print(f"map->GT 3D offset: median {np.median(d3)*1000:.2f} mm, "
          f"p90 {np.percentile(d3, 90)*1000:.2f} mm "
          f"(object size 250 mm)")
    snapped = scene.points[nn]

    ecfg = cfg_lib.replace(cfg.matcher, coarse_matching=cfg_lib.replace(
        cfg.matcher.coarse_matching, threshold=args.eval_conf_thr))
    eval_model = OnePoseMatcher(ecfg)
    apply = jax.jit(lambda v, im, k_, dc_, df_, m_: eval_model.apply(
        v, im, k_, dc_, df_, m_))
    k, dc, df, s, mask = sfm_map.padded(L)
    kB, dcB = jnp.asarray(k)[None], jnp.asarray(dc)[None]
    dfB, maskB = jnp.asarray(df)[None], jnp.asarray(mask)[None]
    # padded() may shuffle; map padded row -> original map row via NN in 3D
    tree_pad = cKDTree(sfm_map.keypoints3d)
    dpad, pad2map = tree_pad.query(k)

    snap_pad = snapped[pad2map]

    variants = {n: [] for n in ("A_base", "B_snap3d", "C_map3d_true2d")}
    px_err_map, px_err_gt = [], []
    for t in eval_ids:
        out = apply(
            trained, jnp.asarray(frames[t][None, ..., None]),
            kB, dcB, dfB, maskB,
        )
        valid = np.asarray(out["matches"].valid[0])
        i_ids = np.asarray(out["i_ids"][0])
        P3 = np.asarray(out["mkpts3d"][0])
        P2 = np.asarray(out["mkpts_query_f"][0])
        P3_snap = snap_pad[i_ids]
        G = np.eye(4)
        G[:3, :3] = Rotation.from_rotvec(scene.poses[t, :3]).as_matrix()
        G[:3, 3] = scene.poses[t, 3:]
        pose_gt6 = jnp.asarray(scene.poses[t])
        uv_map_gtpose, dep = camera.project(
            jnp.asarray(P3), pose_gt6, jnp.asarray(scene.Ks[t]))
        uv_snap_gtpose, _ = camera.project(
            jnp.asarray(P3_snap), pose_gt6, jnp.asarray(scene.Ks[t]))
        e_map = np.linalg.norm(np.asarray(uv_map_gtpose) - P2, axis=-1)[valid]
        e_gt = np.linalg.norm(np.asarray(uv_snap_gtpose) - P2, axis=-1)[valid]
        px_err_map.append(np.median(e_map))
        px_err_gt.append(np.median(e_gt))

        cases = {
            "A_base": (P3, P2),
            "B_snap3d": (P3_snap, P2),
            # map 3D used for PnP, but 2D comes from the TRUE feature
            # positions (snapped GT points projected with the GT pose):
            # isolates the map's 3D bias with perfect 2D localization
            "C_map3d_true2d": (P3, np.asarray(uv_snap_gtpose)),
        }
        inl_stats = None
        for name, (p3c, p2c) in cases.items():
            res = ransac_pnp(
                jax.random.key(int(t)), jnp.asarray(p3c), jnp.asarray(p2c),
                jnp.asarray(scene.Ks[t]), jnp.asarray(valid), cfg.pnp,
            )
            R, tr = so3.pose6_to_Rt(res.pose6)
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = np.asarray(R)
            T[:3, 3] = np.asarray(tr)
            r_err, t_err = metrics.query_pose_error(T, G)
            variants[name].append((r_err, t_err))
            if name == "A_base":
                # error structure over the accepted inlier set: iid noise
                # averages out in PnP, a nonzero mean vector (correlated
                # bias) does not
                inl = np.asarray(res.inliers) & valid
                dv = (P2 - np.asarray(uv_map_gtpose))[inl]
                inl_stats = (
                    int(inl.sum()),
                    float(np.median(np.linalg.norm(dv, axis=-1))),
                    float(np.linalg.norm(dv.mean(axis=0))),
                )
        n_i, med_i, bias_i = inl_stats
        variants.setdefault("inlier_bias", []).append(bias_i)
        print(f"  f{t:2d}: n={valid.sum():3d} inl={n_i:3d} "
              f"px_med(all) {px_err_map[-1]:.2f} "
              f"px_med(inl) {med_i:.2f} bias|mean dv| {bias_i:.2f} | "
              + " ".join(
                  f"{n}={variants[n][-1][0]:.2f}deg/{variants[n][-1][1]:.2f}cm"
                  for n in cases))

    print(f"\nmedian match px error vs map-point GT-pose projection: "
          f"{np.median(px_err_map):.3f} px")
    print(f"median match px error vs snapped-GT-point projection:   "
          f"{np.median(px_err_gt):.3f} px")
    for n, v in variants.items():
        if n == "inlier_bias":
            print(f"inlier mean-bias |dv|: median "
                  f"{np.median(np.asarray(v)):.3f} px")
            continue
        v = np.asarray(v)
        ap1 = float(np.mean((v[:, 0] < 1.0) & (v[:, 1] < 1.0)))
        print(f"{n}: median {np.median(v[:,0]):.3f} deg / "
              f"{np.median(v[:,1]):.3f} cm   1cm@1deg={ap1:.3f}")


if __name__ == "__main__":
    main()
