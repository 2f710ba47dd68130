"""Per-frame diagnostic for the wild-sequence transfer gap.

Reuses a saved full_frame_e2e run (map + trained matcher) and, for every
clean wild frame, prints the camera-object geometry (effective viewing
elevation/azimuth of the eye->object ray, object-center offset in the
frame, crop scale) next to the oracle-crop matcher result (matches,
inliers, rotation/translation error). The goal is to attribute the
contiguous failure segments (e.g. r3f frames 7-19) to a concrete
variable: viewpoint hole, framing, scale, or appearance.

  python examples/wild_diag.py --reuse_run runs/ffe_r3f
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from synthetic_e2e import build_cfg


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="full")
    ap.add_argument("--steps", type=int, default=0)  # unused (reuse only)
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--scan_frames", type=int, default=160)
    ap.add_argument("--scan_rings", type=float, nargs="+",
                    default=[0.08, -0.05, -0.18, -0.31])
    ap.add_argument("--points", type=int, default=800)
    ap.add_argument("--bg_points", type=int, default=700)
    ap.add_argument("--full_image", type=int, default=512)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--wander", type=float, default=0.12)
    ap.add_argument("--eval_conf_thr", type=float, default=0.05)
    ap.add_argument("--reuse_run", default="runs/ffe_r3f")
    ap.add_argument("--policy", default="raw", choices=["raw", "shift", "visq"],
                    help="crop-box policy for the oracle path: raw projected "
                         "square box (black warp-fill when off-frame); "
                         "shift-into-frame (the real detector path); or "
                         "visible-region re-square (intersect the projected "
                         "box with the frame, square that)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.serialization as ser
    from scipy.spatial.transform import Rotation

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.core import camera
    from onepose_st_tpu.data import images as img_ops, synthetic
    from onepose_st_tpu.infer.pipeline import PoseEstimator
    from onepose_st_tpu.models import OnePoseMatcher
    from onepose_st_tpu.sfm.map import SfMMap
    from onepose_st_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = build_cfg(args.preset)
    rng = np.random.default_rng(args.seed)

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
    )
    scene, wscene = scan.scene, wild.scene
    amps = rng.uniform(
        0.3, 1.0, size=args.points + len(scan.bg_points)
    ).astype(np.float32)
    scan_full = synthetic.render_wild_sequence(
        scan, rng, sigma_px=2.0, ground_grid=True, amps=amps)
    frames_full = synthetic.render_wild_sequence(
        wild, rng, sigma_px=2.0, ground_grid=True, amps=amps)

    ext = np.array([0.22, 0.22, 0.22], np.float32)
    corners = np.asarray(camera.box3d_corners(jnp.asarray(ext)))
    crop_hw = (args.crop, args.crop)

    eval_cfg = cfg_lib.replace(cfg, matcher=cfg_lib.replace(
        cfg.matcher, coarse_matching=cfg_lib.replace(
            cfg.matcher.coarse_matching, threshold=args.eval_conf_thr)))
    model = OnePoseMatcher(eval_cfg.matcher)
    L = eval_cfg.matcher.n_points
    Cc = eval_cfg.matcher.coarse.d_model
    Cf = eval_cfg.matcher.fine.d_model
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, args.crop, args.crop, 1)),
        jnp.zeros((1, L, 3)), jnp.zeros((1, L, Cc)), jnp.zeros((1, L, Cf)),
    )
    sfm_map = SfMMap.load(str(Path(args.reuse_run) / "map.npz"))
    with open(Path(args.reuse_run) / "matcher.msgpack", "rb") as f:
        trained = ser.from_bytes(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}, f.read())
    est = PoseEstimator(eval_cfg, model, trained, sfm_map, None)

    # scan-view stats for reference: effective eye->object ray per scan frame
    def ray_geom(Rs, ts, target):
        eye = -np.einsum("fji,fj->fi", Rs, ts)      # camera center, world
        d = target[None] - eye if target.ndim == 1 else target - eye
        dist = np.linalg.norm(d, axis=1)
        dn = d / dist[:, None]
        elev = np.degrees(np.arcsin(-dn[:, 1]))     # y-down world
        azim = np.degrees(np.arctan2(dn[:, 2], dn[:, 0]))
        return elev, azim, dist

    s_elev, s_azim, s_dist = ray_geom(scene.Rs, scene.ts, np.zeros(3))
    print(f"scan coverage: elev [{s_elev.min():.1f}, {s_elev.max():.1f}] deg "
          f"(rings {sorted(set(np.round(s_elev, 0)))[:8]}...), "
          f"dist [{s_dist.min():.2f}, {s_dist.max():.2f}]")

    w_elev, w_azim, w_dist = ray_geom(wscene.Rs, wscene.ts, np.zeros(3))

    print(f"{'f':>3} {'elev':>6} {'azim':>7} {'dist':>5} {'boxpx':>5} "
          f"{'off':>5} {'clip':>4} {'match':>5} {'inl':>4} {'rot':>7} {'t_cm':>6}")
    t0 = time.time()
    rows = []
    for f in range(args.frames):
        uv_box, _ = camera.project(
            jnp.asarray(corners), jnp.asarray(wscene.poses[f]),
            jnp.asarray(wscene.Ks[f]))
        raw = np.asarray(camera.bbox_from_points(uv_box))
        if args.policy == "visq":
            H = W = args.full_image
            raw = np.array([max(raw[0], 0.0), max(raw[1], 0.0),
                            min(raw[2], float(W)), min(raw[3], float(H))],
                           np.float32)
        box = camera.square_box(jnp.asarray(raw), pad_ratio=0.1)
        if args.policy in ("shift", "visq"):
            from onepose_st_tpu.infer.detector import shift_box_into_frame
            box = jnp.asarray(shift_box_into_frame(
                np.asarray(box), (args.full_image, args.full_image)))
        b = np.asarray(box)
        side = b[2] - b[0]
        cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
        off = np.hypot(cx - args.full_image / 2, cy - args.full_image / 2)
        # fraction of box area clipped by the frame
        ix = max(0.0, min(b[2], args.full_image) - max(b[0], 0))
        iy = max(0.0, min(b[3], args.full_image) - max(b[1], 0))
        clip = 1.0 - ix * iy / (side * side)
        crop_f, A3_f = img_ops.crop_image(frames_full[f], b, crop_hw)
        K_crop_f = np.asarray(
            camera.crop_K(jnp.asarray(wscene.Ks[f]), box, crop_hw))
        r = est.estimate(crop_f, K_crop_f, frame_idx=f)
        G = np.eye(4)
        G[:3, :3] = Rotation.from_rotvec(wscene.poses[f, :3]).as_matrix()
        G[:3, 3] = wscene.poses[f, 3:]
        dR = r.T44[:3, :3] @ G[:3, :3].T
        rot = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        tcm = np.linalg.norm(r.T44[:3, 3] - G[:3, 3]) * 100
        rows.append((f, w_elev[f], w_azim[f], w_dist[f], side, off, clip,
                     r.n_matches, r.n_inliers, rot, tcm))
        print(f"{f:3d} {w_elev[f]:6.1f} {w_azim[f]:7.1f} {w_dist[f]:5.2f} "
              f"{side:5.0f} {off:5.0f} {clip:4.2f} {r.n_matches:5d} "
              f"{r.n_inliers:4d} {rot:7.2f} {tcm:6.2f}")
    print(f"({args.frames} frames in {time.time()-t0:.1f}s)")

    rows = np.array(rows)
    bad = rows[:, 9] > 3.0   # rot err > 3 deg
    print(f"\nbad frames (rot>3deg): {int(bad.sum())}/{args.frames}")
    for name, col in [("elev", 1), ("dist", 3), ("box_side", 4),
                      ("center_off", 5), ("clip_frac", 6), ("matches", 7)]:
        print(f"  {name:>10}: bad median {np.median(rows[bad, col]):8.2f}  "
              f"good median {np.median(rows[~bad, col]):8.2f}")


if __name__ == "__main__":
    main()
