"""Direct px-error measurement of the trained 2D-2D LoFTR matcher.

VERDICT r2 item 3: the map's ~1.7 px reprojection floor was attributed to
the matcher's coarse accuracy. This measures it without SfM in the loop:

  1. homography protocol — match each frame against a known-warp version
     of itself; GT correspondence is exact (uv1 = H uv0), so the error
     histogram of mkpts1_f (and mkpts1_c) is exact matcher error;
  2. multi-view protocol — orbit covis pairs; matches anchored to the
     nearest rendered object-point projection in image0 give an estimated
     GT via that point's projection in image1 (valid because splats are
     compact: a real match sits on a blob).

Reports median/p90 for coarse-only and fine-refined coordinates — the
split says whether the floor is coarse cell assignment or fine
refinement.

  python examples/match_error_eval.py --loftr_ckpt ckpts/loftr_full_r2
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--loftr_ckpt", required=True)
    ap.add_argument("--frames", type=int, default=48,
                    help="48 -> 7.5deg orbit steps; covis pairs then span "
                         "10-25deg like the e2e scan pair distribution")
    ap.add_argument("--max_warp_deg", type=float, default=10.0)
    ap.add_argument("--points", type=int, default=400)
    ap.add_argument("--image", type=int, default=256)
    ap.add_argument("--pairs", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.data import synthetic
    from onepose_st_tpu.models import LoFTRMatcher
    from onepose_st_tpu.sfm import pairs as pairs_mod
    from onepose_st_tpu.train.loop import load_checkpoint
    from onepose_st_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(args.seed)
    lcfg = cfg_lib.adapt_dtypes(cfg_lib.load_model_config(args.loftr_ckpt))
    model = LoFTRMatcher(lcfg)
    lvars = load_checkpoint(args.loftr_ckpt)

    scene = synthetic.make_scene(
        rng, n_points=args.points, n_frames=args.frames,
        image_hw=(args.image, args.image),
    )
    frames = synthetic.render_sequence(scene, rng, sigma_px=2.5)

    fwd = jax.jit(lambda v, a, b: {
        k: o[k] for o in [model.apply(v, a, b)]
        for k in ("mkpts0_c", "mkpts1_c", "mkpts1_f", "valid")
    })

    def stats(name, errs):
        e = np.concatenate(errs) if errs else np.zeros(0)
        if len(e) == 0:
            print(f"{name}: no matches")
            return
        print(f"{name}: n={len(e)} median={np.median(e):.3f}px "
              f"mean={e.mean():.3f}px p90={np.percentile(e, 90):.3f}px "
              f"<1px={100 * (e < 1).mean():.0f}% <2px={100 * (e < 2).mean():.0f}%")

    # --- 1. homography protocol (exact GT) ---------------------------------
    errs_c, errs_f = [], []
    S = args.image
    for f in range(0, args.frames, max(1, args.frames // 8)):
        ang = rng.uniform(-args.max_warp_deg, args.max_warp_deg)
        sc = rng.uniform(0.92, 1.08)
        tx, ty = rng.uniform(-0.08 * S, 0.08 * S, size=2)
        M = cv2.getRotationMatrix2D((S / 2, S / 2), ang, sc)
        M[:, 2] += (tx, ty)
        warped = cv2.warpAffine(frames[f], M, (S, S), flags=cv2.INTER_LINEAR)
        H3 = np.concatenate([M, [[0, 0, 1]]]).astype(np.float64)
        out = fwd(lvars, jnp.asarray(frames[f][None, ..., None]),
                  jnp.asarray(warped[None, ..., None]))
        val = np.asarray(out["valid"][0])
        uv0 = np.asarray(out["mkpts0_c"][0])[val]
        uv1c = np.asarray(out["mkpts1_c"][0])[val]
        uv1f = np.asarray(out["mkpts1_f"][0])[val]
        gt = uv0 @ H3[:2, :2].T + H3[:2, 2]
        inb = ((gt > 8).all(1) & (gt < S - 8).all(1))
        errs_c.append(np.linalg.norm(uv1c[inb] - gt[inb], axis=-1))
        errs_f.append(np.linalg.norm(uv1f[inb] - gt[inb], axis=-1))
    print("== homography protocol (exact GT) ==")
    stats("coarse", errs_c)
    stats("fine  ", errs_f)

    # --- 2. multi-view protocol (blob-anchored GT estimate) ----------------
    Rs, ts = pairs_mod.poses_to_Rt(scene.poses)
    plist = pairs_mod.pairs_from_poses(Rs, ts, covis_num=6)[: args.pairs]
    errs_c, errs_f, anchor_off = [], [], []
    for i, j in plist:
        out = fwd(lvars, jnp.asarray(frames[i][None, ..., None]),
                  jnp.asarray(frames[j][None, ..., None]))
        val = np.asarray(out["valid"][0])
        uv0 = np.asarray(out["mkpts0_c"][0])[val]
        uv1c = np.asarray(out["mkpts1_c"][0])[val]
        uv1f = np.asarray(out["mkpts1_f"][0])[val]
        vis = scene.visible[i] & scene.visible[j]
        p0 = scene.uv[i][vis]
        p1 = scene.uv[j][vis]
        if len(p0) == 0 or len(uv0) == 0:
            continue
        d = np.linalg.norm(uv0[:, None] - p0[None], axis=-1)
        nn = d.argmin(axis=1)
        near = d[np.arange(len(uv0)), nn] < 3.0  # match sits on this blob
        gt = p1[nn[near]] + (uv0[near] - p0[nn[near]])  # local translation
        errs_c.append(np.linalg.norm(uv1c[near] - gt, axis=-1))
        errs_f.append(np.linalg.norm(uv1f[near] - gt, axis=-1))
        anchor_off.append(d[np.arange(len(uv0)), nn][near])
    print("== multi-view protocol (blob-anchored estimate) ==")
    stats("coarse", errs_c)
    stats("fine  ", errs_f)
    if anchor_off:
        a = np.concatenate(anchor_off)
        print(f"anchor offset (uv0 vs blob center): median={np.median(a):.2f}px")


if __name__ == "__main__":
    main()
