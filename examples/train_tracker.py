"""Train the learned CoTracker-style point tracker on synthetic clips.

The reference consumes CoTracker2 as a pretrained submodule checkpoint; no
weights ship with the repo, so our tracker is trained from scratch on
procedurally generated clips with exact ground-truth tracks
(train/tracker_data.py). Runs on a single TPU chip (or CPU with --preset
tiny). The saved weights load via
`infer.tracker.LearnedTemporalTracker.load(cfg, path)` and plug into
`infer.tracker.refine_sequence` as the temporal-refinement backend.

  python examples/train_tracker.py --preset small --steps 2000
  python examples/train_tracker.py --preset full --steps 20000
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_cfg(preset: str):
    from onepose_st_tpu import config as cfg_lib

    if preset == "full":
        return cfg_lib.adapt_dtypes(cfg_lib.TrackerConfig())
    if preset == "small":
        return cfg_lib.adapt_dtypes(cfg_lib.TrackerConfig(
            feat_dim=64, levels=3, radius=3, d_model=128, nhead=4,
            num_blocks=2, update_iters=3,
        ))
    return cfg_lib.TrackerConfig(  # tiny (CPU smoke)
        window=4, feat_dim=32, levels=2, radius=2, d_model=32, nhead=2,
        num_blocks=1, update_iters=2, dtype="float32",
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="small", choices=["tiny", "small", "full"])
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image", type=int, default=256)
    ap.add_argument("--points", type=int, default=128)
    ap.add_argument("--motion", type=float, default=3.0)
    ap.add_argument("--splat_prob", type=float, default=0.5,
                    help="fraction of training clips from the splat-scene "
                         "renderers (the pose pipeline's deployment domain; "
                         "r2's homography-only tracker was OOD on them)")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="tracker_ckpt")
    ap.add_argument("--eval_every", type=int, default=500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from onepose_st_tpu.infer.tracker import LearnedTemporalTracker
    from onepose_st_tpu.models.tracker import CoTrackerNet
    from onepose_st_tpu.train import tracker_data, tracker_train
    from onepose_st_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = build_cfg(args.preset)
    if args.preset == "tiny":
        args.image, args.points = min(args.image, 96), min(args.points, 32)
    model = CoTrackerNet(cfg)
    T, H = cfg.window, args.image

    rng = np.random.default_rng(args.seed)
    kw = dict(T=T, H=H, W=H, n_points=args.points, motion=args.motion,
              splat_prob=args.splat_prob)
    sample = tracker_data.make_batch(rng, args.batch, **kw)
    tx = tracker_train.make_optimizer(lr=args.lr, steps=args.steps)
    state = tracker_train.init_state(jax.random.key(args.seed), model, tx, sample)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"preset={args.preset} params={n_params/1e6:.2f}M window={T} "
          f"image={H} points={args.points}", flush=True)

    jitted = jax.jit(
        tracker_train.train_step, static_argnames=("model", "tx", "cfg")
    )
    apply_jit = jax.jit(model.apply)

    def evaluate(params, seed=12345):
        trng = np.random.default_rng(seed)
        tb = tracker_data.make_batch(trng, args.batch, **kw)
        out = apply_jit(
            {"params": params},
            jnp.asarray(tb["frames"]), jnp.asarray(tb["query_uv"]),
            jnp.asarray(tb["query_frame"]), jnp.asarray(tb["point_mask"]),
        )
        vis = tb["gt_vis"]
        err = np.linalg.norm(np.asarray(out["coords"]) - tb["gt_uv"], axis=-1)
        base = np.linalg.norm(tb["query_uv"][:, None] - tb["gt_uv"], axis=-1)
        pred_vis = np.asarray(out["vis_logit"]) > 0
        vis_acc = (pred_vis == vis).mean()
        return {
            "epe_vis": float(err[vis].mean()),
            "epe_identity_baseline": float(base[vis].mean()),
            "lt1px": float((err[vis] < 1.0).mean()),
            "lt3px": float((err[vis] < 3.0).mean()),
            "vis_acc": float(vis_acc),
        }

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    from onepose_st_tpu import config as cfg_lib

    cfg_lib.save_model_config(out_dir, cfg)  # consumers rebuild exactly this
    hist = open(out_dir / "history.jsonl", "w")
    prefetch = tracker_data.BatchPrefetcher(args.seed + 1, args.batch, **kw)
    t0 = time.time()
    for i in range(args.steps):
        batch = prefetch.next()
        batch_d = {k: jnp.asarray(v) for k, v in batch.items()}
        state, sc = jitted(state, batch_d, model=model, tx=tx, cfg=cfg)
        if i % 50 == 0 or i == args.steps - 1:
            rec = {"step": i, **{k: float(v) for k, v in sc.items()},
                   "it_s": (i + 1) / (time.time() - t0)}
            print(rec, flush=True)
            hist.write(json.dumps(rec) + "\n")
            hist.flush()
        if (i + 1) % args.eval_every == 0 or i == args.steps - 1:
            ev = evaluate(state.params)
            print({"eval": ev, "step": i}, flush=True)
            hist.write(json.dumps({"step": i, "eval": ev}) + "\n")
            hist.flush()
    hist.close()
    prefetch.close()

    LearnedTemporalTracker.save_params(
        {"params": state.params}, out_dir / "tracker.msgpack"
    )
    print(f"saved {out_dir}/tracker.msgpack")


if __name__ == "__main__":
    main()
