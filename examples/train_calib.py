"""Train the single-image calibration net to usefulness (r1 verdict item 8).

The reference vendors a DenseNet trained on SUN360 (calib/demo.py:108,
consumed by data_utils.infer_K:313-330); no weights exist here, so we train
CalibNet from scratch on perspective-grid renders whose roll / rho / vFoV
are known in closed form (calib/train.perspective_calib_batch). Reports
held-out bin accuracy and median focal error %, and saves a checkpoint that
run_inference --calib_ckpt / full_frame_e2e can consume.

  python examples/train_calib.py --steps 3000 --out ckpts/calib
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_cfg(preset: str):
    from onepose_st_tpu.calib.model import CalibConfig

    if preset == "full":
        return CalibConfig()  # densenet-121-ish default
    if preset == "small":
        return CalibConfig(
            growth_rate=16, block_layers=(4, 8, 12, 8), initial_dim=48,
            head_dense_layers=2, head_hidden=256, image_size=160,
        )
    return CalibConfig(  # tiny: CPU smoke
        growth_rate=8, block_layers=(2, 4), initial_dim=16,
        head_dense_layers=1, head_hidden=32, image_size=64, dtype="float32",
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="small", choices=["tiny", "small", "full"])
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="ckpts/calib")
    ap.add_argument("--eval_n", type=int, default=128)
    ap.add_argument("--render_size", type=int, default=512,
                    help="render training images at this resolution and "
                         "downsample to the net input (deployment frames "
                         "are 512 px resized down — thin grid lines must "
                         "antialias the same way)")
    ap.add_argument("--wild_frac", type=float, default=0.3,
                    help="fraction of each batch from the wild-scene "
                         "deployment renderer (calib/train."
                         "wild_scene_calib_batch)")
    args = ap.parse_args()

    import jax

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.calib import train as calib_train
    from onepose_st_tpu.calib.calibrate import calibrate_image
    from onepose_st_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}")
    cfg = build_cfg(args.preset)
    size = cfg.image_size
    rng = np.random.default_rng(args.seed)

    bkw = dict(
        size=size, render_size=args.render_size, wild_frac=args.wild_frac
    )

    def batches():
        # threaded prefetch: high-res render + downsample is host work that
        # would otherwise serialize with the device step
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=4)

        def worker(wrng):
            while True:
                q.put(calib_train.perspective_calib_batch(
                    wrng, args.batch, **bkw
                ))

        for w in range(2):
            threading.Thread(
                target=worker, args=(np.random.default_rng([args.seed, w]),),
                daemon=True,
            ).start()
        while True:
            yield q.get()

    t0 = time.time()
    model, variables, losses = calib_train.fit_calib(
        cfg, batches(), n_steps=args.steps, lr=args.lr,
        log_fn=lambda s, l: print(f"  step {s}: nll {l:.4f}", flush=True),
        ckpt_dir=args.out,
    )
    print(f"trained {args.steps} steps in {time.time()-t0:.1f}s "
          f"(final nll {losses[-1]:.4f})")
    cfg_lib.save_model_config(args.out, cfg)

    # --- held-out eval: perspective domain AND the wild deployment domain --
    def run_eval(make_batch, label):
        erng = np.random.default_rng(args.seed + 999)
        focal_errs, roll_errs, rho_errs, vfov_bin_hits = [], [], [], []
        n_done = 0
        while n_done < args.eval_n:
            tb = make_batch(erng, 16)
            for b in range(16):
                res = calibrate_image(model, variables, tb.image[b])
                f_gt = size / 2 / math.tan(math.radians(tb.vfov_deg[b]) / 2)
                focal_errs.append(abs(res.focal_length_pixels - f_gt) / f_gt)
                roll_errs.append(abs(res.roll - tb.roll_deg[b]))
                rho_errs.append(abs(res.rho / 0.35 - tb.rho[b]))
                vfov_bin_hits.append(
                    abs(res.vertical_fov - tb.vfov_deg[b]) <= 85.0 / 255 * 3
                )
                n_done += 1
        rep = {
            "median_focal_err_pct": round(100 * float(np.median(focal_errs)), 2),
            "p90_focal_err_pct": round(100 * float(np.percentile(focal_errs, 90)), 2),
            "median_roll_err_deg": round(float(np.median(roll_errs)), 2),
            "median_rho_err": round(float(np.median(rho_errs)), 3),
            "vfov_within_3bins": round(float(np.mean(vfov_bin_hits)), 3),
            "n_eval": n_done,
        }
        print(f"held-out calibration [{label}]:", json.dumps(rep))
        return rep

    rep = {
        "perspective": run_eval(
            lambda r, n: calib_train.perspective_calib_batch(
                r, n, size=size, render_size=args.render_size, wild_frac=0.0
            ),
            "perspective",
        ),
        "wild": run_eval(
            lambda r, n: calib_train.wild_scene_calib_batch(
                r, n, size=size, render_size=args.render_size
            ),
            "wild deployment",
        ),
    }
    (Path(args.out) / "eval.json").write_text(json.dumps(rep, indent=1))
    print(f"checkpoint + model_config.json in {args.out}")


if __name__ == "__main__":
    main()
