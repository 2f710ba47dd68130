"""2D-2D LoFTR matcher training CLI (synthetic self-supervision).

The reference never trains LoFTR — it loads a downloaded checkpoint
(coarse_match_worker.py:23-26). This framework trains its own dense
matcher from scratch on homography-warped textures and rendered
multi-view splat pairs (train/loftr_data.py), so the SfM front-end and
the local-feature object detector have working weights with zero
external downloads.

Usage:
  python -m onepose_st_tpu.cli.train_loftr --ckpt_dir ckpts/loftr \
      --steps 20000 [--batch 4] [--image 256] [--preset full]
"""
from __future__ import annotations

import argparse

import numpy as np


def build_loftr_cfg(preset: str):
    from .. import config as cfg_lib

    if preset == "full":
        return cfg_lib.adapt_dtypes(cfg_lib.LoFTRConfig())
    if preset == "small":
        return cfg_lib.adapt_dtypes(cfg_lib.LoFTRConfig(
            backbone=cfg_lib.BackboneConfig(initial_dim=32, block_dims=(32, 48, 64)),
            coarse=cfg_lib.TransformerConfig(d_model=64, nhead=4, layer_iter_n=2),
            coarse_matching=cfg_lib.CoarseMatchingConfig(
                threshold=0.2, temperature=0.1,
                max_matches=256, train_pad_num_gt_min=64,
            ),
            fine=cfg_lib.FineMatchingConfig(window_size=5, d_model=32, nhead=4),
        ))
    # tiny: CPU smoke
    return cfg_lib.adapt_dtypes(cfg_lib.LoFTRConfig(
        backbone=cfg_lib.BackboneConfig(
            initial_dim=16, block_dims=(16, 24, 32), dtype="float32"
        ),
        coarse=cfg_lib.TransformerConfig(
            d_model=32, nhead=2, layer_iter_n=1, dtype="float32"
        ),
        coarse_matching=cfg_lib.CoarseMatchingConfig(
            threshold=0.2, temperature=0.1,
            max_matches=64, train_pad_num_gt_min=32,
        ),
        fine=cfg_lib.FineMatchingConfig(
            window_size=5, d_model=16, nhead=2, dtype="float32"
        ),
    ))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=4, help="per-device batch")
    ap.add_argument("--image", type=int, default=256, help="training image size")
    ap.add_argument("--preset", default="full", choices=["tiny", "small", "full"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--p_homography", type=float, default=0.5)
    ap.add_argument("--scenes", type=int, default=4,
                    help="multi-view scene bank size (0 = homography only)")
    ap.add_argument("--eval_pairs", type=int, default=16)
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in --ckpt_dir "
                         "(full optimizer state; --steps = additional steps)")
    args = ap.parse_args()

    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from .. import config as cfg_lib
    from ..models.loftr import LoFTRMatcher
    from ..parallel import make_mesh
    from ..train import loftr_data, loftr_train

    # On --resume an existing model_config.json is authoritative: the ckpt's
    # params were shaped by it, and rebuilding from --preset (default 'full')
    # would silently overwrite the correct metadata before the shape-mismatch
    # crash (advisor finding r1).
    saved = cfg_lib.load_model_config(args.ckpt_dir)
    if args.resume and saved is not None:
        if not isinstance(saved, cfg_lib.LoFTRConfig):
            raise SystemExit(
                f"{args.ckpt_dir}/model_config.json holds a "
                f"{type(saved).__name__}, not a LoFTRConfig — wrong ckpt dir?"
            )
        cfg = cfg_lib.adapt_dtypes(saved)
        print(f"config source: {args.ckpt_dir}/model_config.json (resume)")
    else:
        cfg = build_loftr_cfg(args.preset)
        cfg_lib.save_model_config(args.ckpt_dir, cfg)
    train_cfg = cfg_lib.replace(
        cfg_lib.TrainConfig(), batch_size_per_device=args.batch
    )
    mesh = make_mesh()
    n_dev = len(jax.devices())
    model = LoFTRMatcher(cfg)
    rng = np.random.default_rng(args.seed)
    hw = (args.image, args.image)

    bank = None
    if args.scenes > 0 and args.p_homography < 1.0:
        print(f"rendering {args.scenes}-scene multi-view bank ...")
        bank = loftr_data.make_scene_bank(rng, n_scenes=args.scenes, image_hw=hw)
    batches = loftr_data.loftr_batches(
        rng, cfg.backbone.coarse_stride, batch_size=args.batch * n_dev,
        image_hw=hw, bank=bank, p_homography=args.p_homography,
    )
    eval_rng = np.random.default_rng(args.seed + 1)
    eval_batch = next(loftr_data.loftr_batches(
        eval_rng, cfg.backbone.coarse_stride, batch_size=args.eval_pairs,
        image_hw=hw, bank=bank, p_homography=args.p_homography,
        photometric="none",
    ))

    def log_fn(s, r):
        print(
            f"step {s}: loss {r['loss']:.4f} "
            f"(coarse {r['loss_coarse']:.4f} fine {r['loss_fine']:.4f}) "
            f"{r['steps_per_sec']:.2f} it/s"
        )

    init = None
    if args.resume:
        from ..parallel import mesh as mesh_lib
        from ..train.loop import load_train_state
        from ..train.step import make_optimizer

        tx = make_optimizer(train_cfg, n_dev, steps_per_epoch=1000)
        init = load_train_state(args.ckpt_dir, tx)
        init = mesh_lib.replicate_pytree(init, mesh)
        print(f"resumed from step {int(init.step)} in {args.ckpt_dir}")

    state, _ = loftr_train.fit_loftr(
        cfg, train_cfg, model, batches, n_steps=args.steps, mesh=mesh,
        ckpt_dir=args.ckpt_dir, log_every=100, log_fn=log_fn, init=init,
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    stats = loftr_train.match_precision(model, variables, eval_batch)
    print(
        f"held-out match precision (<=1 cell): {stats['precision']:.3f} "
        f"over {stats['n_matches']:.1f} matches/pair"
    )
    print(f"done; checkpoints in {args.ckpt_dir}")


if __name__ == "__main__":
    main()
