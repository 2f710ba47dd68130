"""SfM map-building CLI.

Framework analogue of reference `run.py +preprocess=sfm_demo` (demo.sh step
2): parse scan dirs -> pairs -> LoFTR matching -> triangulation + depth BA
-> filtered SfMMap artifact.

Usage:
  python -m onepose_st_tpu.cli.run_sfm --data_dir data/obj --out map.npz \
      [--loftr_ckpt ckpts/loftr] [--covis 10] [--min_rot 10]
"""
from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", default=None,
                    help="object dir containing <seq>-annotate subdirs")
    ap.add_argument("--objects_root", default=None,
                    help="multi-object mode (reference run.py object loop): "
                         "process every object subdir; with multiple hosts "
                         "(jax.distributed) each host takes its shard")
    ap.add_argument("--out", required=True,
                    help="output SfMMap .npz path (single object) or output "
                         "dir (--objects_root: one <obj>.npz per object)")
    ap.add_argument("--loftr_ckpt", default=None,
                    help="orbax checkpoint dir for the 2D-2D matcher")
    ap.add_argument("--covis", type=int, default=10)
    ap.add_argument("--min_rot", type=float, default=10.0)
    ap.add_argument("--down_ratio", type=int, default=5)
    ap.add_argument("--export_colmap", default=None,
                    help="optional dir to write a COLMAP binary model")
    ap.add_argument("--match_cache", default=None,
                    help="npz stage cache for raw pair matches (role of the "
                         "reference's raw_matches.h5); reused when present")
    ap.add_argument("--overwrite_cache", action="store_true")
    ap.add_argument("--fine_refine", action="store_true",
                    help="re-refine track observations with the LoFTR "
                         "fine-only pass before BA (reference "
                         "post-optimization fine matcher)")
    args = ap.parse_args()

    from ..utils import enable_compilation_cache

    enable_compilation_cache()

    from .. import config as cfg_lib

    cfg = cfg_lib.adapt_dtypes(cfg_lib.EngineConfig())
    cfg = cfg_lib.replace(
        cfg,
        sfm=cfg_lib.replace(
            cfg.sfm, covis_num=args.covis, min_rotation_deg=args.min_rot
        ),
    )

    if args.objects_root:
        from ..parallel import partition

        obj_dirs = sorted(
            d for d in Path(args.objects_root).iterdir()
            if d.is_dir() and list(d.glob("*-annotate"))
        )
        obj_dirs = partition.host_shard(obj_dirs)
        out_dir = Path(args.out)
        out_dir.mkdir(parents=True, exist_ok=True)
        print(f"this host builds {len(obj_dirs)} objects")
        for obj in obj_dirs:
            print(f"=== {obj.name}")
            cache = (
                out_dir / f"{obj.name}.matches.npz" if args.match_cache else None
            )
            _build_object(obj, out_dir / f"{obj.name}.npz", cfg, args, cache)
        return
    if not args.data_dir:
        raise SystemExit("need --data_dir or --objects_root")
    _build_object(
        Path(args.data_dir), Path(args.out), cfg, args,
        Path(args.match_cache) if args.match_cache else None,
    )


def _build_object(data_dir: Path, out_path: Path, cfg, args, cache_path=None):
    import jax
    import jax.numpy as jnp

    from ..data import colmap_io, parse_arkit
    from ..models import LoFTRMatcher
    from ..sfm import pairs as pairs_mod, pipeline
    from ..train.loop import load_checkpoint

    # collect all annotate sequences
    seq_dirs = sorted(Path(data_dir).glob("*-annotate"))
    if not seq_dirs:
        raise SystemExit(f"no *-annotate sequences under {data_dir}")
    seqs = [parse_arkit.load_sequence(s) for s in seq_dirs]
    images = np.concatenate([s.images[:: args.down_ratio] for s in seqs])
    poses = np.concatenate([s.poses[:: args.down_ratio] for s in seqs])
    Ks = np.concatenate([s.Ks[:: args.down_ratio] for s in seqs])
    corners = seqs[0].box_corners
    print(f"{len(images)} frames from {len(seqs)} sequences")

    from .. import config as cfg_lib

    if args.loftr_ckpt:
        # rebuild the matcher exactly as its checkpoint was trained
        saved = cfg_lib.load_model_config(args.loftr_ckpt)
        if saved is not None:
            if not isinstance(saved, cfg_lib.LoFTRConfig):
                raise SystemExit(
                    f"{args.loftr_ckpt}/model_config.json holds a "
                    f"{type(saved).__name__}, not a LoFTRConfig — is "
                    f"--loftr_ckpt pointing at a 2D-3D matcher checkpoint?"
                )
            cfg = cfg_lib.replace(cfg, loftr=cfg_lib.adapt_dtypes(saved))
    model = LoFTRMatcher(cfg.loftr)
    if args.loftr_ckpt:
        variables = load_checkpoint(args.loftr_ckpt)
    else:
        print("WARNING: untrained LoFTR weights (no --loftr_ckpt)")
        variables = jax.jit(model.init)(
            jax.random.key(0),
            jnp.asarray(images[:1, ..., None]),
            jnp.asarray(images[:1, ..., None]),
        )

    from ..sfm.pairs import poses_to_Rt

    Rs, ts = poses_to_Rt(poses)
    pair_list = pairs_mod.pairs_from_poses(
        Rs, ts, covis_num=cfg.sfm.covis_num,
        min_rotation_deg=cfg.sfm.min_rotation_deg,
    )
    print(f"{len(pair_list)} covisibility pairs")
    if cache_path is not None and cache_path.exists() and not args.overwrite_cache:
        pms = pipeline.load_pair_matches(cache_path)
        print(f"loaded {len(pms)} pair matches from {cache_path}")
    else:
        pms = pipeline.match_pairs_loftr(model, variables, images, pair_list)
        if cache_path is not None:
            pipeline.save_pair_matches(cache_path, pms)

    # descriptor sampling from the 2D-3D matcher's backbone would require a
    # trained matcher; at map build time we sample from the LoFTR backbone
    sample_desc = pipeline.make_descriptor_sampler(model, variables, images)

    refine_fn = None
    if args.fine_refine:
        refine_fn = lambda assigned, centers=None: (  # noqa: E731
            pipeline.refine_track_observations(
                model, variables, images, assigned, j_centers=centers
            )
        )
    sfm_map, diag = pipeline.build_map_from_matches(
        pms, poses, Ks, cfg, box_corners=corners,
        sample_descriptors=sample_desc,
        desc_dims=(cfg.loftr.coarse.d_model, cfg.loftr.fine.d_model),
        refine_observations=refine_fn,
    )
    print(dataclasses.asdict(diag))
    from ..sfm.map import make_reference_db

    make_reference_db(sfm_map, images, poses, Ks)  # detector DB views
    sfm_map.save(out_path)
    print(f"map: {len(sfm_map.keypoints3d)} points -> {out_path}")
    if args.export_colmap and not args.objects_root:
        colmap_io.export_map(
            args.export_colmap, poses, Ks, images.shape[1:3], sfm_map
        )
        print(f"COLMAP model -> {args.export_colmap}")


if __name__ == "__main__":
    main()
