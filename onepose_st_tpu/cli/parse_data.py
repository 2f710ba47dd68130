"""Data-parsing CLI — reference parse_scanned_data.py:232 and
parse_lm_real_data.py:32 as subcommands of one entry point.

  python -m onepose_st_tpu.cli.parse_data arkit --scanned_object_path <dir> \
      [--downsample_rate 1] [--hw 512]
  python -m onepose_st_tpu.cli.parse_data linemod --data_base_dir <dir> \
      --obj_id 1 --out_dir <dir> [--split train|test] [--add_detector_noise]

`arkit` expects the reference's ARKit capture layout (Frames.m4v,
ARposes.txt, Box.txt, Frames.txt) and writes the parsed sequence dirs
(color/, poses_ba/, intrin_ba/, ...) next to it; `linemod` converts a
LINEMOD real_train/real_test object into the same layout.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("arkit", help="parse an ARKit scanned-object capture")
    a.add_argument("--scanned_object_path", required=True,
                   help="object dir containing <seq>-annotate/ captures")
    a.add_argument("--downsample_rate", type=int, default=1)
    a.add_argument("--hw", type=int, default=512,
                   help="output crop size (reference uses 512)")

    lm = sub.add_parser("linemod", help="parse LINEMOD real data")
    lm.add_argument("--data_base_dir", required=True)
    lm.add_argument("--obj_id", type=int, required=True)
    lm.add_argument("--out_dir", required=True)
    lm.add_argument("--split", choices=["train", "test"], default="train")
    lm.add_argument("--onepose_id", default="0801")
    lm.add_argument("--add_detector_noise", action="store_true")
    lm.add_argument("--crop_size", type=int, default=256)

    args = ap.parse_args(argv)

    if args.cmd == "arkit":
        from pathlib import Path

        from ..data.parse_arkit import parse_sequence

        root = Path(args.scanned_object_path)
        if not root.is_dir():
            ap.error(f"not a directory: {root}")
        seq_dirs = sorted(
            d for d in root.iterdir()
            if d.is_dir() and (d / "Frames.m4v").exists()
        ) or [root]
        for d in seq_dirs:
            n = parse_sequence(d, downsample_rate=args.downsample_rate, hw=args.hw)
            print(f"{d}: {n} frames")
    else:
        from ..data.parse_linemod import parse_linemod_split

        seq_dir = parse_linemod_split(
            args.data_base_dir,
            args.obj_id,
            args.out_dir,
            split="train" if args.split == "train" else "test",
            onepose_id=args.onepose_id,
            add_detector_noise=args.add_detector_noise,
            crop_size=args.crop_size,
        )
        print(seq_dir)


if __name__ == "__main__":
    main()
