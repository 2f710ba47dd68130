"""Multi-object index merge CLI — the role of reference merge.py:191
(merging per-object annotations into data/datasets/train.json / val.json).

  python -m onepose_st_tpu.cli.merge_annotations \
      --data_root data/objects --maps_root outputs/maps \
      --out data/datasets/index.json [--val_seqs 1] [--names obj1 obj2]

Scans <data_root>/<obj>/ for *-annotate sequence dirs with a matching
<maps_root>/<obj>.npz map artifact and writes a single JSON index consumed
by `train_matcher --index`.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--maps_root", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--val_seqs", type=int, default=1,
                    help="held-out sequences per object (last N)")
    ap.add_argument("--names", nargs="*", default=None,
                    help="restrict to these object names")
    args = ap.parse_args(argv)

    from ..data.annotations import merge_objects, scan_objects

    entries = scan_objects(
        args.data_root, args.maps_root, val_fraction_seqs=args.val_seqs
    )
    if args.names:
        keep = set(args.names)
        entries = [e for e in entries if e.name in keep]
    if not entries:
        raise SystemExit("no objects found (need <obj>/*-annotate + <obj>.npz)")
    merge_objects(args.out, entries)
    for e in entries:
        print(
            f"{e.name}: {len(e.train_seq_dirs)} train / "
            f"{len(e.val_seq_dirs)} val sequences"
        )
    print(f"wrote {args.out} ({len(entries)} objects)")


if __name__ == "__main__":
    main()
