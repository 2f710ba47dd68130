"""Multi-object dataset index.

The role of reference merge.py (merge_anno:166 merging per-object COCO
train/val JSONs into data/datasets/train.json): a single JSON index listing
every object's map artifact and sequence directories with a train/val
split, consumed by the training CLI for multi-object training.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path


@dataclasses.dataclass
class ObjectEntry:
    name: str
    map_path: str                 # SfMMap npz
    train_seq_dirs: list[str]     # parsed sequence dirs (annotate)
    val_seq_dirs: list[str]       # held-out sequence dirs


def merge_objects(
    out_path: str | Path,
    entries: list[ObjectEntry],
) -> None:
    """Write the merged index (reference merge_anno writes train/val.json)."""
    data = {
        "version": 1,
        "objects": [dataclasses.asdict(e) for e in entries],
    }
    Path(out_path).write_text(json.dumps(data, indent=2))


def load_index(path: str | Path) -> list[ObjectEntry]:
    data = json.loads(Path(path).read_text())
    return [ObjectEntry(**e) for e in data["objects"]]


def scan_objects(
    data_root: str | Path,
    maps_root: str | Path,
    val_fraction_seqs: int = 1,
) -> list[ObjectEntry]:
    """Auto-build entries: every <obj>/ with *-annotate seqs and a map npz
    (reference merge.py:100-160 enumerates data dirs the same way). The
    last `val_fraction_seqs` sequences of each object become validation."""
    entries = []
    for obj_dir in sorted(Path(data_root).iterdir()):
        if not obj_dir.is_dir():
            continue
        seqs = sorted(str(s) for s in obj_dir.glob("*-annotate"))
        if not seqs:
            continue
        map_path = Path(maps_root) / f"{obj_dir.name}.npz"
        if not map_path.exists():
            continue
        n_val = min(val_fraction_seqs, max(len(seqs) - 1, 0))
        entries.append(
            ObjectEntry(
                name=obj_dir.name,
                map_path=str(map_path),
                train_seq_dirs=seqs[: len(seqs) - n_val],
                val_seq_dirs=seqs[len(seqs) - n_val:],
            )
        )
    return entries


def load_training_objects(entries, split: str = "train"):
    """Materialize (SfMMap, frames, poses, Ks) tuples for
    train.data.multi_object_batches."""
    import numpy as np

    from ..sfm.map import SfMMap
    from .parse_arkit import load_sequence

    out = []
    for e in entries:
        m = SfMMap.load(e.map_path)
        dirs = e.train_seq_dirs if split == "train" else e.val_seq_dirs
        if not dirs:
            continue
        seqs = [load_sequence(d) for d in dirs]
        out.append(
            (
                m,
                np.concatenate([s.images for s in seqs]),
                np.concatenate([s.poses for s in seqs]),
                np.concatenate([s.Ks for s in seqs]),
            )
        )
    return out
