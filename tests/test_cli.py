"""CLI entry points: parse_data and merge_annotations."""
import json

import numpy as np

from onepose_st_tpu.cli import merge_annotations, parse_data
from onepose_st_tpu.data.annotations import load_index
from onepose_st_tpu.data.parse_arkit import load_sequence

from test_parse_linemod import make_linemod_dir


def test_parse_data_linemod_cli(tmp_path, rng, capsys):
    make_linemod_dir(tmp_path, rng)
    parse_data.main([
        "linemod",
        "--data_base_dir", str(tmp_path),
        "--obj_id", "1",
        "--out_dir", str(tmp_path / "out"),
        "--split", "train",
    ])
    seq_dir = capsys.readouterr().out.strip().splitlines()[-1]
    data = load_sequence(seq_dir)
    assert len(data.images) == 4


def test_merge_annotations_cli(tmp_path, capsys):
    data_root = tmp_path / "objects"
    maps_root = tmp_path / "maps"
    maps_root.mkdir()
    for name in ["alpha", "beta", "nomap"]:
        for s in ["s1-annotate", "s2-annotate", "s3-annotate"]:
            (data_root / name / s).mkdir(parents=True)
        if name != "nomap":
            np.savez(maps_root / f"{name}.npz", dummy=np.zeros(1))
    merge_annotations.main([
        "--data_root", str(data_root),
        "--maps_root", str(maps_root),
        "--out", str(tmp_path / "index.json"),
        "--val_seqs", "1",
    ])
    entries = load_index(tmp_path / "index.json")
    assert [e.name for e in entries] == ["alpha", "beta"]
    assert all(len(e.train_seq_dirs) == 2 and len(e.val_seq_dirs) == 1
               for e in entries)
    # --names filter
    merge_annotations.main([
        "--data_root", str(data_root),
        "--maps_root", str(maps_root),
        "--out", str(tmp_path / "index2.json"),
        "--names", "beta",
    ])
    idx = json.loads((tmp_path / "index2.json").read_text())
    assert [o["name"] for o in idx["objects"]] == ["beta"]
