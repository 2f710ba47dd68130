"""Minimal PLY point-cloud I/O.

The role of reference src/utils/data_io.py:61-88 (colored detection PLY
dump) and the `colmap model_converter --output_type PLY` export
(sfm_utils/triangulation.py:303-305); the reader also consumes LINEMOD
`model_eval.ply` CAD models (parse_lm_real_data.py:149 copies them, the ADD
metric samples them). ASCII and binary_little_endian, vertices only.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

_PROP_TYPES = {
    "float": ("f4", 4), "float32": ("f4", 4), "double": ("f8", 8),
    "uchar": ("u1", 1), "uint8": ("u1", 1), "char": ("i1", 1),
    "short": ("i2", 2), "ushort": ("u2", 2),
    "int": ("i4", 4), "uint": ("u4", 4), "int32": ("i4", 4),
}


def save_ply(
    path: str | Path,
    points: np.ndarray,
    colors: np.ndarray | None = None,
    binary: bool = True,
) -> None:
    """Write [N, 3] points (+ optional [N, 3] uint8 colors)."""
    points = np.asarray(points, np.float32).reshape(-1, 3)
    n = len(points)
    header = ["ply"]
    header.append(
        "format binary_little_endian 1.0" if binary else "format ascii 1.0"
    )
    header += [f"element vertex {n}",
               "property float x", "property float y", "property float z"]
    if colors is not None:
        colors = np.asarray(colors, np.uint8).reshape(-1, 3)
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if binary:
            if colors is None:
                f.write(points.astype("<f4").tobytes())
            else:
                rec = np.empty(n, dtype=[("xyz", "<3f4"), ("rgb", "3u1")])
                rec["xyz"] = points
                rec["rgb"] = colors
                f.write(rec.tobytes())
        else:
            for i in range(n):
                row = " ".join(f"{v:.6f}" for v in points[i])
                if colors is not None:
                    row += " " + " ".join(str(int(v)) for v in colors[i])
                f.write((row + "\n").encode())


def load_ply(path: str | Path) -> tuple[np.ndarray, np.ndarray | None]:
    """Read vertices -> (points [N, 3] f32, colors [N, 3] u8 | None)."""
    with open(path, "rb") as f:
        # header is ASCII regardless of body format
        props: list[tuple[str, str, int]] = []
        n_vertex = 0
        fmt = "ascii"
        in_vertex = False
        while True:
            raw = f.readline()
            if raw == b"":  # EOF before end_header: malformed/truncated
                raise ValueError("truncated PLY header (no end_header)")
            line = raw.decode("ascii", "replace").strip()
            if not line:
                continue
            parts = line.split()
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                in_vertex = parts[1] == "vertex"
                if in_vertex:
                    n_vertex = int(parts[2])
            elif parts[0] == "property" and in_vertex:
                if parts[1] == "list":
                    raise ValueError("list property in vertex element")
                np_t, size = _PROP_TYPES[parts[1]]
                props.append((parts[2], np_t, size))
            elif parts[0] == "end_header":
                break

        names = [p[0] for p in props]
        if fmt == "ascii":
            rows = []
            for _ in range(n_vertex):
                rows.append(f.readline().split())
            arr = np.asarray(rows, np.float64)
            table = {name: arr[:, i] for i, name in enumerate(names)}
        else:
            endian = "<" if "little" in fmt else ">"
            dt = np.dtype([(name, endian + t) for name, t, _ in props])
            data = np.frombuffer(f.read(dt.itemsize * n_vertex), dt)
            table = {name: data[name] for name in names}

    pts = np.stack(
        [table["x"], table["y"], table["z"]], axis=1
    ).astype(np.float32)
    colors = None
    if all(c in table for c in ("red", "green", "blue")):
        colors = np.stack(
            [table["red"], table["green"], table["blue"]], axis=1
        ).astype(np.uint8)
    return pts, colors


def sample_cad_points(
    path: str | Path, n_points: int = 4000, rng: np.random.Generator | None = None
) -> np.ndarray:
    """Load a CAD PLY and subsample vertices for ADD/ADD-S evaluation
    (reference src/utils/sample_points_on_cad.py:6-88)."""
    pts, _ = load_ply(path)
    if len(pts) <= n_points:
        return pts
    rng = rng or np.random.default_rng(0)
    return pts[rng.choice(len(pts), n_points, replace=False)]
