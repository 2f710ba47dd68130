"""Point-cloud post-filters for the SfM map.

Re-design of reference src/sfm_utils/postprocess/{filter_points.py,
filter_tkl.py}: crop to the annotated 3D box, auto-select a track-length
threshold to cap the map size, and merge near-duplicate points. Host-side
numpy over at most ~100k points.
"""
from __future__ import annotations

import numpy as np


def filter_by_bbox(points: np.ndarray, corners: np.ndarray, padding: float = 0.0) -> np.ndarray:
    """Inside-test against an oriented 3D box given by its 8 corners.

    Corner layout follows core.camera.box3d_corners (signs of the axes).
    Returns a bool mask. (reference filter_points.filter_bbox:172-216 —
    half-space tests against the box planes.)
    """
    center = corners.mean(axis=0)
    # box axes from corner differences: corners ordered by sign pattern
    # (-,-,-) is index 0; (+,-,-) index 4; (-,+,-) index 2; (-,-,+) index 1
    ax = corners[4] - corners[0]
    ay = corners[2] - corners[0]
    az = corners[1] - corners[0]
    half = np.array(
        [np.linalg.norm(ax), np.linalg.norm(ay), np.linalg.norm(az)]
    ) / 2.0 + padding
    axes = np.stack(
        [ax / np.linalg.norm(ax), ay / np.linalg.norm(ay), az / np.linalg.norm(az)]
    )
    local = (points - center) @ axes.T
    return np.all(np.abs(local) <= half + 1e-9, axis=-1)


def select_track_length_threshold(
    track_lengths: np.ndarray, max_points: int, start: int = 3
) -> int:
    """Smallest threshold keeping at most max_points tracks
    (reference filter_tkl.get_tkl:37)."""
    thr = start
    while np.sum(track_lengths >= thr) > max_points:
        thr += 1
    return thr


def merge_close_points(
    points: np.ndarray, radius: float = 1e-3, extra: list[np.ndarray] | None = None
):
    """Merge points within `radius` (grid hash, averaging positions and any
    aligned extra arrays). Returns (merged_points, merged_extras, group_ids).

    group_ids[i] = output index of input point i
    (reference filter_points.merge:260-299).
    """
    q = np.round(points / radius).astype(np.int64)
    _, first_idx, inverse = np.unique(
        q, axis=0, return_index=True, return_inverse=True
    )
    n_out = len(first_idx)
    counts = np.bincount(inverse, minlength=n_out).astype(np.float64)
    merged = np.zeros((n_out, points.shape[1]), np.float64)
    np.add.at(merged, inverse, points)
    merged = (merged / counts[:, None]).astype(points.dtype)
    merged_extra = []
    if extra:
        for arr in extra:
            acc = np.zeros((n_out,) + arr.shape[1:], np.float64)
            np.add.at(acc, inverse, arr)
            merged_extra.append((acc / counts.reshape((-1,) + (1,) * (arr.ndim - 1))).astype(arr.dtype))
    return merged, merged_extra, inverse
