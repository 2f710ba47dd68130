"""Point-cloud post-filters for the SfM map.

Re-design of reference src/sfm_utils/postprocess/{filter_points.py,
filter_tkl.py}: crop to the annotated 3D box, auto-select a track-length
threshold to cap the map size, and merge near-duplicate points. Host-side
numpy over at most ~100k points.
"""
from __future__ import annotations

import numpy as np


def box_edges_from_corners(corners: np.ndarray) -> np.ndarray:
    """[8, 3] parallelepiped corners (ANY vertex ordering) -> [3, 3] edge
    vectors at corners[0].

    The offsets from corner 0 are {0, e1, e2, e3, e1+e2, e1+e3, e2+e3,
    e1+e2+e3}; the edges are exactly the offsets not expressible as the sum
    of two other nonzero offsets. Ordering-independent on purpose: the
    ARKit parser (parse_arkit.CORNER_SIGNS), the LINEMOD parser, and
    core.camera.box3d_corners all enumerate sign patterns differently.
    """
    v = corners[1:] - corners[0]  # [7, 3]
    atol = 1e-6 * float(np.abs(v).max())
    edges = []
    for i in range(7):
        is_sum = any(
            a != i and b != i and np.allclose(v[a] + v[b], v[i], atol=atol)
            for a in range(7)
            for b in range(a + 1, 7)
        )
        if not is_sum:
            edges.append(v[i])
    if len(edges) != 3:
        raise ValueError(
            f"corners do not form a parallelepiped (got {len(edges)} edges)"
        )
    return np.stack(edges)


def filter_by_bbox(points: np.ndarray, corners: np.ndarray, padding: float = 0.0) -> np.ndarray:
    """Inside-test against an oriented 3D box given by its 8 corners, in any
    vertex ordering. Returns a bool mask.
    (reference filter_points.filter_bbox:172-216 — half-space tests against
    the box planes.)
    """
    center = corners.mean(axis=0)
    edges = box_edges_from_corners(corners)
    lens = np.linalg.norm(edges, axis=-1)
    axes = edges / lens[:, None]
    half = lens / 2.0 + padding
    local = (points - center) @ axes.T
    return np.all(np.abs(local) <= half + 1e-9, axis=-1)


def select_track_length_threshold(
    track_lengths: np.ndarray, max_points: int, start: int = 3
) -> int:
    """Smallest threshold keeping at most max_points tracks
    (reference filter_tkl.get_tkl:37).

    Unlike COLMAP's unbounded track lengths, ours are capped at
    max_track_length, so whole cohorts tie at the cap; when even the
    maximum-length cohort exceeds max_points the loop must stop there
    (returning cap+1 would empty the map — r1 scale-test finding). The
    caller breaks the remaining tie by score (see cap_points_by_score).
    """
    if len(track_lengths) == 0:
        return start
    thr = start
    top = int(track_lengths.max())
    while thr < top and np.sum(track_lengths >= thr) > max_points:
        thr += 1
    return thr


def cap_points_by_score(
    keep: np.ndarray, scores: np.ndarray, max_points: int
) -> np.ndarray:
    """Deterministically trim a keep-mask to max_points by descending score
    (ties broken by index). Used when the track-length threshold alone
    cannot discriminate (length-capped cohorts)."""
    n_keep = int(keep.sum())
    if n_keep <= max_points:
        return keep
    ids = np.nonzero(keep)[0]
    order = np.argsort(-scores[ids], kind="stable")
    out = np.zeros_like(keep)
    out[ids[order[:max_points]]] = True
    return out


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
