"""Covisibility pair generation.

Re-design of reference src/sfm_utils/{pairs_exhaustive_all.py,
pairs_from_index.py, pairs_from_poses.py}: three strategies over the scan
sequence. Host-side numpy — the pair list is tiny and feeds the batched
matcher.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation


def pairs_exhaustive(n_images: int) -> np.ndarray:
    """All unordered pairs [M, 2] (reference pairs_exhaustive_all.py:4)."""
    idx = np.arange(n_images)
    a, b = np.meshgrid(idx, idx, indexing="ij")
    keep = a < b
    return np.stack([a[keep], b[keep]], axis=-1).astype(np.int32)


def pairs_from_index(n_images: int, gap: int = 3) -> np.ndarray:
    """Consecutive-index pairs within `gap` (reference pairs_from_index.py:9)."""
    out = []
    for i in range(n_images):
        for j in range(i + 1, min(i + gap + 1, n_images)):
            out.append((i, j))
    return np.asarray(out, np.int32).reshape(-1, 2)


def pairs_from_poses(
    Rs: np.ndarray,
    ts: np.ndarray,
    covis_num: int = 10,
    min_rotation_deg: float = 10.0,
) -> np.ndarray:
    """Pose-covisibility pairs (reference pairs_from_poses.py:6-69).

    For each image: candidates with relative rotation > min_rotation_deg,
    ranked by camera-center distance, keep the covis_num nearest.
    """
    n = len(Rs)
    centers = -np.einsum("nij,ni->nj", Rs.transpose(0, 2, 1), ts)
    # pairwise rotation angle via trace(Ri^T Rj)
    RtR = np.einsum("nij,mik->nmjk", Rs, Rs)  # Ri^T Rj as [n, m, 3, 3]
    tr = np.trace(RtR, axis1=-2, axis2=-1)
    ang = np.rad2deg(np.arccos(np.clip((tr - 1) / 2, -1.0, 1.0)))
    dist = np.linalg.norm(centers[:, None] - centers[None, :], axis=-1)

    pairs = set()
    for i in range(n):
        ok = (ang[i] > min_rotation_deg) & (np.arange(n) != i)
        cand = np.nonzero(ok)[0]
        if len(cand) == 0:
            continue
        order = cand[np.argsort(dist[i, cand])][:covis_num]
        for j in order:
            pairs.add((min(i, int(j)), max(i, int(j))))
    if not pairs:
        return np.zeros((0, 2), np.int32)
    return np.asarray(sorted(pairs), np.int32)


def poses_to_Rt(poses6: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[F, 6] angle-axis++t -> (R [F,3,3], t [F,3]) in numpy."""
    R = Rotation.from_rotvec(poses6[:, :3]).as_matrix()
    return R.astype(poses6.dtype), poses6[:, 3:].copy()
