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
    seq_ids: np.ndarray | None = None,
    block: int = 256,
) -> np.ndarray:
    """Pose-covisibility pairs (reference pairs_from_poses.py:6-69).

    For each image: candidates with relative rotation > min_rotation_deg,
    ranked by camera-center distance, keep the covis_num nearest. With
    `seq_ids` (per-frame sequence label, [n] ints) the budget is split
    per sequence — quota = covis_num // n_seqs nearest valid candidates
    from EACH sequence (reference covis_from_pose's num_matched_per_seq),
    so one densely-sampled scan cannot soak up the whole budget.

    Memory: blockwise over query rows. trace(Ri^T Rj) is the flatten-dot
    of the two rotation matrices, so the [Bq, n] angle block comes from a
    [Bq, 9] x [9, n] GEMM — the [n, n, 3, 3] intermediate of the naive
    einsum never exists, and peak extra memory is O(block * n) floats
    (thousand-frame scans stay comfortably under 1 GB).
    """
    n = len(Rs)
    centers = (-np.einsum("nij,ni->nj", Rs.transpose(0, 2, 1), ts)).astype(
        np.float32
    )
    F = Rs.reshape(n, 9).astype(np.float32)  # trace(Ri^T Rj) = Fi . Fj
    cos_min = np.cos(np.deg2rad(min_rotation_deg))

    if seq_ids is None:
        seq_ids = np.zeros(n, np.int64)
    seq_ids = np.asarray(seq_ids)
    uniq = np.unique(seq_ids)
    quota = max(covis_num // len(uniq), 1)
    seq_members = [np.nonzero(seq_ids == s)[0] for s in uniq]

    pairs = set()
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        tr = F[lo:hi] @ F.T                      # [Bq, n]
        cos_ang = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
        d2 = (
            np.sum(centers[lo:hi] ** 2, axis=1)[:, None]
            - 2.0 * centers[lo:hi] @ centers.T
            + np.sum(centers**2, axis=1)[None, :]
        )                                        # [Bq, n] squared distance
        valid = cos_ang < cos_min                # rotation > threshold
        valid[np.arange(hi - lo), np.arange(lo, hi)] = False
        d2 = np.where(valid, d2, np.inf)
        for r in range(hi - lo):
            i = lo + r
            for members in seq_members:
                dm = d2[r, members]
                k = min(quota, len(members))
                if k == 0:
                    continue
                near = np.argpartition(dm, k - 1)[:k] if k < len(members) else np.arange(len(members))
                for m in near:
                    if np.isfinite(dm[m]):
                        j = int(members[m])
                        pairs.add((min(i, j), max(i, j)))
    if not pairs:
        return np.zeros((0, 2), np.int32)
    return np.asarray(sorted(pairs), np.int32)


def poses_to_Rt(poses6: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[F, 6] angle-axis++t -> (R [F,3,3], t [F,3]) in numpy."""
    R = Rotation.from_rotvec(poses6[:, :3]).as_matrix()
    return R.astype(poses6.dtype), poses6[:, 3:].copy()
