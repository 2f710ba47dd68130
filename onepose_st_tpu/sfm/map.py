"""The SfM map artifact: 3D points with averaged descriptors.

Replaces the reference's `anno_3d_average.npz` + h5 + COCO-json trio
(src/sfm_utils/postprocess/feature_process.py:546-649 `get_kpt_ann`) with a
single npz: keypoints3d, per-point averaged coarse (256-d) and fine (128-d)
descriptors, scores, and the object box. This is exactly what the 2D-3D
matcher consumes at train/inference time.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np


@dataclasses.dataclass
class SfMMap:
    keypoints3d: np.ndarray    # [P, 3] f32
    desc_coarse: np.ndarray    # [P, Cc] f32 (averaged, L2-normalized)
    desc_fine: np.ndarray      # [P, Cf] f32
    scores: np.ndarray         # [P] f32 (track score / length)
    box_corners: np.ndarray | None = None  # [8, 3]

    def save(self, path: str | Path) -> None:
        data = dict(
            keypoints3d=self.keypoints3d,
            desc_coarse=self.desc_coarse,
            desc_fine=self.desc_fine,
            scores=self.scores,
        )
        if self.box_corners is not None:
            data["box_corners"] = self.box_corners
        np.savez_compressed(path, **data)

    @classmethod
    def load(cls, path: str | Path) -> "SfMMap":
        z = np.load(path)
        return cls(
            keypoints3d=z["keypoints3d"],
            desc_coarse=z["desc_coarse"],
            desc_fine=z["desc_fine"],
            scores=z["scores"],
            box_corners=z["box_corners"] if "box_corners" in z else None,
        )

    def padded(self, n_points: int, rng: np.random.Generator | None = None):
        """Pad/subsample to the matcher's static cloud size.

        Returns (kpts [n,3], desc_c, desc_f, scores, mask). Subsampling is
        random like the reference val path (data_utils.py:222-246).
        """
        P = len(self.keypoints3d)
        if P > n_points:
            rng = rng or np.random.default_rng(0)
            sel = rng.choice(P, n_points, replace=False)
            return (
                self.keypoints3d[sel],
                self.desc_coarse[sel],
                self.desc_fine[sel],
                self.scores[sel],
                np.ones(n_points, bool),
            )
        pad = n_points - P
        mask = np.concatenate([np.ones(P, bool), np.zeros(pad, bool)])
        z3 = np.zeros((pad, 3), np.float32)
        zc = np.zeros((pad, self.desc_coarse.shape[1]), np.float32)
        zf = np.zeros((pad, self.desc_fine.shape[1]), np.float32)
        zs = np.zeros(pad, np.float32)
        return (
            np.concatenate([self.keypoints3d, z3]),
            np.concatenate([self.desc_coarse, zc]),
            np.concatenate([self.desc_fine, zf]),
            np.concatenate([self.scores, zs]),
            mask,
        )
