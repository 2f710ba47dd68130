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
    # detector reference views (the role of the reference's ~15 SfM
    # workspace views loaded by LocalFeatureObjectDetector:40-88): stored
    # with the map so inference needs no access to the scan data
    ref_images: np.ndarray | None = None   # [V, H, W] uint8 grayscale
    ref_boxes: np.ndarray | None = None    # [V, 4] object bbox per view

    def save(self, path: str | Path) -> None:
        data = dict(
            keypoints3d=self.keypoints3d,
            desc_coarse=self.desc_coarse,
            desc_fine=self.desc_fine,
            scores=self.scores,
        )
        for name in ("box_corners", "ref_images", "ref_boxes"):
            v = getattr(self, name)
            if v is not None:
                data[name] = v
        np.savez_compressed(path, **data)

    @classmethod
    def load(cls, path: str | Path) -> "SfMMap":
        z = np.load(path)
        opt = {
            name: z[name] if name in z else None
            for name in ("box_corners", "ref_images", "ref_boxes")
        }
        return cls(
            keypoints3d=z["keypoints3d"],
            desc_coarse=z["desc_coarse"],
            desc_fine=z["desc_fine"],
            scores=z["scores"],
            **opt,
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


def select_reference_views(
    poses: np.ndarray,        # [F, 6] world->cam
    n_views: int = 15,
    strategy: str = "maxmin",
) -> np.ndarray:
    """Pick view indices for the detector DB.

    'maxmin': greedy farthest-point sampling in rotation space (maximises
    viewpoint coverage); 'even': evenly spaced frame indices (what the
    reference effectively does by sampling the SfM workspace).
    """
    F = len(poses)
    n_views = min(n_views, F)
    if strategy == "even":
        return np.linspace(0, F - 1, n_views).round().astype(np.int64)
    from scipy.spatial.transform import Rotation

    Rs = Rotation.from_rotvec(poses[:, :3]).as_matrix()
    # pairwise rotation angle via trace(R_i R_j^T)
    tr = np.einsum("fij,gij->fg", Rs, Rs)
    ang = np.arccos(np.clip((tr - 1) / 2, -1, 1))
    chosen = [0]
    mind = ang[0].copy()
    mind[0] = -1.0  # never re-pick a chosen view
    for _ in range(n_views - 1):
        nxt = int(np.argmax(mind))
        if mind[nxt] <= 0:
            # rotation diversity exhausted (e.g. pure-translation scan):
            # fall back to even spacing over the remaining frames
            remaining = np.setdiff1d(np.arange(F), chosen)
            extra = remaining[
                np.linspace(0, len(remaining) - 1, n_views - len(chosen))
                .round().astype(int)
            ]
            chosen.extend(int(e) for e in extra)
            break
        chosen.append(nxt)
        mind = np.minimum(mind, ang[nxt])
        mind[nxt] = -1.0
    return np.asarray(sorted(set(chosen)), np.int64)


def make_reference_db(
    sfm_map: "SfMMap",
    images: np.ndarray,       # [F, H, W] grayscale [0,1]
    poses: np.ndarray,        # [F, 6]
    Ks: np.ndarray,           # [F, 3, 3]
    n_views: int = 15,
    margin: float = 0.1,
) -> "SfMMap":
    """Attach detector reference views + per-view object boxes to the map.

    Boxes come from projecting the 3D box corners (or the point cloud when
    no box is known) into each selected view, expanded by `margin`.
    """
    import jax.numpy as jnp

    from ..core import camera

    sel = select_reference_views(poses, n_views)
    pts = (
        sfm_map.box_corners
        if sfm_map.box_corners is not None
        else sfm_map.keypoints3d
    )
    boxes = np.empty((len(sel), 4), np.float32)
    H, W = images.shape[1:3]
    for k, f in enumerate(sel):
        uv, _ = camera.project(
            jnp.asarray(pts, jnp.float32), jnp.asarray(poses[f]),
            jnp.asarray(Ks[f]),
        )
        uv = np.asarray(uv)
        x0, y0 = uv.min(0)
        x1, y1 = uv.max(0)
        w, h = x1 - x0, y1 - y0
        boxes[k] = (
            max(x0 - margin * w, 0), max(y0 - margin * h, 0),
            min(x1 + margin * w, W), min(y1 + margin * h, H),
        )
    sfm_map.ref_images = (images[sel] * 255).clip(0, 255).astype(np.uint8)
    sfm_map.ref_boxes = boxes
    return sfm_map
