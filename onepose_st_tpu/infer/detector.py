"""Local-feature object detection for inference.

Re-design of reference src/local_feature_object_detector/
local_feature_2D_detector.py:40-280:

  * cold start / lost track: LoFTR-match the query frame against the SfM
    reference views (one batched forward over all DB views), pick the view
    with the most matches, RANSAC-affine its object box into the query,
    square-expand, crop 512x512 and update K;
  * tracked: project the 3D box with the previous pose for the crop box
    (reference previous_pose_detect:249).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import images as img_ops
from ..solvers import ransac_affine


class DetectorDB(NamedTuple):
    """Reference views with their object boxes (full-image pixel coords)."""

    images: np.ndarray   # [V, H, W] grayscale [0,1]
    boxes: np.ndarray    # [V, 4] object bbox (x0, y0, x1, y1) per view


class Detection(NamedTuple):
    box: np.ndarray          # [4] square crop box in query pixels
    n_matches: int
    best_view: int
    success: bool


def shift_box_into_frame(box: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    """Translate a crop box so it lies inside the frame when it fits.

    A box hanging past the frame edge gets black warp-fill in the crop,
    which is pure dead input for the matcher; shifting keeps the same box
    size (so K_crop scale is unchanged) but maximizes real pixels. Boxes
    larger than the frame are centered instead.
    """
    H, W = hw
    x0, y0, x1, y1 = [float(v) for v in box]
    bw, bh = x1 - x0, y1 - y0
    if bw <= W:
        dx = -x0 if x0 < 0 else min(0.0, W - x1)
    else:
        dx = (W - bw) / 2 - x0
    if bh <= H:
        dy = -y0 if y0 < 0 else min(0.0, H - y1)
    else:
        dy = (H - bh) / 2 - y0
    return np.array([x0 + dx, y0 + dy, x1 + dx, y1 + dy], np.float32)


class ObjectDetector:
    def __init__(self, loftr_model, loftr_variables, db: DetectorDB, crop_hw=(512, 512)):
        self.model = loftr_model
        self.variables = loftr_variables
        self.db = db
        self.crop_hw = crop_hw
        # DB views live on device once — re-uploading V full frames per
        # cold start costs ~1 MB/view over the tunnel
        self._img0_dev = jnp.asarray(db.images[..., None])

        def apply_all(v, img0, query):
            img1 = jnp.broadcast_to(
                query[None], (img0.shape[0], *query.shape)
            )
            out = loftr_model.apply(v, img0, img1)
            return {k: out[k] for k in ("mkpts0_c", "mkpts1_f", "mconf", "valid")}

        self._apply = jax.jit(apply_all)

    def detect(self, query: np.ndarray, rng_seed: int = 0) -> Detection:
        """Match query against every DB view; affine-warp the best box."""
        if np.issubdtype(query.dtype, np.integer):
            query = query.astype(np.float32) / 255.0  # uint8 camera path
        out_dev = self._apply(
            self.variables, self._img0_dev, jnp.asarray(query[..., None])
        )
        out = jax.device_get(out_dev)  # one batched fetch
        valid = out["valid"]
        n_per_view = valid.sum(axis=1)
        best = int(np.argmax(n_per_view))
        if n_per_view[best] < 8:
            return Detection(
                box=np.zeros(4, np.float32), n_matches=int(n_per_view[best]),
                best_view=best, success=False,
            )
        res = ransac_affine(
            jax.random.key(rng_seed),
            jnp.asarray(out["mkpts0_c"][best]),
            jnp.asarray(out["mkpts1_f"][best]),
            jnp.asarray(valid[best]),
            threshold_px=8.0,
        )
        A = np.asarray(res.A)
        x0, y0, x1, y1 = self.db.boxes[best]
        corners = np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32
        )
        warped = corners @ A[:2, :2].T + A[:2, 2]
        lo = warped.min(axis=0)
        hi = warped.max(axis=0)
        cx, cy = (lo + hi) * 0.5
        half = float(max(hi[0] - lo[0], hi[1] - lo[1])) * 0.5 * 1.1
        sq = np.array([cx - half, cy - half, cx + half, cy + half], np.float32)
        sq = shift_box_into_frame(sq, query.shape[:2])
        return Detection(
            box=sq, n_matches=int(res.n_inliers), best_view=best,
            success=bool(res.success),
        )

    def previous_pose_detect(
        self, pose6: np.ndarray, K: np.ndarray, box_corners3d: np.ndarray,
        frame_hw: tuple[int, int] | None = None,
        pad: float = 1.1,
    ) -> Detection:
        """Project the object's 3D box with the previous pose -> crop box.

        Pure host numpy: this runs EVERY tracked frame, and eager jnp ops
        here each pay a device dispatch (over a tunnel, ~10 ms apiece —
        measured as a major chunk of the closed-loop frame time).
        """
        from scipy.spatial.transform import Rotation

        R = Rotation.from_rotvec(np.asarray(pose6[:3], np.float64)).as_matrix()
        p_cam = np.asarray(box_corners3d, np.float64) @ R.T + pose6[3:6]
        p_img = p_cam @ np.asarray(K, np.float64).T
        depth = p_img[:, 2]
        uv = p_img[:, :2] / (depth[:, None] + 1e-4)
        lo, hi = uv.min(axis=0), uv.max(axis=0)
        cx, cy = (lo + hi) * 0.5
        half = float(max(hi[0] - lo[0], hi[1] - lo[1])) * 0.5 * pad
        sq = np.array([cx - half, cy - half, cx + half, cy + half], np.float32)
        if frame_hw is not None:
            sq = shift_box_into_frame(sq, frame_hw)
        ok = bool(np.all(depth > 0))
        return Detection(box=sq, n_matches=0, best_view=-1, success=ok)

    def crop(self, query: np.ndarray, det: Detection, K: np.ndarray):
        """Crop the query frame + update intrinsics for the crop (host-only:
        K_crop = A3 @ K with the same affine that warped the pixels)."""
        crop, A3 = img_ops.crop_image(query, det.box, self.crop_hw)
        K_crop = (A3 @ np.asarray(K, np.float32)).astype(np.float32)
        return crop, K_crop, A3
