"""Per-frame pose estimation pipeline.

Re-design of reference inference.py:96-235 (`inference_core`'s POSE
ESTIMATION loop): detect (or track via the previous pose), crop, run the
2D-3D matcher against the SfM map, RANSAC-PnP, and re-detect when the
inlier count collapses (<min_inliers, reference inference.py:150-173).

The device work per frame is two jitted programs (matcher forward, PnP);
state machine and cropping stay on host. Temporal refinement lives in
infer/tracker.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..core import so3
from ..sfm.map import SfMMap
from ..solvers import ransac_pnp
from .detector import Detection, ObjectDetector


class FrameResult(NamedTuple):
    pose6: np.ndarray        # [6] world->cam
    T44: np.ndarray          # [4, 4]
    n_inliers: int
    n_matches: int
    tracked: bool            # False = detector ran on this frame
    success: bool
    mkpts3d: np.ndarray      # [K, 3] inlier 3D points (full precision)
    mkpts2d_full: np.ndarray # [K, 2] inlier 2D points in FULL image coords


class PoseEstimator:
    def __init__(
        self,
        cfg: EngineConfig,
        matcher_model,
        matcher_variables,
        sfm_map: SfMMap,
        detector: ObjectDetector | None = None,
    ):
        self.cfg = cfg
        self.model = matcher_model
        self.variables = matcher_variables
        self.detector = detector
        k, dc, df, s, mask = sfm_map.padded(cfg.matcher.n_points)
        self._cloud = (
            jnp.asarray(k)[None],
            jnp.asarray(dc)[None],
            jnp.asarray(df)[None],
            jnp.asarray(mask)[None],
        )
        self.box_corners3d = sfm_map.box_corners
        self._prev_pose: np.ndarray | None = None
        self._lost = True

        def fwd(variables, img, kpts, dc, df, mask):
            out = matcher_model.apply(variables, img, kpts, dc, df, mask)
            return (
                out["mkpts3d"],
                out["mkpts_query_f"],
                out["matches"].conf,
                out["matches"].valid,
            )

        self._fwd = jax.jit(fwd)

    def reset(self):
        self._prev_pose = None
        self._lost = True

    def estimate(
        self, frame: np.ndarray, K: np.ndarray, frame_idx: int = 0
    ) -> FrameResult:
        """frame: [H, W] grayscale [0,1]; K: [3,3] full-image intrinsics."""
        cfg = self.cfg
        det: Detection | None = None
        tracked = False
        if (
            not self._lost
            and self._prev_pose is not None
            and self.box_corners3d is not None
        ):
            det = self.detector.previous_pose_detect(
                self._prev_pose, K, self.box_corners3d
            )
            tracked = det.success
        if det is None or not det.success:
            det = self.detector.detect(frame, rng_seed=frame_idx)
            tracked = False
        if not det.success:
            return FrameResult(
                pose6=np.zeros(6, np.float32), T44=np.eye(4, dtype=np.float32),
                n_inliers=0, n_matches=0, tracked=False, success=False,
                mkpts3d=np.zeros((0, 3), np.float32),
                mkpts2d_full=np.zeros((0, 2), np.float32),
            )

        crop, K_crop, A3 = self.detector.crop(frame, det, K)
        kpts, dc, df, mask = self._cloud
        mk3d, mk2d, conf, valid = self._fwd(
            self.variables, jnp.asarray(crop[None, ..., None]), kpts, dc, df, mask
        )
        res = ransac_pnp(
            jax.random.key(frame_idx),
            mk3d[0],
            mk2d[0],
            jnp.asarray(K_crop),
            valid[0],
            cfg.pnp,
        )
        n_inl = int(res.n_inliers)
        n_match = int(np.asarray(valid).sum())
        success = bool(res.success) and n_inl >= cfg.pnp.min_inliers
        pose6 = np.asarray(res.pose6)

        if success:
            self._prev_pose = pose6
            self._lost = False
        else:
            self._lost = True  # re-detect next frame (reference :150-163)

        R, t = so3.pose6_to_Rt(jnp.asarray(pose6))
        T44 = np.eye(4, dtype=np.float32)
        T44[:3, :3] = np.asarray(R)
        T44[:3, 3] = np.asarray(t)

        inl = np.asarray(res.inliers)
        mk3d_np = np.asarray(mk3d[0])[inl]
        mk2d_crop = np.asarray(mk2d[0])[inl]
        # map crop coords back to full-image coords for the tracker
        A_inv = np.linalg.inv(A3)
        mk2d_full = mk2d_crop @ A_inv[:2, :2].T + A_inv[:2, 2]
        return FrameResult(
            pose6=pose6, T44=T44, n_inliers=n_inl, n_matches=n_match,
            tracked=tracked, success=success,
            mkpts3d=mk3d_np, mkpts2d_full=mk2d_full.astype(np.float32),
        )
