"""Pose evaluation metrics.

Numpy (host-side) equivalents of reference src/utils/metric_utils.py:
  query_pose_error   (:91-118)  — cm translation + degree rotation error
  projection_2d_error(:31-53)
  add_metric         (:55-87)   — ADD / ADD-S at 0.1 * diameter
  aggregate_metrics  (:300-320) — {1,3,5}cm@{1,3,5}degree APs

Eval runs on host over small arrays, so plain numpy keeps it simple; the
on-device path only produces poses.
"""
from __future__ import annotations

import numpy as np
from scipy import spatial


def query_pose_error(
    pose_pred: np.ndarray, pose_gt: np.ndarray, unit: str = "m"
) -> tuple[float, float]:
    """Returns (rotation error deg, translation error cm)."""
    pose_pred = np.asarray(pose_pred)[:3]
    pose_gt = np.asarray(pose_gt)[:3]
    scale = {"m": 100.0, "cm": 1.0, "mm": 0.1}[unit]
    t_err = float(np.linalg.norm(pose_pred[:, 3] - pose_gt[:, 3]) * scale)
    trace = np.trace(pose_pred[:, :3] @ pose_gt[:, :3].T)
    trace = min(trace, 3.0)
    r_err = float(np.rad2deg(np.arccos(np.clip((trace - 1.0) / 2.0, -1.0, 1.0))))
    return r_err, t_err


def projection_2d_error(
    model_pts: np.ndarray, pose_pred: np.ndarray, pose_gt: np.ndarray, K: np.ndarray
) -> float:
    """Mean 2D reprojection distance of model points between two poses."""

    def proj(RT):
        xyz = model_pts @ RT[:, :3].T + RT[:, 3:].T
        xy = (xyz @ K.T)
        return xy[:, :2] / xy[:, 2:]

    return float(
        np.mean(np.linalg.norm(proj(pose_pred[:3]) - proj(pose_gt[:3]), axis=-1))
    )


def add_metric(
    model_pts: np.ndarray,
    diameter: float,
    pose_pred: np.ndarray,
    pose_gt: np.ndarray,
    percentage: float = 0.1,
    symmetric: bool = False,
) -> bool:
    """ADD (or ADD-S for symmetric objects) success at percentage*diameter."""
    pose_pred, pose_gt = pose_pred[:3], pose_gt[:3]
    pred = model_pts @ pose_pred[:, :3].T + pose_pred[:, 3]
    target = model_pts @ pose_gt[:, :3].T + pose_gt[:, 3]
    if symmetric:
        dist, _ = spatial.cKDTree(pred).query(target, k=1)
        mean_dist = float(np.mean(dist))
    else:
        mean_dist = float(np.mean(np.linalg.norm(pred - target, axis=-1)))
    return mean_dist < diameter * percentage


def aggregate_metrics(
    r_errs: np.ndarray, t_errs: np.ndarray, thresholds=(1, 3, 5)
) -> dict[str, float]:
    """Pose APs: fraction of frames with r_err < n deg AND t_err < n cm."""
    r = np.asarray(r_errs, dtype=np.float64)
    t = np.asarray(t_errs, dtype=np.float64)
    out = {}
    for n in thresholds:
        ok = (r < n) & (t < n)
        out[f"{n}cm@{n}degree"] = float(np.mean(ok)) if ok.size else 0.0
    return out


def model_diameter(model_pts: np.ndarray) -> float:
    """Bounding-box diagonal, the diameter proxy used by the reference
    (src/utils/sample_points_on_cad.py `model_diameter_from_bbox`)."""
    extent = np.max(model_pts, axis=0) - np.min(model_pts, axis=0)
    return float(np.linalg.norm(extent))


def umeyama_align(
    src: np.ndarray, dst: np.ndarray, with_scale: bool = True
) -> tuple[np.ndarray, np.ndarray, float, np.ndarray]:
    """Horn/Umeyama closed-form sim(3) alignment: dst ~ s * R @ src + t.

    Role of reference src/utils/colmap/eval_helper.py:10-60 `align` (ATE
    trajectory alignment); returns (R, t, s, per_point_error).
    Input shapes [N, 3].
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    if len(src) < 3:
        return np.eye(3), np.zeros(3), 1.0, np.full(len(src), np.inf)
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs**2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    aligned = s * src @ R.T + t
    err = np.linalg.norm(aligned - dst, axis=1)
    return R, t, s, err


def ate_rmse(traj_pred: np.ndarray, traj_gt: np.ndarray, with_scale: bool = True) -> float:
    """Absolute trajectory error (RMSE of aligned camera centers), meters."""
    _, _, _, err = umeyama_align(traj_pred, traj_gt, with_scale)
    return float(np.sqrt((err**2).mean()))
