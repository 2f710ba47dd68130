"""Batch evaluation harness.

Re-design of reference src/inference/inference_OnePosePlus.py +
src/utils/metric_utils.py:212-320 (`compute_query_pose_errors` /
`aggregate_metrics`): run pose estimation over sequences and aggregate
{1,3,5}cm@{1,3,5}degree AP, ADD(-S) and proj2D.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..core import metrics


@dataclasses.dataclass
class EvalReport:
    n_frames: int
    aps: dict[str, float]
    add_01d: float
    proj2d_5px: float
    median_r_deg: float
    median_t_cm: float
    r_errs: np.ndarray
    t_errs: np.ndarray
    ate_cm: float = float("nan")

    def row(self) -> dict:
        return {
            "n_frames": self.n_frames,
            **self.aps,
            "ADD@0.1d": self.add_01d,
            "proj2D@5px": self.proj2d_5px,
            "median_r_deg": self.median_r_deg,
            "median_t_cm": self.median_t_cm,
            "ATE_cm": self.ate_cm,
        }


def evaluate_poses(
    pred_T44: np.ndarray,       # [F, 4, 4]
    gt_T44: np.ndarray,         # [F, 4, 4]
    model_points: np.ndarray | None = None,  # [P, 3] for ADD / proj2D
    K: np.ndarray | None = None,             # [3, 3] or per-frame [F, 3, 3]
    success: np.ndarray | None = None,       # [F] bool; failures count as inf
    symmetric: bool = False,
) -> EvalReport:
    if model_points is not None and len(model_points) == 0:
        model_points = None  # empty map: pose APs only
    F = len(pred_T44)
    r_errs = np.full(F, np.inf)
    t_errs = np.full(F, np.inf)
    adds = np.zeros(F, bool)
    projs = np.full(F, np.inf)
    diameter = (
        metrics.model_diameter(model_points) if model_points is not None else None
    )
    for f in range(F):
        if success is not None and not success[f]:
            continue
        r_errs[f], t_errs[f] = metrics.query_pose_error(pred_T44[f], gt_T44[f])
        if model_points is not None:
            adds[f] = metrics.add_metric(
                model_points, diameter, pred_T44[f], gt_T44[f], symmetric=symmetric
            )
            if K is not None:
                K_f = K[f] if np.asarray(K).ndim == 3 else K
                projs[f] = metrics.projection_2d_error(
                    model_points, pred_T44[f], gt_T44[f], K_f
                )
    finite = np.isfinite(r_errs)
    # ATE over successfully-estimated camera centers (Umeyama-aligned,
    # reference eval_helper.py:10-60); center = -R^T t of world->cam
    ok = finite
    ate = float("nan")
    if ok.sum() >= 3:
        c_pred = np.einsum(
            "fij,fi->fj", pred_T44[ok, :3, :3], -pred_T44[ok, :3, 3]
        )
        c_gt = np.einsum("fij,fi->fj", gt_T44[ok, :3, :3], -gt_T44[ok, :3, 3])
        ate = 100.0 * metrics.ate_rmse(c_pred, c_gt, with_scale=False)
    return EvalReport(
        ate_cm=ate,
        n_frames=F,
        aps=metrics.aggregate_metrics(r_errs, t_errs),
        add_01d=float(adds.mean()) if model_points is not None else float("nan"),
        proj2d_5px=float((projs < 5.0).mean()) if K is not None else float("nan"),
        median_r_deg=float(np.median(r_errs[finite])) if finite.any() else float("inf"),
        median_t_cm=float(np.median(t_errs[finite])) if finite.any() else float("inf"),
        r_errs=r_errs,
        t_errs=t_errs,
    )
