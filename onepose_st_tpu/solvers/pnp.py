"""Vectorized RANSAC PnP, fully on-device.

TPU-native replacement for the reference's pycolmap
`absolute_pose_estimation` / cv2.solvePnPRansac fallback
(src/utils/metric_utils.py:121-209): a fixed-trial hypothesis sweep instead
of an adaptive loop —

  1. sample `n_hypotheses` 6-point minimal sets (Gumbel top-k over the
     validity mask, one PRNG fold per hypothesis);
  2. solve each with a K-normalized DLT for [R|t] (eigvec of the 12x12
     normal matrix) projected onto SO(3) by SVD;
  3. score all hypotheses against all correspondences in one batched
     projection; pick the max-inlier hypothesis;
  4. polish with a few Gauss-Newton iterations on inlier-weighted
     reprojection residuals (Jacobian by forward-mode autodiff).

Everything is static-shaped and jit/vmap-able; scoring is one
[n_hyp, N] matmul-heavy batch that maps well onto the MXU.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PnPConfig
from ..core import camera, so3
from .p3p import p3p_poses

_PREC = jax.lax.Precision.HIGHEST


class PnPResult(NamedTuple):
    pose6: jax.Array      # [6] world->camera (angle-axis ++ t)
    inliers: jax.Array    # [N] bool
    n_inliers: jax.Array  # [] int32
    success: jax.Array    # [] bool


def _normalize_points(uv: jax.Array, K: jax.Array) -> jax.Array:
    """Pixels -> normalized camera-plane coords (conditioning for DLT)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)


def _dlt_pose(pts3d: jax.Array, xn: jax.Array) -> jax.Array:
    """[S, 3] world points + [S, 2] normalized image coords -> pose6.

    Solves A vec([R|t]) = 0 (2 rows per point), takes the smallest
    eigenvector of A^T A, and projects the 3x3 part to SO(3).
    """
    S = pts3d.shape[0]
    X = jnp.concatenate([pts3d, jnp.ones((S, 1), pts3d.dtype)], axis=-1)  # [S,4]
    zeros = jnp.zeros_like(X)
    # rows: [X 0 -x*X] and [0 X -y*X]
    r1 = jnp.concatenate([X, zeros, -xn[:, :1] * X], axis=-1)  # [S, 12]
    r2 = jnp.concatenate([zeros, X, -xn[:, 1:2] * X], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)                      # [2S, 12]
    AtA = jnp.matmul(A.T, A, precision=_PREC)
    # linalg internals (eigh/svd iterations) contract at the *ambient*
    # default precision — bf16 on TPU, which breaks the rotation estimate
    # (measured 5.8 deg error vs 0.02 deg pinned); scope them to HIGHEST
    with jax.default_matmul_precision("highest"):
        _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[:, 0]                                             # smallest eigval
    P = p.reshape(3, 4)
    # resolve the null vector's projective sign first: sampled points must
    # have positive depth under the raw P (cheirality)
    z_raw = (
        jnp.einsum("ij,nj->ni", P[:, :3], pts3d, precision=_PREC) + P[:, 3]
    )[:, 2]
    sign = jnp.where(jnp.sum(jnp.sign(z_raw)) < 0, -1.0, 1.0)
    R_raw, t_raw = sign * P[:, :3], sign * P[:, 3]
    # project to SO(3): R = U diag(1,1,det) V^T; positive scale from SVD
    with jax.default_matmul_precision("highest"):
        U, s, Vt = jnp.linalg.svd(R_raw)
    det = jnp.linalg.det(jnp.matmul(U, Vt, precision=_PREC))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], R_raw.dtype)).at[2, 2].set(det)
    R = jnp.matmul(jnp.matmul(U, D, precision=_PREC), Vt, precision=_PREC)
    scale = jnp.maximum(jnp.mean(s), 1e-12)
    t = t_raw / scale
    return so3.pose6_from_Rt(R, t)


def _reproj_residual(pose6, pts3d, uv, K):
    uv_hat, depth = camera.project(pts3d, pose6, K, eps=1e-9)
    r = uv_hat - uv
    # points behind the camera are gross outliers
    return jnp.where(depth[..., None] > 1e-6, r, 1e6)


@functools.partial(jax.jit, static_argnames=("cfg",))
def ransac_pnp(
    rng: jax.Array,
    pts3d: jax.Array,     # [N, 3]
    uv: jax.Array,        # [N, 2] pixels
    K: jax.Array,         # [3, 3]
    valid: jax.Array,     # [N] bool
    cfg: PnPConfig,
) -> PnPResult:
    N = pts3d.shape[0]
    n_hyp = cfg.n_hypotheses
    sample = max(cfg.sample_size, 6)  # DLT needs 6 points (12 eqs, 11 dof)
    xn_all = _normalize_points(uv, K)

    def _sample_idx(key, mask, n_sets, set_size):
        """Gumbel top-k subset sampling restricted to mask=True entries."""
        g = jax.random.gumbel(key, (n_sets, N))
        scores = jnp.where(mask[None, :], g, -jnp.inf)
        _, idx = jax.lax.top_k(scores, set_size)
        return idx

    def _score(pose6):
        r = _reproj_residual(pose6, pts3d, uv, K)          # [N, 2]
        err2 = jnp.sum(r * r, axis=-1)
        inl = (err2 < cfg.reproj_threshold_px**2) & valid
        return jnp.sum(inl), inl

    # --- 1+2. hypothesis generation: DLT-6 and/or P3P minimal solves
    k_dlt, k_p3p, k_lo = jax.random.split(rng, 3)
    pose_banks, count_banks, inl_banks = [], [], []
    n_dlt = {"dlt": n_hyp, "p3p": 0, "mixed": n_hyp // 2}[cfg.solver]
    n_p3p = n_hyp - n_dlt
    if n_dlt > 0:
        idx = _sample_idx(k_dlt, valid, n_dlt, sample)
        poses_d = jax.vmap(_dlt_pose)(pts3d[idx], xn_all[idx])
        c, il = jax.vmap(_score)(poses_d)
        pose_banks.append(poses_d)
        count_banks.append(c)
        inl_banks.append(il)
    if n_p3p > 0:
        idx3 = _sample_idx(k_p3p, valid, n_p3p, 3)
        poses_p, ok_p = jax.vmap(p3p_poses)(pts3d[idx3], xn_all[idx3])
        poses_p = poses_p.reshape(-1, 6)                  # [n_p3p*4, 6]
        ok_p = ok_p.reshape(-1)
        c, il = jax.vmap(_score)(poses_p)
        c = jnp.where(ok_p, c, -1)                        # invalid roots lose
        pose_banks.append(poses_p)
        count_banks.append(c)
        inl_banks.append(il)

    poses = jnp.concatenate(pose_banks)
    counts = jnp.concatenate(count_banks)
    inlier_sets = jnp.concatenate(inl_banks)

    # --- 3. best hypothesis
    best = jnp.argmax(counts)
    pose = poses[best]
    inliers = inlier_sets[best]
    n_best = counts[best]

    # --- 3b. LO-RANSAC: re-solve with larger samples drawn from the current
    # inlier set (Lebeda-style local optimization; the accuracy/robustness
    # stage pycolmap gets from its LORANSAC refinement)
    lo_sz = max(cfg.lo_sample_size, 6)
    for round_i in range(cfg.lo_rounds):
        k_lo, k_r = jax.random.split(k_lo)
        # if fewer inliers than the sample size, top-k pads with arbitrary
        # valid points — harmless: candidates only replace on improvement
        pool = jnp.where(inliers.sum() >= 6, inliers, valid)
        idx = _sample_idx(k_r, pool, cfg.lo_hypotheses, lo_sz)
        poses_l = jax.vmap(_dlt_pose)(pts3d[idx], xn_all[idx])
        c_l, il_l = jax.vmap(_score)(poses_l)
        b_l = jnp.argmax(c_l)
        improve = c_l[b_l] > n_best
        pose = jnp.where(improve, poses_l[b_l], pose)
        inliers = jnp.where(improve, il_l[b_l], inliers)
        n_best = jnp.maximum(c_l[b_l], n_best)

    # --- 4. Gauss-Newton polish on inliers (fixed iterations)
    def gn_polish(pose, w, n_iters):
        def gn_step(pose, _):
            def res_flat(p):
                return (
                    _reproj_residual(p, pts3d, uv, K) * w[:, None]
                ).reshape(-1)

            r = res_flat(pose)
            J = jax.jacfwd(res_flat)(pose)                 # [2N, 6]
            JtJ = jnp.matmul(J.T, J, precision=_PREC)
            Jtr = jnp.matmul(J.T, r, precision=_PREC)
            with jax.default_matmul_precision("highest"):
                delta = jnp.linalg.solve(
                    JtJ + 1e-6 * jnp.eye(6, dtype=JtJ.dtype), Jtr
                )
            cand = pose - delta
            # accept only if cost decreases (guards divergent steps)
            better = jnp.sum(res_flat(cand) ** 2) < jnp.sum(r**2)
            return jnp.where(better, cand, pose), None

        pose, _ = jax.lax.scan(gn_step, pose, None, length=n_iters)
        return pose

    pose = gn_polish(pose, inliers.astype(jnp.float32), cfg.refine_iters)

    if cfg.tight_refine_px > 0:
        # second stage: reselect inliers at a TIGHT threshold and polish on
        # those alone — the loose-threshold tail (matches 2-7 px off) pulls
        # the rotation at the sub-degree level; the tight set is the
        # high-precision core. Falls back to the loose set when the tight
        # one is too small to constrain the pose.
        r_t = _reproj_residual(pose, pts3d, uv, K)
        err2_t = jnp.sum(r_t * r_t, axis=-1)
        tight = (err2_t < cfg.tight_refine_px**2) & valid
        enough = jnp.sum(tight) >= 2 * sample
        w2 = jnp.where(enough, tight, inliers).astype(jnp.float32)
        pose = gn_polish(pose, w2, cfg.refine_iters)

    # final inlier set with the polished pose
    r = _reproj_residual(pose, pts3d, uv, K)
    err2 = jnp.sum(r * r, axis=-1)
    inliers = (err2 < cfg.reproj_threshold_px**2) & valid
    n_inl = jnp.sum(inliers).astype(jnp.int32)
    # success needs at least a full minimal set of inliers: with < `sample`
    # valid correspondences the Gumbel top-k necessarily drew padded points
    # into the DLT and the pose is unconstrained
    return PnPResult(
        pose6=pose,
        inliers=inliers,
        n_inliers=n_inl,
        success=n_inl >= sample,
    )


def _scale_K_focal(K: jax.Array, s: jax.Array) -> jax.Array:
    """Scale fx, fy by `s`, keep the principal point (a wrong focal from
    single-image calibration is a pure fx/fy scale error once the crop
    affine is folded in: K_crop = A @ K_full and the full-image principal
    point is the known frame center)."""
    # elementwise gain: s at the fx/fy slots, 1 everywhere else
    gain = jnp.ones((3, 3), K.dtype) + (s - 1.0) * jnp.array(
        [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 0]], K.dtype
    )
    return K * gain


@functools.partial(jax.jit, static_argnames=("cfg", "gn_rounds", "gn_iters"))
def ransac_pnp_focal(
    rng: jax.Array,
    pts3d: jax.Array,     # [N, 3]
    uv: jax.Array,        # [N, 2] pixels
    K0: jax.Array,        # [3, 3] initial intrinsics (e.g. calib-net K)
    valid: jax.Array,     # [N] bool
    cfg: PnPConfig,
    gn_rounds: int = 3,
    gn_iters: int = 8,
) -> tuple[PnPResult, jax.Array]:
    """RANSAC PnP with focal self-calibration.

    The deep single-image calibration head lands at 8-12% focal error —
    unusable for the cm-degree AND metric (a 12% focal error is ~6 cm of
    depth error at object distance, EXPERIMENTS.md r3). But the matcher
    hands us hundreds of 2D-3D correspondences per frame, which make the
    focal observable: after a loose-threshold RANSAC with K0, a joint
    Gauss-Newton over (pose6, log focal-scale) on the inliers refines both,
    re-selecting inliers between rounds. Returns (result, focal_scale) —
    K_refined = K0 with fx, fy scaled.

    Replaces nothing in the reference (it trusts infer_K,
    inference.py:121-123); this is the engine-side fix for VERDICT r3 #7.
    """
    from .. import config as cfg_lib

    # stage 1: pose under K0 at a loosened gate (a 12% focal error pushes
    # edge-of-object correspondences tens of px out at 512 crops)
    cfg_loose = cfg_lib.replace(
        cfg, reproj_threshold_px=3.0 * cfg.reproj_threshold_px,
        tight_refine_px=0.0, recenter_iters=0,
    )
    res = ransac_pnp(rng, pts3d, uv, K0, valid, cfg_loose)

    params = jnp.concatenate([res.pose6, jnp.zeros((1,), res.pose6.dtype)])
    inliers = res.inliers

    def residual(params, w):
        pose, log_s = params[:6], params[6]
        Ks = _scale_K_focal(K0, jnp.exp(log_s))
        return (_reproj_residual(pose, pts3d, uv, Ks) * w[:, None]).reshape(-1)

    for _ in range(gn_rounds):
        w = inliers.astype(jnp.float32)

        def gn_step(p, _):
            r = residual(p, w)
            J = jax.jacfwd(lambda q: residual(q, w))(p)    # [2N, 7]
            JtJ = jnp.matmul(J.T, J, precision=_PREC)
            Jtr = jnp.matmul(J.T, r, precision=_PREC)
            with jax.default_matmul_precision("highest"):
                delta = jnp.linalg.solve(
                    JtJ + 1e-6 * jnp.eye(7, dtype=JtJ.dtype), Jtr
                )
            cand = p - delta
            better = jnp.sum(residual(cand, w) ** 2) < jnp.sum(r**2)
            return jnp.where(better, cand, p), None

        params, _ = jax.lax.scan(gn_step, params, None, length=gn_iters)
        Ks = _scale_K_focal(K0, jnp.exp(params[6]))
        r = _reproj_residual(params[:6], pts3d, uv, Ks)
        err2 = jnp.sum(r * r, axis=-1)
        inliers = (err2 < cfg.reproj_threshold_px**2) & valid

    s = jnp.exp(params[6])
    n_inl = jnp.sum(inliers).astype(jnp.int32)
    sample = max(cfg.sample_size, 6)
    return (
        PnPResult(
            pose6=params[:6], inliers=inliers, n_inliers=n_inl,
            # focal adds a 7th dof: demand a little more support
            success=n_inl >= sample + 2,
        ),
        s,
    )


@functools.partial(jax.jit, static_argnames=("gn_rounds", "gn_iters"))
def joint_focal_refine(
    pts3d: jax.Array,      # [F, N, 3] per-frame 3D correspondences
    uv: jax.Array,         # [F, N, 2] pixels (each frame's own image/crop)
    valid: jax.Array,      # [F, N] bool
    pose6_init: jax.Array, # [F, 6] per-frame initial poses (under K0)
    Ks: jax.Array,         # [F, 3, 3] per-frame intrinsics to be scaled
    reproj_threshold_px: float = 3.0,
    gn_rounds: int = 3,
    gn_iters: int = 8,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Joint Gauss-Newton over F frames' poses + ONE shared log focal-scale.

    The per-frame (pose, focal) estimator (ransac_pnp_focal) is nearly
    degenerate: at object distance the focal column of the Jacobian is
    almost parallel to the tz column, so each frame's scale estimate
    carries a consistent bias and aggregating per-frame medians compounds
    it (measured 3.8% -> 7.1% over 2 rounds, logs/ffe_r4a_calib2.log).
    Here the MULTI-frame baseline breaks the degeneracy: every frame gets
    its own free (pose, tz) but they must all agree on one focal, so the
    f/tz trade-off is resolved by the geometry across views — a tiny
    bundle adjustment with a single shared intrinsic (the reference has no
    analogue; it trusts infer_K, inference.py:121-123).

    Params are [6F + 1]; J is [2FN, 6F+1] by forward-mode autodiff and the
    normal system solves densely (F <= ~16 keeps it < 100x100). Inliers
    re-selected between rounds at `reproj_threshold_px`.

    Returns (pose6 [F, 6], focal_scale s, inliers [F, N]).
    """
    F = pts3d.shape[0]
    params = jnp.concatenate(
        [pose6_init.reshape(-1), jnp.zeros((1,), pose6_init.dtype)]
    )
    inliers = valid

    def residual(p, w):
        poses = p[: 6 * F].reshape(F, 6)
        s = jnp.exp(p[-1])
        Kf = jax.vmap(_scale_K_focal, in_axes=(0, None))(Ks, s)
        r = jax.vmap(_reproj_residual)(poses, pts3d, uv, Kf)   # [F, N, 2]
        return (r * w[..., None]).reshape(-1)

    n_params = 6 * F + 1
    for _ in range(gn_rounds):
        w = inliers.astype(jnp.float32)

        def gn_step(p, _):
            r = residual(p, w)
            J = jax.jacfwd(lambda q: residual(q, w))(p)        # [2FN, 6F+1]
            JtJ = jnp.matmul(J.T, J, precision=_PREC)
            Jtr = jnp.matmul(J.T, r, precision=_PREC)
            with jax.default_matmul_precision("highest"):
                delta = jnp.linalg.solve(
                    JtJ + 1e-6 * jnp.eye(n_params, dtype=JtJ.dtype), Jtr
                )
            # the full joint Newton step overshoots on this nonlinearity
            # (measured: cost 851 -> 1053 on the multiframe unit test, so
            # an accept/reject-only loop stalls at s == 1); backtrack over
            # fixed step scales and keep the best candidate
            alphas = jnp.array([1.0, 0.5, 0.25, 0.1], delta.dtype)
            cands = p[None, :] - alphas[:, None] * delta[None, :]
            costs = jax.vmap(
                lambda c: jnp.sum(residual(c, w) ** 2)
            )(cands)
            best = jnp.argmin(costs)
            cand = cands[best]
            better = costs[best] < jnp.sum(r**2)
            return jnp.where(better, cand, p), None

        params, _ = jax.lax.scan(gn_step, params, None, length=gn_iters)
        s = jnp.exp(params[-1])
        Kf = jax.vmap(_scale_K_focal, in_axes=(0, None))(Ks, s)
        r = jax.vmap(_reproj_residual)(
            params[: 6 * F].reshape(F, 6), pts3d, uv, Kf
        )
        err2 = jnp.sum(r * r, axis=-1)
        inliers = (err2 < reproj_threshold_px**2) & valid

    return params[: 6 * F].reshape(F, 6), jnp.exp(params[-1]), inliers
