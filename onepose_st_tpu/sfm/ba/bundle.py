"""Full bundle adjustment: poses + points, Schur complement, damped LM.

TPU-native replacement for COLMAP's Ceres `bundle_adjuster`
(reference src/sfm_utils/global_ba.py:9-39) and the pose-fixed
`point_triangulator` refinement (triangulation.py:195-230 — run with every
pose fixed). One jitted LM loop:

  * per-observation residuals + Jacobians by forward-mode autodiff
    (vmapped over the static track-major [P, M] observation layout);
  * Huber IRLS reweighting;
  * point blocks eliminated by Schur complement: the reduced camera system
    S [6F, 6F] is assembled by scanning point chunks (keeps the [M, M]
    pair outer-products bounded in memory) and solved densely — F is a few
    hundred keyframes, so a 6F x 6F solve is cheap on the MXU;
  * fixed poses (gauge, or triangulation-only mode) are handled by
    zeroing their rows/columns and pinning the diagonal.

Distribution story (ba/distributed.py): shard the P axis across devices;
Hcc/S/b are psum-reduced — the camera system is tiny compared to the point
blocks, which never leave their shard.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import camera

_PREC = jax.lax.Precision.HIGHEST


class BundleProblem(NamedTuple):
    Ks: jax.Array          # [F, 3, 3] fixed intrinsics
    obs_frame: jax.Array   # [P, M] int32 frame id per observation
    obs_uv: jax.Array      # [P, M, 2] measured pixels
    obs_mask: jax.Array    # [P, M] bool
    fixed_pose: jax.Array  # [F] bool — True: pose not optimized
    huber_px: float = 2.0


def _residual_one(pose6, X, K, uv):
    uv_hat, z = camera.project(X, pose6, K, eps=1e-9)
    r = uv_hat - uv
    return jnp.where(z > 1e-6, r, 0.0)


def _obs_jacobians(poses, points, prob: BundleProblem):
    """Residuals + Jacobians for every observation.

    Returns r [P,M,2], Jc [P,M,2,6], Jp [P,M,2,3], w [P,M] (Huber IRLS).
    """
    def per_obs(point, f_idx, uv):
        pose = poses[f_idx]
        K = prob.Ks[f_idx]
        r = _residual_one(pose, point, K, uv)
        Jc = jax.jacfwd(lambda p: _residual_one(p, point, K, uv))(pose)
        Jp = jax.jacfwd(lambda X: _residual_one(pose, X, K, uv))(point)
        return r, Jc, Jp

    per_point = jax.vmap(per_obs, in_axes=(None, 0, 0))
    r, Jc, Jp = jax.vmap(per_point)(points, prob.obs_frame, prob.obs_uv)
    # Huber IRLS weight on the residual norm
    rn = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(rn > prob.huber_px, prob.huber_px / (rn + 1e-12), 1.0)
    w = w * prob.obs_mask.astype(w.dtype)
    sw = jnp.sqrt(w)[..., None]
    return r * sw, Jc * sw[..., None], Jp * sw[..., None], w


def _cost(poses, points, prob, all_reduce=lambda x: x):
    r, _, _, _ = _obs_jacobians(poses, points, prob)
    return all_reduce(0.5 * jnp.sum(r * r))


def _inv3(A):
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co = jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1),
        ],
        axis=-2,
    )
    det = a * co[..., 0, 0] + b * co[..., 1, 0] + c * co[..., 2, 0]
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    return co / det_safe[..., None, None]


def _gn_step(poses, points, prob: BundleProblem, lam, chunk: int = 512,
             all_reduce=lambda x: x, pvary=lambda x: x):
    """One damped Gauss-Newton step. Returns (new_poses, new_points).

    `all_reduce` sums partial camera-system contributions across devices
    when the point axis is sharded (ba/distributed.py passes a psum)."""
    F = poses.shape[0]
    P, M = prob.obs_frame.shape
    r, Jc, Jp, _ = _obs_jacobians(poses, points, prob)

    # --- point blocks
    Hpp = jnp.einsum("pmki,pmkj->pij", Jp, Jp, precision=_PREC)      # [P,3,3]
    bp = jnp.einsum("pmki,pmk->pi", Jp, r, precision=_PREC)          # [P,3]
    Hpp_d = Hpp + lam * jnp.eye(3) * jnp.maximum(
        jnp.trace(Hpp, axis1=-2, axis2=-1)[..., None, None] / 3.0, 1e-8
    )
    Hpp_inv = _inv3(Hpp_d)

    # --- camera blocks
    Jc_flat = Jc.reshape(P * M, 2, 6)
    r_flat = r.reshape(P * M, 2)
    f_flat = prob.obs_frame.reshape(P * M)
    Hcc = jax.ops.segment_sum(
        jnp.einsum("oki,okj->oij", Jc_flat, Jc_flat, precision=_PREC),
        f_flat, num_segments=F,
    )                                                                # [F,6,6]
    bc = jax.ops.segment_sum(
        jnp.einsum("oki,ok->oi", Jc_flat, r_flat, precision=_PREC),
        f_flat, num_segments=F,
    )                                                                # [F,6]

    # --- Schur: S = Hcc - sum_p W_p Hpp^-1 W_p^T ; b = bc - sum Y bp
    W = jnp.einsum("pmki,pmkj->pmij", Jc, Jp, precision=_PREC)       # [P,M,6,3]
    Y = jnp.einsum("pmij,pjk->pmik", W, Hpp_inv, precision=_PREC)    # [P,M,6,3]

    # b correction: scatter per-obs Y @ bp into frames
    yb = jnp.einsum("pmij,pj->pmi", Y, bp, precision=_PREC)          # [P,M,6]
    b_corr = jax.ops.segment_sum(
        yb.reshape(P * M, 6), f_flat, num_segments=F
    )
    b_schur = all_reduce(bc - b_corr)                                # [F,6]

    # S correction: pair outer products, chunked over points
    n_chunks = max(-(-P // chunk), 1)  # ceil: pad must never be negative
    Pc = n_chunks * chunk
    pad = Pc - P
    if pad:
        Y_p = jnp.pad(Y, ((0, pad), (0, 0), (0, 0), (0, 0)))
        W_p = jnp.pad(W, ((0, pad), (0, 0), (0, 0), (0, 0)))
        f_p = jnp.pad(prob.obs_frame, ((0, pad), (0, 0)))
    else:
        Y_p, W_p, f_p = Y, W, prob.obs_frame
    Y_ch = Y_p.reshape(n_chunks, chunk, M, 6, 3)
    W_ch = W_p.reshape(n_chunks, chunk, M, 6, 3)
    f_ch = f_p.reshape(n_chunks, chunk, M)

    def chunk_body(S_acc, args):
        Yc, Wc, fc = args
        # [c, M, M, 6, 6] pair blocks for this chunk
        pair = jnp.einsum("cmij,cnkj->cmnik", Yc, Wc, precision=_PREC)
        pf = (fc[:, :, None] * F + fc[:, None, :]).reshape(-1)
        S_acc = S_acc + jax.ops.segment_sum(
            pair.reshape(-1, 6, 6), pf, num_segments=F * F
        )
        return S_acc, None

    S_corr, _ = jax.lax.scan(
        chunk_body, pvary(jnp.zeros((F * F, 6, 6))), (Y_ch, W_ch, f_ch)
    )
    S_corr = all_reduce(S_corr).reshape(F, F, 6, 6)

    # damped Hcc on the diagonal
    Hcc = all_reduce(Hcc)
    Hcc_d = Hcc + lam * jnp.eye(6) * jnp.maximum(
        jnp.trace(Hcc, axis1=-2, axis2=-1)[..., None, None] / 6.0, 1e-8
    )
    S = -S_corr
    S = S.at[jnp.arange(F), jnp.arange(F)].add(Hcc_d)

    # dense [6F, 6F] with fixed poses pinned to identity rows/cols
    S_dense = S.transpose(0, 2, 1, 3).reshape(6 * F, 6 * F)
    b_dense = b_schur.reshape(6 * F)
    free = jnp.repeat(~prob.fixed_pose, 6)
    free_f = free.astype(S_dense.dtype)
    mask2d = free_f[:, None] * free_f[None, :]
    S_dense = S_dense * mask2d + jnp.diag(1.0 - free_f)
    b_dense = b_dense * free_f

    # linalg internals contract at ambient precision (bf16 on TPU) — pin
    with jax.default_matmul_precision("highest"):
        delta_c = jnp.linalg.solve(S_dense, b_dense).reshape(F, 6)

    # back-substitute points: dX = Hpp^-1 (bp - sum_m W^T dc_f)
    dc_per_obs = delta_c[prob.obs_frame]                             # [P,M,6]
    wt_dc = jnp.einsum("pmij,pmi->pj", W, dc_per_obs, precision=_PREC)
    delta_p = jnp.einsum(
        "pij,pj->pi", Hpp_inv, bp - wt_dc, precision=_PREC
    )

    return poses - delta_c, points - delta_p


class BundleInfo(NamedTuple):
    initial_cost: jax.Array
    final_cost: jax.Array
    iterations: jax.Array


def solve_bundle(
    poses0: jax.Array,
    points0: jax.Array,
    prob: BundleProblem,
    max_iters: int = 16,
    lm_lambda0: float = 1e-3,
    tol_rel: float = 1e-6,
    all_reduce=lambda x: x,
    pvary=lambda x: x,
) -> tuple[jax.Array, jax.Array, BundleInfo]:
    """Damped LM over (poses, points). Returns (poses, points, info)."""

    def body(state):
        poses, points, lam, cost, it, _ = state
        cand_poses, cand_points = _gn_step(
            poses, points, prob, lam, all_reduce=all_reduce, pvary=pvary
        )
        new_cost = _cost(cand_poses, cand_points, prob, all_reduce)
        accept = new_cost < cost
        poses = jnp.where(accept, cand_poses, poses)
        points = jnp.where(accept, cand_points, points)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-10), lam * 4.0)
        rel_dec = jnp.where(accept, (cost - new_cost) / (cost + 1e-12), 1.0)
        cost = jnp.where(accept, new_cost, cost)
        converged = accept & (rel_dec < tol_rel)
        return poses, points, lam, cost, it + 1, converged

    def cond(state):
        _, _, lam, _, it, converged = state
        return (it < max_iters) & (~converged) & (lam < 1e8)

    cost0 = _cost(poses0, points0, prob, all_reduce)
    poses, points, lam, cost, iters, _ = jax.lax.while_loop(
        cond,
        body,
        (
            poses0,
            points0,
            jnp.asarray(lm_lambda0),
            cost0,
            jnp.asarray(0),
            jnp.asarray(False),
        ),
    )
    return poses, points, BundleInfo(cost0, cost, iters)
