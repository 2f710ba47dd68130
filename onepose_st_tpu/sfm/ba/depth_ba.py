"""Depth-only bundle adjustment — the reference's DeepLM use case.

Re-design of src/KeypointFreeSfM/post_optimization/optimizer/
{optimizer.py:40-274, residual.py:6-79, first_order_solver.py}: optimize one
reference-view depth per feature track (poses and intrinsics fixed),
minimizing the reprojection of the unprojected reference keypoint into every
other observing view against the LoFTR-refined fine keypoints.

Because each residual depends on exactly ONE scalar depth, the Gauss-Newton
normal matrix is diagonal — the LM update is elementwise, the whole damped
loop runs in a single lax.while_loop on device, and the per-observation
Jacobian comes from one forward-mode JVP (tangent = 1 on every depth).

The reference runs this in float64 through DeepLM; on TPU we stay in f32
with residuals measured in pixels (well-conditioned at these magnitudes) —
validated against a float64 numpy reference in tests.

Data layout (static shapes, track-major):
  depth      [T]        variable
  kpt0       [T, 2]     reference-view keypoint (pixels)
  ref_idx    [T]        reference frame id per track
  obs_idx    [T, M]     observing frame ids (padded)
  kpt1       [T, M, 2]  refined keypoints in observing views
  mask       [T, M]     valid-observation mask
  poses      [F, 6]     world->cam per frame (fixed)
  Ks         [F, 3, 3]  intrinsics per frame (fixed)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...core import camera, so3


class DepthBAProblem(NamedTuple):
    kpt0: jax.Array      # [T, 2]
    ref_idx: jax.Array   # [T] int32
    obs_idx: jax.Array   # [T, M] int32
    kpt1: jax.Array      # [T, M, 2]
    mask: jax.Array      # [T, M] bool
    poses: jax.Array     # [F, 6]
    Ks: jax.Array        # [F, 3, 3]


def residuals(depth: jax.Array, prob: DepthBAProblem) -> jax.Array:
    """[T] depths -> [T, M, 2] masked reprojection residuals (pixels)."""
    K0 = prob.Ks[prob.ref_idx]                       # [T, 3, 3]
    pose0 = prob.poses[prob.ref_idx]                 # [T, 6]
    p_cam0 = camera.unproject(prob.kpt0, depth, K0)  # [T, 3]
    p_world = camera.cam_to_world(p_cam0, pose0)     # [T, 3]
    pose1 = prob.poses[prob.obs_idx]                 # [T, M, 6]
    K1 = prob.Ks[prob.obs_idx]                       # [T, M, 3, 3]
    uv1, z1 = camera.project(p_world[:, None, :], pose1, K1, eps=1e-4)
    r = uv1 - prob.kpt1
    ok = prob.mask & (z1 > 1e-6)
    return jnp.where(ok[..., None], r, 0.0)


def _cost(depth, prob):
    r = residuals(depth, prob)
    return 0.5 * jnp.sum(r * r)


def solve_depth_ba(
    depth0: jax.Array,
    prob: DepthBAProblem,
    max_iters: int = 32,
    lm_lambda0: float = 1e-3,
    tol_rel: float = 1e-6,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Damped LM with elementwise normal equations. Returns (depth, info)."""

    def grad_and_curv(depth):
        # one JVP gives every per-observation derivative dr/dd (each residual
        # touches exactly one depth)
        r, jr = jax.jvp(lambda d: residuals(d, prob), (depth,), (jnp.ones_like(depth),))
        g = jnp.sum(jr * r, axis=(1, 2))             # [T] J^T r
        h = jnp.sum(jr * jr, axis=(1, 2))            # [T] diag(J^T J)
        cost = 0.5 * jnp.sum(r * r)
        return cost, g, h

    def body(state):
        depth, lam, cost, it, _ = state
        _, g, h = grad_and_curv(depth)
        delta = g / (h + lam * (h + 1e-12) + 1e-12)
        cand = depth - delta
        new_cost = _cost(cand, prob)
        accept = new_cost < cost
        depth = jnp.where(accept, cand, depth)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-9), lam * 4.0)
        rel_dec = jnp.where(accept, (cost - new_cost) / (cost + 1e-12), 1.0)
        cost = jnp.where(accept, new_cost, cost)
        converged = accept & (rel_dec < tol_rel)
        return depth, lam, cost, it + 1, converged

    def cond(state):
        _, lam, _, it, converged = state
        return (it < max_iters) & (~converged) & (lam < 1e8)

    cost0 = _cost(depth0, prob)
    depth, lam, cost, iters, _ = jax.lax.while_loop(
        cond, body, (depth0, jnp.asarray(lm_lambda0), cost0, jnp.asarray(0), jnp.asarray(False))
    )
    info = {
        "initial_cost": cost0,
        "final_cost": cost,
        "iterations": iters,
        "lambda": lam,
    }
    return depth, info
