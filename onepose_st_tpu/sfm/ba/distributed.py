"""Multi-device bundle adjustment: tracks sharded, camera system reduced.

The north-star distributed component (BASELINE.json): the SfM map's point
blocks are sharded across the mesh's "data" axis; each device assembles the
camera-system contributions (Hcc, Schur correction, right-hand side) for its
point shard, a `psum` over ICI reduces them, every device solves the small
replicated [6F, 6F] system, and back-substitution of the point updates stays
local to each shard. Communication per LM iteration is O(F^2 * 36) floats —
independent of the number of points.

Implemented with `shard_map` so the collective placement is explicit; the
inner math is the exact same bundle.py code with `all_reduce = psum`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .bundle import BundleInfo, BundleProblem, solve_bundle


def solve_bundle_sharded(
    poses0: jax.Array,
    points0: jax.Array,
    prob: BundleProblem,
    mesh: Mesh,
    axis: str = "data",
    max_iters: int = 16,
    lm_lambda0: float = 1e-3,
) -> tuple[jax.Array, jax.Array, BundleInfo]:
    """Sharded LM bundle adjustment over `mesh[axis]`.

    The point axis (P) of points0 / obs_* is padded to a multiple of the
    axis size and partitioned; poses and intrinsics are replicated.
    """
    n_dev = mesh.shape[axis]
    Pn = points0.shape[0]
    pad = (-Pn) % n_dev
    if pad:
        points0 = jnp.pad(points0, ((0, pad), (0, 0)))
        prob = prob._replace(
            obs_frame=jnp.pad(prob.obs_frame, ((0, pad), (0, 0))),
            obs_uv=jnp.pad(prob.obs_uv, ((0, pad), (0, 0), (0, 0))),
            obs_mask=jnp.pad(prob.obs_mask, ((0, pad), (0, 0))),
        )

    psum = functools.partial(jax.lax.psum, axis_name=axis)
    pvary = functools.partial(jax.lax.pcast, axis_name=axis, to="varying")
    huber = prob.huber_px

    sharded = P(axis)
    rep = P()

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            rep,                      # poses0
            sharded,                  # points0
            rep,                      # Ks
            sharded, sharded, sharded,  # obs_frame, obs_uv, obs_mask
            rep,                      # fixed_pose
        ),
        out_specs=(rep, sharded, (rep, rep, rep)),
    )
    def run(poses0, points_sh, Ks, obs_frame, obs_uv, obs_mask, fixed_pose):
        local_prob = BundleProblem(
            Ks=Ks,
            obs_frame=obs_frame,
            obs_uv=obs_uv,
            obs_mask=obs_mask,
            fixed_pose=fixed_pose,
            huber_px=huber,
        )
        poses, points, info = solve_bundle(
            poses0,
            points_sh,
            local_prob,
            max_iters=max_iters,
            lm_lambda0=lm_lambda0,
            all_reduce=psum,
            pvary=pvary,
        )
        return poses, points, tuple(info)

    poses, points, info = jax.jit(run)(
        poses0,
        points0,
        prob.Ks,
        prob.obs_frame,
        prob.obs_uv,
        prob.obs_mask,
        prob.fixed_pose,
    )
    if pad:
        points = points[:Pn]
    return poses, points, BundleInfo(*info)
