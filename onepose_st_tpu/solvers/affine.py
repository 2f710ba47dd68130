"""Vectorized RANSAC 2D affine estimation.

Replaces the reference's cv2.estimateAffine2D RANSAC used by the
local-feature object detector
(src/local_feature_object_detector/local_feature_2D_detector.py:120): warp
the reference-view box corners into the query frame to localize the object.

3-point minimal sets solved exactly, batched scoring, least-squares polish
on the best inlier set.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


class AffineResult(NamedTuple):
    A: jax.Array          # [2, 3] affine (x' = A[:, :2] @ x + A[:, 2])
    inliers: jax.Array    # [N] bool
    n_inliers: jax.Array  # [] int32
    success: jax.Array    # [] bool


def _solve_affine(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Exact affine from 3 correspondences: [3,2] -> [3,2] gives [2,3]."""
    X = jnp.concatenate([src, jnp.ones((src.shape[0], 1), src.dtype)], axis=-1)
    # X @ A.T = dst  ->  A.T = X^-1 dst (3x3 solve, batched-safe);
    # linalg internals contract at ambient precision (bf16 on TPU) — pin
    with jax.default_matmul_precision("highest"):
        At = jnp.linalg.solve(X, dst)
    return At.T


def _lstsq_affine(src, dst, w):
    """Weighted least-squares affine over all correspondences."""
    X = jnp.concatenate([src, jnp.ones((src.shape[0], 1), src.dtype)], axis=-1)
    Xw = X * w[:, None]
    XtX = jnp.matmul(X.T, Xw, precision=_PREC)
    Xty = jnp.matmul(Xw.T, dst, precision=_PREC)
    with jax.default_matmul_precision("highest"):
        At = jnp.linalg.solve(XtX + 1e-8 * jnp.eye(3, dtype=X.dtype), Xty)
    return At.T


@functools.partial(jax.jit, static_argnames=("n_hypotheses",))
def ransac_affine(
    rng: jax.Array,
    src: jax.Array,        # [N, 2]
    dst: jax.Array,        # [N, 2]
    valid: jax.Array,      # [N] bool
    threshold_px: float = 5.0,
    n_hypotheses: int = 256,
) -> AffineResult:
    N = src.shape[0]
    g = jax.random.gumbel(rng, (n_hypotheses, N))
    scores = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(scores, 3)                   # [H, 3]
    A_h = jax.vmap(_solve_affine)(src[idx], dst[idx])   # [H, 2, 3]

    def score(A):
        pred = (
            jnp.einsum("ij,nj->ni", A[:, :2], src, precision=_PREC) + A[:, 2]
        )
        err2 = jnp.sum((pred - dst) ** 2, axis=-1)
        inl = (err2 < threshold_px**2) & valid
        return jnp.sum(inl), inl

    counts, inls = jax.vmap(score)(A_h)
    best = jnp.argmax(counts)
    w = inls[best].astype(src.dtype)
    A = _lstsq_affine(src, dst, w)
    _, inliers = score(A)
    n_inl = jnp.sum(inliers).astype(jnp.int32)
    return AffineResult(
        A=A, inliers=inliers, n_inliers=n_inl, success=n_inl >= 3
    )


def warp_points(A: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply [2, 3] affine to [..., 2] points."""
    return jnp.einsum("ij,...j->...i", A[:, :2], pts, precision=_PREC) + A[:, 2]
