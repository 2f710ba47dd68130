"""P3P minimal absolute-pose solver (Grunert), fully vectorized for TPU.

The reference's pycolmap `absolute_pose_estimation` (src/utils/metric_utils.py
:155-165) runs an adaptive RANSAC with up to 10^6 trials; our fixed-trial
device-side RANSAC (solvers/pnp.py) needs a 3-point minimal solver to match
that robustness ceiling: with a 6-point DLT sample the probability of an
all-inlier draw collapses above ~60% outliers (0.3^6 = 7e-4/trial), while a
3-point sample keeps it workable to ~85% (0.15^3 = 3e-3/trial).

Grunert's formulation (Haralick et al., "Review and Analysis of Solutions of
the Three Point Perspective Pose Estimation Problem"): the three unknown
point depths satisfy three law-of-cosines constraints; substituting the two
depth ratios reduces them to a quartic in one ratio. TPU constraints shape
the implementation:

  * no nonsymmetric eigensolver on TPU -> no companion-matrix root finding;
    the quartic is solved in closed form (Ferrari) with hand-rolled complex
    arithmetic over real pairs (TPU complex support is patchy), followed by
    a few Newton polish steps in real arithmetic;
  * the quartic's coefficients are recovered NUMERICALLY by evaluating the
    (exactly quartic) resultant polynomial at 5 fixed abscissae and applying
    a precomputed inverse-Vandermonde — no error-prone symbolic expansion;
  * everything is static-shaped scalar math, vmapped over hypotheses.

Each call returns up to 4 pose candidates + validity; RANSAC scores them all.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import so3

_PREC = jax.lax.Precision.HIGHEST

# abscissae for numeric quartic-coefficient recovery, and the inverse
# Vandermonde mapping values at them -> coefficients [c0..c4].
# numpy (not jnp) on purpose: module import may happen inside a jit trace
# (lazy import), and device constants created there leak tracers.
import numpy as _np

_ABSC_NP = _np.array([-2.0, -1.0, 0.0, 1.0, 2.0])
_ABSC = jnp.asarray(_ABSC_NP)
_INV_VANDER = jnp.asarray(
    _np.linalg.inv(_np.vander(_ABSC_NP, 5, increasing=True))
)


# ---------------------------------------------------------------------------
# complex arithmetic over (re, im) pairs — TPU-safe
# ---------------------------------------------------------------------------

def _cmul(a, b):
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def _cdiv(a, b):
    d = b[0] * b[0] + b[1] * b[1] + 1e-30
    return ((a[0] * b[0] + a[1] * b[1]) / d, (a[1] * b[0] - a[0] * b[1]) / d)


def _csqrt(a):
    """Principal square root: sqrt(mag) at half the angle."""
    mag = jnp.sqrt(a[0] * a[0] + a[1] * a[1])
    ang = jnp.arctan2(a[1], a[0])
    r = jnp.sqrt(mag)
    return (r * jnp.cos(ang / 2), r * jnp.sin(ang / 2))


def _ccbrt(a):
    """Principal cube root."""
    mag = jnp.sqrt(a[0] * a[0] + a[1] * a[1])
    ang = jnp.arctan2(a[1], a[0])
    r = mag ** (1.0 / 3.0)
    return (r * jnp.cos(ang / 3), r * jnp.sin(ang / 3))


def _solve_quartic(coeffs: jax.Array) -> jax.Array:
    """Real parts of the 4 roots of c4 v^4 + ... + c0 (Ferrari, complex).

    coeffs: [5] = [c0, c1, c2, c3, c4]. Imag-dominated (complex) roots come
    out as whatever their real part is; callers must validate candidates by
    polishing + residual checks, which RANSAC scoring does anyway.
    """
    c0, c1, c2, c3, c4 = [coeffs[i] for i in range(5)]
    scale = jnp.where(jnp.abs(c4) < 1e-12, 1e-12, c4)
    a3, a2, a1, a0 = c3 / scale, c2 / scale, c1 / scale, c0 / scale
    # depressed quartic y^4 + p y^2 + q y + r, v = y - a3/4
    p = a2 - 3.0 * a3 * a3 / 8.0
    q = a1 - a3 * a2 / 2.0 + a3 * a3 * a3 / 8.0
    r = (
        a0 - a3 * a1 / 4.0 + a3 * a3 * a2 / 16.0
        - 3.0 * a3 * a3 * a3 * a3 / 256.0
    )
    # resolvent cubic m^3 + p m^2 + (p^2/4 - r) m - q^2/8 = 0
    B, C, D = p, p * p / 4.0 - r, -q * q / 8.0
    # Cardano with complex arithmetic: m = w - B/3
    P = C - B * B / 3.0
    Q = 2.0 * B * B * B / 27.0 - B * C / 3.0 + D
    disc = (Q / 2.0) ** 2 + (P / 3.0) ** 3
    sq = _csqrt((disc, jnp.zeros_like(disc)))
    u3 = (-Q / 2.0 + sq[0], sq[1])
    # guard the u3 == 0 branch (then w = cbrt(-Q))
    u3_mag = jnp.sqrt(u3[0] * u3[0] + u3[1] * u3[1])
    u3 = jax.tree.map(
        lambda x, alt: jnp.where(u3_mag < 1e-20, alt, x),
        u3, (-Q - 0.0, jnp.zeros_like(Q)),
    )
    u = _ccbrt(u3)
    # three cube-root branches; pick m with max |2m| for a stable S
    best = None
    for k in range(3):
        ang = 2.0 * jnp.pi * k / 3.0
        w = _cmul(u, (jnp.cos(ang), jnp.sin(ang)))
        w = (
            w[0] - _cdiv((P, jnp.zeros_like(P)), _cmul((3.0, 0.0 * P), w))[0],
            w[1] - _cdiv((P, jnp.zeros_like(P)), _cmul((3.0, 0.0 * P), w))[1],
        )
        m = (w[0] - B / 3.0, w[1])
        mag = m[0] * m[0] + m[1] * m[1]
        if best is None:
            best = (m, mag)
        else:
            pick = mag > best[1]
            best = (
                (jnp.where(pick, m[0], best[0][0]),
                 jnp.where(pick, m[1], best[0][1])),
                jnp.maximum(mag, best[1]),
            )
    m = best[0]
    S = _csqrt((2.0 * m[0], 2.0 * m[1]))
    qc = (q, jnp.zeros_like(q))
    q_2S = _cdiv(qc, (2.0 * S[0], 2.0 * S[1]))
    # y^2 -+ S y + (p/2 + m +- q/(2S)) = 0
    roots = []
    for s_sign in (1.0, -1.0):
        cterm = (
            p / 2.0 + m[0] + s_sign * q_2S[0],
            m[1] + s_sign * q_2S[1],
        )
        Ssig = (s_sign * S[0], s_sign * S[1])  # the linear coeff is -+S
        disc2 = (
            Ssig[0] * Ssig[0] - Ssig[1] * Ssig[1] - 4.0 * cterm[0],
            2.0 * Ssig[0] * Ssig[1] - 4.0 * cterm[1],
        )
        sd = _csqrt(disc2)
        for r_sign in (1.0, -1.0):
            y_re = (Ssig[0] + r_sign * sd[0]) / 2.0
            roots.append(y_re - a3 / 4.0)
    return jnp.stack(roots)  # [4] real parts


def _newton_polish(coeffs: jax.Array, v: jax.Array, iters: int = 8):
    """Polish real roots of the quartic by Newton; returns (v, |f(v)|)."""
    c = coeffs

    def f(x):
        return c[0] + x * (c[1] + x * (c[2] + x * (c[3] + x * c[4])))

    def fp(x):
        return c[1] + x * (2 * c[2] + x * (3 * c[3] + x * 4 * c[4]))

    for _ in range(iters):
        v = v - f(v) / jnp.where(jnp.abs(fp(v)) < 1e-12, 1e-12, fp(v))
    return v, jnp.abs(f(v))


def _kabsch3(Pw: jax.Array, Xc: jax.Array) -> jax.Array:
    """Rigid world->cam pose from 3 exact correspondences (Procrustes)."""
    cw = jnp.mean(Pw, axis=0)
    cc = jnp.mean(Xc, axis=0)
    H = jnp.matmul((Pw - cw).T, (Xc - cc), precision=_PREC)  # [3,3]
    with jax.default_matmul_precision("highest"):
        U, _, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(jnp.matmul(Vt.T, U.T, precision=_PREC))
    Dm = jnp.diag(jnp.array([1.0, 1.0, 1.0], H.dtype)).at[2, 2].set(d)
    R = jnp.matmul(jnp.matmul(Vt.T, Dm, precision=_PREC), U.T, precision=_PREC)
    t = cc - R @ cw
    return so3.pose6_from_Rt(R, t)


def p3p_poses(pts3d: jax.Array, xn: jax.Array):
    """3-point minimal solve.

    pts3d: [3, 3] world points; xn: [3, 2] normalized image coords.
    Returns (poses [4, 6], valid [4]) — up to four real solutions.
    """
    f = jnp.concatenate([xn, jnp.ones((3, 1), xn.dtype)], axis=-1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)          # bearings
    P1, P2, P3 = pts3d[0], pts3d[1], pts3d[2]
    a2 = jnp.sum((P2 - P3) ** 2)
    b2 = jnp.sum((P1 - P3) ** 2)
    c2 = jnp.sum((P1 - P2) ** 2)
    cos_a = jnp.dot(f[1], f[2])
    cos_b = jnp.dot(f[0], f[2])
    cos_g = jnp.dot(f[0], f[1])
    b2s = jnp.where(b2 < 1e-18, 1e-18, b2)
    A = a2 / b2s
    C = c2 / b2s
    Dm = C - A

    # resultant quartic F(v) = G^2 - 2 cos_g G den + den^2 (1 - C W), where
    # W(v) = 1 + v^2 - 2 v cos_b, G(v) = 1 - v^2 - Dm*W, den(v) = 2(cos_g - v cos_a)
    def F(v):
        W = 1.0 + v * v - 2.0 * v * cos_b
        G = 1.0 - v * v - Dm * W
        den = 2.0 * (cos_g - v * cos_a)
        return G * G - 2.0 * cos_g * G * den + den * den * (1.0 - C * W)

    vals = jax.vmap(F)(_ABSC)
    coeffs = _INV_VANDER @ vals                                  # [5]
    v_roots = _solve_quartic(coeffs)
    v_roots, fval = _newton_polish(coeffs, v_roots)
    # residual tolerance relative to the polynomial's magnitude
    fscale = jnp.max(jnp.abs(vals)) + 1e-12

    def candidate(v):
        W = 1.0 + v * v - 2.0 * v * cos_b
        G = 1.0 - v * v - Dm * W
        den = 2.0 * (cos_g - v * cos_a)
        u = G / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        Wc = jnp.maximum(W, 1e-12)
        s1 = jnp.sqrt(b2s / Wc)
        s2, s3 = u * s1, v * s1
        Xc = jnp.stack([s1 * f[0], s2 * f[1], s3 * f[2]])
        pose = _kabsch3(pts3d, Xc)
        ok = (
            (v > 1e-6) & (u > 1e-6)
            & (W > 1e-9) & (jnp.abs(den) > 1e-9)
        )
        return pose, ok

    poses, ok = jax.vmap(candidate)(v_roots)
    valid = ok & (fval < 1e-3 * fscale)
    return poses, valid
