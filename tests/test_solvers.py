import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from onepose_st_tpu.config import PnPConfig
from onepose_st_tpu.core import metrics
from onepose_st_tpu.solvers import ransac_pnp, ransac_affine
from onepose_st_tpu.solvers.affine import warp_points


def synth_pnp_problem(rng, N=256, outlier_frac=0.0, noise_px=0.0):
    K = np.array([[600.0, 0, 256], [0, 600.0, 256], [0, 0, 1]], np.float32)
    rotvec = rng.normal(size=3) * 0.4
    R = Rotation.from_rotvec(rotvec).as_matrix().astype(np.float32)
    t = np.array([0.05, -0.03, 0.6], np.float32)
    pts = rng.uniform(-0.15, 0.15, size=(N, 3)).astype(np.float32)
    uvz = (pts @ R.T + t) @ K.T
    uv = uvz[:, :2] / uvz[:, 2:]
    if noise_px > 0:
        uv = uv + rng.normal(size=uv.shape) * noise_px
    n_out = int(N * outlier_frac)
    if n_out:
        out_idx = rng.choice(N, n_out, replace=False)
        uv[out_idx] = rng.uniform(0, 512, size=(n_out, 2))
    pose_gt = np.eye(4, dtype=np.float32)
    pose_gt[:3, :3] = R
    pose_gt[:3, 3] = t
    return pts, uv.astype(np.float32), K, pose_gt, np.ones(N, bool)


def run_pnp(rng_np, seed=0, **kw):
    pts, uv, K, pose_gt, valid = synth_pnp_problem(rng_np, **kw)
    cfg = PnPConfig(n_hypotheses=256)
    res = ransac_pnp(
        jax.random.key(seed), jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(K),
        jnp.asarray(valid), cfg,
    )
    from onepose_st_tpu.core import so3

    R, t = so3.pose6_to_Rt(res.pose6)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(R)
    T[:3, 3] = np.asarray(t)
    r_err, t_err = metrics.query_pose_error(T, pose_gt)
    return res, r_err, t_err


def test_pnp_clean(rng):
    res, r_err, t_err = run_pnp(rng)
    assert bool(res.success)
    assert int(res.n_inliers) > 250
    assert r_err < 0.1 and t_err < 0.1  # deg / cm


def test_pnp_outliers(rng):
    res, r_err, t_err = run_pnp(rng, outlier_frac=0.4)
    assert bool(res.success)
    assert r_err < 0.2 and t_err < 0.2
    # outliers must be excluded
    assert int(res.n_inliers) < 256


def test_pnp_noise(rng):
    res, r_err, t_err = run_pnp(rng, noise_px=1.0, outlier_frac=0.2)
    assert bool(res.success)
    assert r_err < 1.0 and t_err < 1.0


def test_pnp_few_valid(rng):
    """Only 8 valid correspondences out of 256 slots."""
    pts, uv, K, pose_gt, _ = synth_pnp_problem(rng)
    valid = np.zeros(256, bool)
    valid[:8] = True
    cfg = PnPConfig(n_hypotheses=256)
    res = ransac_pnp(
        jax.random.key(0), jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(K),
        jnp.asarray(valid), cfg,
    )
    assert bool(res.success)
    assert int(res.n_inliers) >= 8
    # inliers must be a subset of valid
    assert not np.any(np.asarray(res.inliers) & ~valid)


def test_affine_ransac(rng):
    A_gt = np.array([[1.2, -0.1, 30.0], [0.05, 0.9, -12.0]], np.float32)
    N = 128
    src = rng.uniform(0, 512, size=(N, 2)).astype(np.float32)
    dst = src @ A_gt[:, :2].T + A_gt[:, 2]
    dst[:40] = rng.uniform(0, 512, size=(40, 2))  # 30% outliers
    res = ransac_affine(
        jax.random.key(0), jnp.asarray(src), jnp.asarray(dst),
        jnp.ones(N, bool), threshold_px=3.0,
    )
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.A), A_gt, atol=1e-2)
    corners = jnp.asarray([[0.0, 0], [512, 0], [512, 512], [0, 512]])
    warped = np.asarray(warp_points(res.A, corners))
    want = np.asarray(corners) @ A_gt[:, :2].T + A_gt[:, 2]
    np.testing.assert_allclose(warped, want, atol=0.1)


def test_pnp_too_few_valid_reports_failure(rng):
    """With < 6 valid correspondences the minimal DLT set necessarily
    contains padded garbage; success must be False even if the valid points
    happen to reproject."""
    pts, uv, K, pose_gt, _ = synth_pnp_problem(rng)
    valid = np.zeros(256, bool)
    valid[:5] = True
    cfg = PnPConfig(n_hypotheses=256)
    res = ransac_pnp(
        jax.random.key(0), jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(K),
        jnp.asarray(valid), cfg,
    )
    assert not bool(res.success)


def test_p3p_minimal_exact(rng):
    """P3P recovers the GT pose from 3 exact correspondences (one of <=4 roots)."""
    from onepose_st_tpu.solvers.p3p import p3p_poses
    from onepose_st_tpu.core import so3

    hits = 0
    for seed in range(12):
        r = np.random.default_rng(seed)
        pts = r.uniform(-0.2, 0.2, (3, 3)).astype(np.float32)
        R = Rotation.random(random_state=seed).as_matrix().astype(np.float32)
        t = np.array([0.05, -0.02, 0.8], np.float32)
        pc = pts @ R.T + t
        xn = (pc[:, :2] / pc[:, 2:]).astype(np.float32)
        poses, valid = jax.jit(p3p_poses)(jnp.asarray(pts), jnp.asarray(xn))
        best = 1e9
        for i in range(4):
            if not bool(valid[i]):
                continue
            R2, t2 = so3.pose6_to_Rt(poses[i])
            cosang = (np.trace(np.asarray(R2).T @ R) - 1) / 2
            rot_err = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
            best = min(best, rot_err)
        if best < 2.0:
            hits += 1
    # f32 quartic roots occasionally land a couple degrees off (polish in
    # RANSAC fixes that); the solver itself must find the root almost always
    assert hits >= 10


def test_pnp_60pct_outliers(rng):
    """The verdict's robustness bar: clean recovery at 60% outliers."""
    res, r_err, t_err = run_pnp(rng, outlier_frac=0.6, N=500)
    assert bool(res.success)
    assert r_err < 0.5 and t_err < 0.5


def test_pnp_80pct_outliers(rng):
    """P3P sampling keeps RANSAC alive far past the DLT-6 breakdown."""
    res, r_err, t_err = run_pnp(rng, outlier_frac=0.8, N=500)
    assert bool(res.success)
    assert r_err < 1.0 and t_err < 1.0


@pytest.mark.slow
def test_pnp_solvers_agree_low_outliers(rng):
    """dlt / p3p / mixed all nail the easy regime."""
    import dataclasses

    pts, uv, K, pose_gt, valid = synth_pnp_problem(rng, N=300, outlier_frac=0.2)
    from onepose_st_tpu.core import so3

    for solver in ("dlt", "p3p", "mixed"):
        cfg = dataclasses.replace(PnPConfig(n_hypotheses=256), solver=solver)
        res = ransac_pnp(
            jax.random.key(1), jnp.asarray(pts), jnp.asarray(uv),
            jnp.asarray(K), jnp.asarray(valid), cfg,
        )
        R, t = so3.pose6_to_Rt(res.pose6)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(R)
        T[:3, 3] = np.asarray(t)
        r_err, t_err = metrics.query_pose_error(T, pose_gt)
        assert bool(res.success) and r_err < 0.2 and t_err < 0.2, solver


def test_pnp_tight_refine_beats_loose_on_mixed_noise(rng):
    """tight_refine_px: a precise core (0.3 px noise) + a sloppy tail (4 px
    noise, still inside the 7 px loose gate) — the second tight-GN stage
    must fit the core and land closer to GT than the single loose polish."""
    K = np.array([[600.0, 0, 256], [0, 600.0, 256], [0, 0, 1]], np.float32)
    R = Rotation.from_rotvec(rng.normal(size=3) * 0.4).as_matrix().astype(np.float32)
    t = np.array([0.05, -0.03, 0.6], np.float32)
    N = 256
    pts = rng.uniform(-0.15, 0.15, size=(N, 3)).astype(np.float32)
    uvz = (pts @ R.T + t) @ K.T
    uv = uvz[:, :2] / uvz[:, 2:]
    n_core = N // 2
    uv[:n_core] += rng.normal(size=(n_core, 2)) * 0.3
    # biased sloppy tail (all pushed one way — the worst case for a loose
    # equally-weighted polish)
    uv[n_core:] += rng.normal(size=(N - n_core, 2)) * 2.0 + np.array([3.0, 0.0])
    pose_gt = np.eye(4, dtype=np.float32)
    pose_gt[:3, :3] = R
    pose_gt[:3, 3] = t

    from onepose_st_tpu.core import so3

    def solve(cfg):
        res = ransac_pnp(
            jax.random.key(0), jnp.asarray(pts), jnp.asarray(uv.astype(np.float32)),
            jnp.asarray(K), jnp.ones(N, bool), cfg,
        )
        Rm, tm = so3.pose6_to_Rt(res.pose6)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(Rm)
        T[:3, 3] = np.asarray(tm)
        return metrics.query_pose_error(T, pose_gt)

    r_loose, t_loose = solve(PnPConfig(n_hypotheses=256))
    r_tight, t_tight = solve(PnPConfig(n_hypotheses=256, tight_refine_px=1.5))
    # the tight core fit must beat the loose equally-weighted polish
    assert r_tight < r_loose and t_tight < t_loose, (
        (r_tight, t_tight), (r_loose, t_loose))
    assert r_tight < 0.15 and t_tight < 0.15


def test_pnp_focal_self_calibration(rng):
    """ransac_pnp_focal: with the initial focal 12% off (the calib-net
    deployment error), the joint (pose, focal) refinement must recover the
    true focal to <1% and the pose to sub-degree accuracy."""
    from onepose_st_tpu.solvers import ransac_pnp_focal

    pts, uv, K, pose_gt, valid = synth_pnp_problem(
        rng, N=256, outlier_frac=0.2, noise_px=0.5
    )
    K_wrong = K.copy()
    K_wrong[0, 0] *= 0.88
    K_wrong[1, 1] *= 0.88
    cfg = PnPConfig(n_hypotheses=256)
    res, s = ransac_pnp_focal(
        jax.random.key(0), jnp.asarray(pts), jnp.asarray(uv),
        jnp.asarray(K_wrong), jnp.asarray(valid), cfg,
    )
    from onepose_st_tpu.core import so3

    assert bool(res.success)
    # recovered focal: K_wrong * s ~ K  ->  s ~ 1/0.88 = 1.136
    f_rec = float(s) * K_wrong[0, 0]
    assert abs(f_rec - K[0, 0]) / K[0, 0] < 0.01, (f_rec, K[0, 0])
    R, t = so3.pose6_to_Rt(res.pose6)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(R)
    T[:3, 3] = np.asarray(t)
    r_err, t_err = metrics.query_pose_error(T, pose_gt)
    assert r_err < 0.5 and t_err < 1.0, (r_err, t_err)


def test_joint_focal_refine_multiframe(rng):
    """joint_focal_refine: one shared log-focal across F frames' poses.

    Scene is deliberately f/tz-degenerate per frame (shallow object at
    distance, varying depths across frames): the multi-frame baseline must
    still recover a 12%-wrong focal to <1%."""
    from onepose_st_tpu.core import so3
    from onepose_st_tpu.solvers import joint_focal_refine

    F, N = 6, 256
    K = np.array([[600.0, 0, 256], [0, 600.0, 256], [0, 0, 1]], np.float32)
    # shallow object: 16 cm wide, only 4 cm deep
    pts = rng.uniform(-0.08, 0.08, size=(N, 3)).astype(np.float32)
    pts[:, 2] *= 0.25
    P3, UV, V, P6gt, KF = [], [], [], [], []
    for f in range(F):
        R = Rotation.from_rotvec(rng.normal(size=3) * 0.5).as_matrix()
        t = np.array([0.02 * f - 0.05, 0.03, 0.5 + 0.12 * f], np.float32)
        uvz = (pts @ R.T.astype(np.float32) + t) @ K.T
        uv = (uvz[:, :2] / uvz[:, 2:]).astype(np.float32)
        uv += rng.normal(size=uv.shape).astype(np.float32) * 0.5
        out_idx = rng.choice(N, N // 5, replace=False)
        uv[out_idx] = rng.uniform(0, 512, size=(len(out_idx), 2))
        P3.append(pts)
        UV.append(uv)
        V.append(np.ones(N, bool))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        P6gt.append(T)
        KF.append(K)

    K_wrong = K.copy()
    K_wrong[0, 0] *= 0.88
    K_wrong[1, 1] *= 0.88
    cfg = PnPConfig(n_hypotheses=256)
    # per-frame inits under the WRONG K (as self_calibrate does)
    inits, valids = [], []
    for f in range(F):
        res = ransac_pnp(
            jax.random.key(f), jnp.asarray(P3[f]), jnp.asarray(UV[f]),
            jnp.asarray(K_wrong), jnp.asarray(V[f]), cfg,
        )
        inits.append(np.asarray(res.pose6))
        valids.append(np.asarray(res.inliers))

    poses, s, inl = joint_focal_refine(
        jnp.asarray(np.stack(P3)), jnp.asarray(np.stack(UV)),
        jnp.asarray(np.stack(valids)), jnp.asarray(np.stack(inits)),
        jnp.asarray(np.stack([K_wrong] * F)),
    )
    f_rec = float(s) * K_wrong[0, 0]
    assert abs(f_rec - K[0, 0]) / K[0, 0] < 0.01, (f_rec, K[0, 0])
    # poses under the corrected K must be accurate too
    for f in range(F):
        R, t = so3.pose6_to_Rt(poses[f])
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(R)
        T[:3, 3] = np.asarray(t)
        r_err, t_err = metrics.query_pose_error(T, P6gt[f])
        assert r_err < 0.6 and t_err < 1.0, (f, r_err, t_err)
