import numpy as np
from scipy.spatial.transform import Rotation

from onepose_st_tpu.core import metrics


def make_pose(rotvec, t):
    T = np.eye(4)
    T[:3, :3] = Rotation.from_rotvec(rotvec).as_matrix()
    T[:3, 3] = t
    return T


def test_query_pose_error_zero():
    T = make_pose([0.1, 0.2, 0.3], [1, 2, 3])
    r, t = metrics.query_pose_error(T, T)
    assert r < 1e-3 and t < 1e-6


def test_query_pose_error_known():
    T0 = make_pose([0, 0, 0], [0, 0, 0])
    T1 = make_pose([0, 0, np.deg2rad(10)], [0.05, 0, 0])  # 10 deg, 5 cm
    r, t = metrics.query_pose_error(T1, T0, unit="m")
    assert np.isclose(r, 10.0, atol=1e-3)
    assert np.isclose(t, 5.0, atol=1e-6)


def test_aggregate_metrics():
    r = np.array([0.5, 2.0, 4.0, 10.0])
    t = np.array([0.5, 2.0, 4.0, 10.0])
    ap = metrics.aggregate_metrics(r, t)
    assert ap["1cm@1degree"] == 0.25
    assert ap["3cm@3degree"] == 0.5
    assert ap["5cm@5degree"] == 0.75


def test_add_metric():
    pts = np.random.default_rng(0).normal(size=(100, 3))
    d = metrics.model_diameter(pts)
    T0 = make_pose([0, 0, 0], [0, 0, 0])
    T_close = make_pose([0, 0, 0], [0.01 * d, 0, 0])
    T_far = make_pose([0, 0, 0], [d, 0, 0])
    assert metrics.add_metric(pts, d, T_close, T0)
    assert not metrics.add_metric(pts, d, T_far, T0)


def test_projection_2d_error_zero():
    pts = np.random.default_rng(1).normal(size=(50, 3)) + [0, 0, 5]
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    T = make_pose([0.1, 0, 0], [0, 0, 2])
    assert metrics.projection_2d_error(pts, T, T, K) < 1e-9


def test_umeyama_align(rng):
    from scipy.spatial.transform import Rotation

    from onepose_st_tpu.core.metrics import ate_rmse, umeyama_align

    src = rng.normal(size=(40, 3))
    R_true = Rotation.from_rotvec([0.2, -0.1, 0.4]).as_matrix()
    s_true, t_true = 1.7, np.array([0.3, -1.2, 0.8])
    dst = s_true * src @ R_true.T + t_true
    R, t, s, err = umeyama_align(src, dst)
    np.testing.assert_allclose(R, R_true, atol=1e-8)
    np.testing.assert_allclose(t, t_true, atol=1e-8)
    assert abs(s - s_true) < 1e-8
    assert err.max() < 1e-8
    assert ate_rmse(src, dst) < 1e-8
    # rigid-only mode recovers R, t when scale is 1
    dst2 = src @ R_true.T + t_true
    R2, t2, s2, err2 = umeyama_align(src, dst2, with_scale=False)
    assert s2 == 1.0 and err2.max() < 1e-8


def test_umeyama_reflection_guard(rng):
    from onepose_st_tpu.core.metrics import umeyama_align

    src = rng.normal(size=(30, 3))
    dst = src.copy()
    dst[:, 2] *= -1  # a reflection: best proper rotation is NOT a mirror
    R, t, s, err = umeyama_align(src, dst)
    assert np.linalg.det(R) > 0.99
