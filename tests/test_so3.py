import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from onepose_st_tpu.core import so3


def random_rotvecs(rng, n=32, max_angle=3.0):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


def test_exp_matches_scipy(rng):
    w = random_rotvecs(rng)
    R = np.asarray(so3.exp(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_exp_log_roundtrip(rng):
    w = random_rotvecs(rng, max_angle=2.9)
    w2 = np.asarray(so3.log(so3.exp(jnp.asarray(w))))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_exp_at_zero_identity():
    R = np.asarray(so3.exp(jnp.zeros((3,))))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_exp_grad_finite_at_zero():
    g = jax.grad(lambda w: jnp.sum(so3.exp(w)))(jnp.zeros((3,)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_rotate_point_matches_matrix(rng):
    w = random_rotvecs(rng)
    p = rng.normal(size=(32, 3)).astype(np.float32)
    got = np.asarray(so3.rotate_point(jnp.asarray(w), jnp.asarray(p)))
    want = np.einsum("nij,nj->ni", Rotation.from_rotvec(w).as_matrix(), p)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotate_point_zero_angle(rng):
    p = rng.normal(size=(8, 3)).astype(np.float32)
    got = np.asarray(so3.rotate_point(jnp.zeros((8, 3)), jnp.asarray(p)))
    np.testing.assert_allclose(got, p, atol=1e-6)


def test_quat_roundtrip(rng):
    w = random_rotvecs(rng)
    R = so3.exp(jnp.asarray(w))
    q = so3.matrix_to_quat(R)
    R2 = so3.quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_quat_matches_scipy_convention(rng):
    w = random_rotvecs(rng, n=8)
    R_ref = Rotation.from_rotvec(w)
    q_scipy = R_ref.as_quat()  # (x, y, z, w)
    q_wxyz = np.concatenate([q_scipy[:, 3:4], q_scipy[:, :3]], axis=-1)
    R = np.asarray(so3.quat_to_matrix(jnp.asarray(q_wxyz.astype(np.float32))))
    np.testing.assert_allclose(R, R_ref.as_matrix(), atol=1e-5)


def test_pose6_inverse_compose(rng):
    w = random_rotvecs(rng, n=16)
    t = rng.normal(size=(16, 3)).astype(np.float32)
    pose = jnp.concatenate([jnp.asarray(w), jnp.asarray(t)], axis=-1)
    p = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    p2 = so3.pose6_apply(so3.pose6_inverse(pose), so3.pose6_apply(pose, p))
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-4)


def test_pose6_from_to_Rt(rng):
    w = random_rotvecs(rng, n=8)
    t = rng.normal(size=(8, 3)).astype(np.float32)
    R = so3.exp(jnp.asarray(w))
    pose = so3.pose6_from_Rt(R, jnp.asarray(t))
    R2, t2 = so3.pose6_to_Rt(pose)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-6)
