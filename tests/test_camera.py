import jax.numpy as jnp
import numpy as np

from onepose_st_tpu.core import camera, so3


def make_K(fx=500.0, fy=510.0, cx=320.0, cy=240.0):
    return jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], dtype=jnp.float32)


def test_project_unproject_roundtrip(rng):
    K = make_K()
    uv = jnp.asarray(rng.uniform(0, 640, size=(64, 2)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 5.0, size=(64,)).astype(np.float32))
    p_cam = camera.unproject(uv, depth, K)
    # identity pose: project camera points directly
    uv2, d2 = camera.project(p_cam, jnp.zeros((6,)), K, eps=0.0)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-2)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(depth), atol=1e-5)


def test_project_known_pose(rng):
    # camera at (0,0,-2) looking down +z: pose t = (0,0,2)
    K = make_K()
    pose = jnp.array([0, 0, 0, 0, 0, 2.0], dtype=jnp.float32)
    origin = jnp.zeros((1, 3))
    uv, depth = camera.project(origin, pose, K, eps=0.0)
    np.testing.assert_allclose(np.asarray(uv[0]), [320.0, 240.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth[0]), 2.0, atol=1e-6)


def test_world_cam_roundtrip(rng):
    pose = jnp.asarray(
        np.concatenate(
            [rng.normal(size=3) * 0.3, rng.normal(size=3)]
        ).astype(np.float32)
    )
    p_w = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    p_cam = so3.pose6_apply(pose, p_w)
    p_w2 = camera.cam_to_world(p_cam, pose)
    np.testing.assert_allclose(np.asarray(p_w2), np.asarray(p_w), atol=1e-5)


def test_crop_K_center_invariance():
    """A point at the crop-box center projects to the crop image center."""
    K = make_K()
    box = jnp.array([100.0, 80.0, 300.0, 280.0])
    out_hw = (512, 512)
    A = camera.crop_affine(box, out_hw)
    center = jnp.array([200.0, 180.0, 1.0])
    mapped = A @ center
    np.testing.assert_allclose(np.asarray(mapped[:2]), [256.0, 256.0], atol=1e-4)
    # scale: box width 200 -> 512
    assert np.isclose(float(A[0, 0]), 512.0 / 200.0)
    K_crop = camera.crop_K(K, box, out_hw)
    # focal scales by the same factor
    assert np.isclose(float(K_crop[0, 0]), 500.0 * 512.0 / 200.0)


def test_crop_projection_consistency(rng):
    """Projecting with K_crop == affine-transforming the full-image projection."""
    K = make_K()
    box = jnp.array([50.0, 60.0, 450.0, 460.0])
    out_hw = (512, 512)
    pose = jnp.array([0.1, -0.2, 0.05, 0.0, 0.1, 3.0], dtype=jnp.float32)
    pts = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32) * 0.3)
    uv_full, _ = camera.project(pts, pose, K, eps=0.0)
    K_crop = camera.crop_K(K, box, out_hw)
    uv_crop, _ = camera.project(pts, pose, K_crop, eps=0.0)
    A = camera.crop_affine(box, out_hw)
    uv_full_h = jnp.concatenate([uv_full, jnp.ones((20, 1))], axis=-1)
    uv_mapped = (uv_full_h @ A.T)[:, :2]
    np.testing.assert_allclose(np.asarray(uv_crop), np.asarray(uv_mapped), atol=1e-3)


def test_square_box():
    box = jnp.array([0.0, 0.0, 100.0, 40.0])
    sq = np.asarray(camera.square_box(box))
    assert np.isclose(sq[2] - sq[0], 100.0)
    assert np.isclose(sq[3] - sq[1], 100.0)
    assert np.isclose((sq[1] + sq[3]) / 2, 20.0)


def test_bbox_from_points_with_mask(rng):
    uv = jnp.asarray(rng.uniform(0, 100, size=(10, 2)).astype(np.float32))
    valid = jnp.ones((10,), dtype=bool).at[0].set(False)
    uv_big = uv.at[0].set(jnp.array([1e6, 1e6]))
    box = np.asarray(camera.bbox_from_points(uv_big, valid))
    assert box[2] <= 100.0 and box[3] <= 100.0


def test_normalize_3d_keypoints(rng):
    pts = jnp.asarray(rng.uniform(-2, 3, size=(1, 100, 3)).astype(np.float32))
    normed = np.asarray(camera.normalize_3d_keypoints(pts))
    # centered at ~0, scaled so max extent / (0.6*max_extent) ≈ 1/0.6
    assert abs(normed.mean()) < 0.2
    extent = normed.max(axis=1) - normed.min(axis=1)
    assert np.isclose(extent.max(), 1.0 / 0.6, rtol=1e-3)


def test_box3d_corners():
    c = np.asarray(camera.box3d_corners(jnp.array([2.0, 4.0, 6.0])))
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c.max(axis=0), [1.0, 2.0, 3.0])
    np.testing.assert_allclose(c.min(axis=0), [-1.0, -2.0, -3.0])


def test_normalize_3d_keypoints_masked(rng):
    """Zero-padding slots must not contaminate the normalization stats."""
    real = rng.uniform(1.0, 2.0, size=(60, 3)).astype(np.float32)  # off-origin
    padded = np.concatenate([real, np.zeros((140, 3), np.float32)])
    mask = np.arange(200) < 60
    n_masked = np.asarray(
        camera.normalize_3d_keypoints(jnp.asarray(padded[None]), jnp.asarray(mask[None]))
    )[0]
    n_tight = np.asarray(camera.normalize_3d_keypoints(jnp.asarray(real[None])))[0]
    np.testing.assert_allclose(n_masked[:60], n_tight, rtol=1e-5, atol=1e-5)
    # unmasked stats over the zero-padded cloud would differ wildly
    n_unmasked = np.asarray(camera.normalize_3d_keypoints(jnp.asarray(padded[None])))[0]
    assert np.abs(n_unmasked[:60] - n_tight).max() > 0.1
