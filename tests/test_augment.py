"""SAP homography + photometric augmentation."""
import numpy as np

from onepose_st_tpu.train import augment as aug


def test_homography_identity():
    H = aug.compute_homography_sap(64, 64)
    np.testing.assert_allclose(H, np.eye(3), atol=1e-12)


def test_homography_fold_into_K(rng):
    """project(K' = H @ K) == H applied to project(K) — the folding identity
    the homography adaptation relies on."""
    import jax.numpy as jnp

    from onepose_st_tpu.core import camera

    H = aug.sample_homography_sap(rng, 480, 640)
    K = np.array([[400.0, 0, 320], [0, 410.0, 240], [0, 0, 1]])
    pose6 = np.array([0.1, -0.2, 0.05, 0.01, 0.02, 2.0], np.float32)
    pts = rng.normal(size=(50, 3)).astype(np.float32) * 0.2

    uv, depth = camera.project(jnp.asarray(pts), jnp.asarray(pose6), jnp.asarray(K), eps=0.0)
    uvh = np.concatenate([np.asarray(uv), np.ones((50, 1))], axis=1) @ H.T
    uv_warp_manual = uvh[:, :2] / uvh[:, 2:]

    uv2, _ = camera.project(
        jnp.asarray(pts), jnp.asarray(pose6), jnp.asarray(H @ K), eps=0.0
    )
    np.testing.assert_allclose(np.asarray(uv2), uv_warp_manual, rtol=1e-4, atol=1e-3)


def test_warp_image_convention(rng):
    """warp_image(im, H)[H(u,v)] == im[(u,v)] for a pure translation."""
    im = np.zeros((32, 32), np.float32)
    im[10, 12] = 1.0
    H = aug.compute_homography_sap(32, 32, tx=4 / 16, ty=2 / 16)  # normalized units
    out = aug.warp_image(im, H)
    uvh = H @ np.array([12.0, 10.0, 1.0])
    u, v = uvh[:2] / uvh[2]
    assert out[int(round(v)), int(round(u))] > 0.5


def test_photometric_bounds(rng):
    im = rng.uniform(size=(64, 64)).astype(np.float32)
    for mode in ["dark", "mobile"]:
        p = aug.PhotometricAug(mode, p=1.0)
        for _ in range(10):
            out = p(im, rng)
            assert out.shape == im.shape
            assert out.min() >= 0.0 and out.max() <= 1.0


def test_batches_with_augmentation(rng):
    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.sfm.map import SfMMap
    from onepose_st_tpu.train.data import map_training_batches

    cfg = cfg_lib.EngineConfig(
        matcher=cfg_lib.replace(cfg_lib.MatcherConfig(), n_points=64)
    )
    m = SfMMap(
        keypoints3d=rng.normal(size=(30, 3)).astype(np.float32) * 0.1,
        desc_coarse=rng.normal(size=(30, 8)).astype(np.float32),
        desc_fine=rng.normal(size=(30, 4)).astype(np.float32),
        scores=np.ones(30, np.float32),
    )
    frames = rng.uniform(size=(5, 64, 64)).astype(np.float32)
    poses = np.tile(np.array([0, 0, 0, 0, 0, 1.5], np.float32), (5, 1))
    Ks = np.tile(np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], np.float32), (5, 1, 1))
    it = map_training_batches(
        m, frames, poses, Ks, cfg, rng, batch_size=2,
        homography_prob=1.0, photometric="dark",
    )
    b = next(it)
    assert b.query_image.shape == (2, 64, 64, 1)
    assert np.isfinite(b.query_image).all() and np.isfinite(b.K_crop).all()
    # homography always applied -> K must differ from the pinhole input
    assert not np.allclose(b.K_crop[0], Ks[0])
