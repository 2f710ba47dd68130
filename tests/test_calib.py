"""Deep single-image calibration: bins, decoding, model, quick-fit."""
import math

import numpy as np
import pytest

from onepose_st_tpu.calib import calibrate as cal
from onepose_st_tpu.calib.model import CalibConfig, CalibNet

TINY = CalibConfig(
    num_bins=32, growth_rate=4, block_layers=(2, 2), initial_dim=8,
    head_dense_layers=1, head_hidden=16, image_size=32, dtype="float32",
)


def test_bin_tables():
    c = cal.bin_centers(256)
    assert c["roll"][0] == -45.0 and len(c["roll"]) == 257
    assert c["vfov"][0] == 20.0
    # center-of-bin values map back to their own bin index
    for name in ["roll", "rho", "vfov", "k1_hat"]:
        centers = c[name][:256]
        idx = cal.values_to_bins(name, centers, 256)
        np.testing.assert_array_equal(idx, np.arange(256))


def test_decode_bins_pinhole():
    n = 256
    h, w = 480, 640
    centers = cal.bin_centers(n)
    target_vfov = 55.0
    vbin = int(cal.values_to_bins("vfov", [target_vfov], n)[0])
    lp = {
        "roll": np.eye(n)[10] * 10,
        "rho": np.eye(n)[n // 2] * 10,
        "vfov": np.eye(n)[vbin] * 10,
        "k1_hat": np.eye(n)[5] * 10,
    }
    r = cal.decode_bins(lp, h, w)
    assert r.k1 is None
    assert abs(r.vertical_fov - target_vfov) < 0.5
    expect_fy = h / 2 / math.tan(math.radians(r.vertical_fov) / 2)
    assert abs(r.focal_length_pixels - expect_fy) < 1e-6
    K = r.K
    assert K[0, 2] == w / 2 and K[1, 2] == h / 2
    assert abs(K[1, 1] - expect_fy) < 1e-6
    assert abs(r.roll - centers["roll"][10]) < 1e-9


def test_radial_undistort_roundtrip():
    k1 = -0.2
    y_true = 0.3
    y_dist = y_true * (1 + k1 * y_true**2)
    y = cal._radial_undistort_y(y_dist, k1)
    assert abs(y - y_true) < 1e-10
    # k1 = 0 is the identity
    assert cal.adjust_rho_distortion(0.21, 500.0, 0.0, 640, 480) == pytest.approx(
        0.21 * 480 / 500.0 * 500.0 / 480
    )


def test_calibnet_forward(rng):
    import jax
    import jax.numpy as jnp

    model = CalibNet(TINY)
    img = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.key(0), img, train=False
    )
    out = jax.jit(model.apply)(variables, img)
    assert set(out.keys()) == set(TINY.heads)
    for lp in out.values():
        assert lp.shape == (2, TINY.num_bins)
        np.testing.assert_allclose(
            np.exp(np.asarray(lp)).sum(-1), 1.0, atol=1e-4
        )


@pytest.mark.slow
def test_calib_quickfit(rng):
    from onepose_st_tpu.calib.train import fit_calib, synthetic_calib_batch

    def batches():
        r = np.random.default_rng(1)
        while True:
            yield synthetic_calib_batch(r, batch=16, size=32)

    model, variables, losses = fit_calib(TINY, batches(), n_steps=30, lr=3e-4)
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), (
        f"loss did not decrease: {losses[:3]} -> {losses[-3:]}"
    )


def test_infer_K_average(rng):
    import jax

    model = CalibNet(TINY)
    frames = [
        rng.uniform(size=(48, 64, 3)).astype(np.float32) for _ in range(3)
    ]
    import jax.numpy as jnp

    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    K = cal.infer_K(model, variables, frames)
    assert K.shape == (3, 3)
    assert K[0, 2] == 64 / 2 and K[1, 2] == 48 / 2
    assert K[0, 0] > 0 and K[1, 1] > 0


@pytest.mark.slow
def test_layercam(rng):
    import jax

    from onepose_st_tpu.calib.layercam import layercam, upsample

    model = CalibNet(TINY)
    img = np.random.default_rng(1).uniform(size=(2, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), img, train=False)
    cam, log_probs = layercam(model, variables, img, head="vfov")
    cam = np.asarray(cam)
    assert cam.ndim == 3 and cam.shape[0] == 2
    assert log_probs.shape == (2, TINY.num_bins)
    assert np.all(cam >= 0) and np.all(cam <= 1 + 1e-6)
    # a fixed target bin also works and upsampling hits image resolution
    cam2, _ = layercam(model, variables, img, head="roll", target_bin=3)
    up = np.asarray(upsample(cam2, (32, 32)))
    assert up.shape == (2, 32, 32)


def test_rpv_from_Rt_matches_sampler_construction():
    """The label extractor must invert the perspective sampler's R build
    (R = R_roll @ R_pitch, y-down gravity) exactly."""
    import math

    from onepose_st_tpu.calib.train import rpv_from_Rt

    H = 256
    for roll_deg, rho_raw, vfov_deg in (
        (12.0, 0.4, 55.0), (-30.0, -0.7, 80.0), (0.0, 0.0, 30.0),
        (38.0, 0.9, 95.0),
    ):
        fy = H / 2 / math.tan(math.radians(vfov_deg) / 2)
        pitch = math.atan(rho_raw * 0.35 * H / fy)
        roll = math.radians(roll_deg)
        cp, sp = math.cos(pitch), math.sin(pitch)
        cr, sr = math.cos(roll), math.sin(roll)
        R_pitch = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        R_roll = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
        R = R_roll @ R_pitch
        K = np.array([[fy, 0, H / 2], [0, fy, H / 2], [0, 0, 1]])
        r, rho, v = rpv_from_Rt(R, K, H)
        assert abs(r - roll_deg) < 1e-6, (r, roll_deg)
        assert abs(rho - rho_raw) < 1e-6, (rho, rho_raw)
        assert abs(v - vfov_deg) < 1e-6, (v, vfov_deg)


def test_wild_scene_calib_batch_shapes(rng):
    from onepose_st_tpu.calib.train import (
        perspective_calib_batch, wild_scene_calib_batch,
    )

    b = wild_scene_calib_batch(rng, 3, size=64, render_size=128)
    assert b.image.shape == (3, 64, 64, 3)
    assert np.all(np.abs(b.roll_deg) <= 40)
    assert np.all((b.vfov_deg >= 22) & (b.vfov_deg <= 103))
    mixed = perspective_calib_batch(
        rng, 4, size=64, render_size=128, wild_frac=0.5
    )
    assert mixed.image.shape == (4, 64, 64, 3)
