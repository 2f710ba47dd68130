"""Native C++ track-graph engine vs the pure-Python reference path."""
import numpy as np
import pytest

from onepose_st_tpu import native
from onepose_st_tpu.sfm import tracks as tracks_mod


def random_pair_matches(rng, n_images=12, n_pairs=30, k=60, im_size=256.0):
    pms = []
    for _ in range(n_pairs):
        i, j = rng.choice(n_images, size=2, replace=False)
        pms.append(
            tracks_mod.PairMatches(
                img_i=int(i),
                img_j=int(j),
                uv_i=rng.uniform(0, im_size, size=(k, 2)).astype(np.float32),
                uv_j=rng.uniform(0, im_size, size=(k, 2)).astype(np.float32),
                score=rng.uniform(0.2, 1.0, size=k).astype(np.float32),
            )
        )
    return pms


def consistent_pair_matches(rng, n_images=8, n_points=80, im_size=256.0):
    """Matches derived from shared 'true' points: dense track structure."""
    pts = rng.uniform(0, im_size, size=(n_images, n_points, 2)).astype(np.float32)
    pms = []
    for i in range(n_images):
        for j in range(i + 1, min(i + 4, n_images)):
            sel = rng.choice(n_points, size=n_points // 2, replace=False)
            pms.append(
                tracks_mod.PairMatches(
                    img_i=i, img_j=j,
                    uv_i=pts[i, sel] + rng.normal(0, 0.2, (len(sel), 2)).astype(np.float32),
                    uv_j=pts[j, sel] + rng.normal(0, 0.2, (len(sel), 2)).astype(np.float32),
                    score=rng.uniform(0.2, 1.0, size=len(sel)).astype(np.float32),
                )
            )
    return pms


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.parametrize("maker", [random_pair_matches, consistent_pair_matches])
def test_native_matches_python(rng, maker):
    pms = maker(rng)
    n_images = 1 + max(max(pm.img_i, pm.img_j) for pm in pms)
    kp_py, as_py = tracks_mod.process_matches(
        n_images, pms, max_track_length=8, use_native=False
    )
    kp_nat, as_nat = tracks_mod.process_matches(
        n_images, pms, max_track_length=8, use_native=True
    )
    assert len(kp_py.kpts) == len(kp_nat.kpts)
    for a, b in zip(kp_py.kpts, kp_nat.kpts):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)
    for a, b in zip(kp_py.scores, kp_nat.scores):
        np.testing.assert_allclose(a, b, rtol=1e-5)
    np.testing.assert_array_equal(kp_py.matches, kp_nat.matches)

    np.testing.assert_array_equal(as_py.ref_idx, as_nat.ref_idx)
    np.testing.assert_array_equal(as_py.keyframes, as_nat.keyframes)
    np.testing.assert_array_equal(as_py.mask, as_nat.mask)
    np.testing.assert_array_equal(as_py.obs_idx, as_nat.obs_idx)
    np.testing.assert_array_equal(as_py.obs_kpt_ids, as_nat.obs_kpt_ids)
    np.testing.assert_array_equal(as_py.ref_kpt_ids, as_nat.ref_kpt_ids)
    np.testing.assert_allclose(as_py.kpt0, as_nat.kpt0, atol=1e-4)
    np.testing.assert_allclose(as_py.kpt1, as_nat.kpt1, atol=1e-4)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_empty(rng):
    kp, assigned = tracks_mod.process_matches(4, [], use_native=True)
    assert len(assigned.ref_idx) == 0
    assert all(len(k) == 0 for k in kp.kpts)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_faster_than_python(rng):
    import time

    pms = consistent_pair_matches(rng, n_images=40, n_points=400)
    n_images = 40
    t0 = time.perf_counter()
    tracks_mod.process_matches(n_images, pms, use_native=False)
    t_py = time.perf_counter() - t0
    tracks_mod.process_matches(n_images, pms, use_native=True)  # warm
    t0 = time.perf_counter()
    tracks_mod.process_matches(n_images, pms, use_native=True)
    t_nat = time.perf_counter() - t0
    # marshalling included; the graph core itself is >100x faster
    assert t_nat < t_py, f"native {t_nat:.3f}s not faster than python {t_py:.3f}s"
