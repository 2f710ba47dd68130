"""Fused Pallas dual-softmax scoring vs the dense XLA reference path.

Runs in Pallas interpret mode on CPU; the same code compiles to Mosaic on
TPU (exercised by bench.py / verification drives).
"""
import jax
import jax.numpy as jnp
import numpy as np

from onepose_st_tpu.ops import matching
from onepose_st_tpu.ops.pallas_kernels import dual_softmax as fused


def _features(rng, B=1, L=256, S=512, C=32):
    fp = rng.normal(size=(B, L, C)).astype(np.float32)
    fq = rng.normal(size=(B, S, C)).astype(np.float32)
    return jnp.asarray(fp), jnp.asarray(fq)


def test_scores_match_dense(rng):
    fp, fq = _features(rng)
    T = 0.08
    conf = matching.dual_softmax(fp, fq, T)
    row_best, row_j, col_best = fused.fused_match_scores(fp, fq, T)
    np.testing.assert_allclose(
        np.asarray(row_best), np.asarray(jnp.max(conf, 2)), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(col_best), np.asarray(jnp.max(conf, 1)), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(row_j), np.asarray(jnp.argmax(conf, 2))
    )


def test_scores_match_dense_masked(rng):
    fp, fq = _features(rng, L=256)
    mask = jnp.asarray(np.arange(256) < 200)[None]
    T = 0.1
    conf = matching.dual_softmax(fp, fq, T, mask0=mask)
    row_best, row_j, col_best = fused.fused_match_scores(fp, fq, T, mask)
    np.testing.assert_allclose(
        np.asarray(row_best[:, :200]),
        np.asarray(jnp.max(conf, 2)[:, :200]),
        rtol=1e-5,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(col_best), np.asarray(jnp.max(conf, 1)), rtol=1e-5, atol=1e-7
    )


def test_nonaligned_L_padding(rng):
    """L not a multiple of TILE_L is padded internally and unpadded on exit."""
    fp, fq = _features(rng, L=200, S=256)
    row_best, row_j, col_best = fused.fused_match_scores(fp, fq, 0.08)
    assert row_best.shape == (1, 200)
    conf = matching.dual_softmax(fp, fq, 0.08)
    np.testing.assert_allclose(
        np.asarray(row_best), np.asarray(jnp.max(conf, 2)), rtol=1e-5, atol=1e-7
    )


def test_extract_matches_equivalent(rng):
    """Fused extraction selects the same match set as the dense path."""
    B, L, S, C = 1, 256, 16 * 16, 32
    fp, fq = _features(rng, B, L, S, C)
    # sharpen features so some confidences clear the threshold
    fp = fp * 2.0
    fq = fq.at[:, :L].set(fp[:, :S] if L >= S else fp)
    # capacity >= L so top-K never tie-breaks among equal-confidence matches
    T, thr, K = 0.1, 0.2, 256
    border = matching.grid_border_mask((16, 16), 2)

    conf = matching.dual_softmax(fp, fq, T)
    dense = matching.extract_matches(conf, thr, K, border_mask_cols=border)
    fsd = fused.extract_matches_fused(
        fp, fq, T, thr, K, border_mask_cols=border
    )
    dense_set = {
        (int(i), int(j))
        for i, j, v in zip(dense.i_ids[0], dense.j_ids[0], dense.valid[0])
        if v
    }
    fused_set = {
        (int(i), int(j))
        for i, j, v in zip(fsd.i_ids[0], fsd.j_ids[0], fsd.valid[0])
        if v
    }
    assert len(fused_set) > 0
    assert fused_set == dense_set


def test_fused_focal_loss_matches_dense(rng):
    """fused_coarse_focal_loss (Pallas custom-VJP) == dual_softmax +
    coarse_focal_loss, value and gradients."""
    import jax

    from onepose_st_tpu.config import LossConfig
    from onepose_st_tpu.ops import matching as match_ops
    from onepose_st_tpu.ops.pallas_kernels.focal_dsmax import (
        fused_coarse_focal_loss,
    )
    from onepose_st_tpu.train import losses

    B, L, S, C = 2, 96, 64, 32
    temperature = 0.08
    cfg = LossConfig()
    p = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(B, S, C)).astype(np.float32))
    gt_j = jnp.asarray(rng.integers(0, S, size=(B, L)).astype(np.int32))
    gt_valid = jnp.asarray(rng.uniform(size=(B, L)) < 0.4)
    pm = jnp.asarray(np.arange(L)[None, :] < np.array([[L], [L - 10]]))

    def dense(p, q):
        conf = match_ops.dual_softmax(
            p, q, temperature=temperature, mask0=pm
        )
        return losses.coarse_focal_loss(conf, gt_j, gt_valid, pm, cfg)

    def fused(p, q):
        return fused_coarse_focal_loss(
            p, q, gt_j, gt_valid, pm, temperature,
            cfg.focal_alpha, cfg.pos_weight, cfg.neg_weight,
        )

    ld = float(dense(p, q))
    lf = float(fused(p, q))
    np.testing.assert_allclose(lf, ld, rtol=2e-4)
    gd_p, gd_q = jax.grad(dense, argnums=(0, 1))(p, q)
    gf_p, gf_q = jax.grad(fused, argnums=(0, 1))(p, q)
    np.testing.assert_allclose(
        np.asarray(gf_p), np.asarray(gd_p), rtol=2e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gf_q), np.asarray(gd_q), rtol=2e-3, atol=1e-6
    )
