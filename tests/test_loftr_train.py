"""Tests for the 2D-2D LoFTR training stack (supervision, step, learning).

The reference ships LoFTR pretrained and untested; our from-scratch
training path is validated on CPU with exact synthetic ground truth.
"""
import numpy as np
import pytest

from onepose_st_tpu import config as cfg_lib
from onepose_st_tpu.data import synthetic
from onepose_st_tpu.train import loftr_data


def tiny_loftr_cfg():
    return cfg_lib.LoFTRConfig(
        backbone=cfg_lib.BackboneConfig(
            initial_dim=8, block_dims=(8, 12, 16), dtype="float32"
        ),
        coarse=cfg_lib.TransformerConfig(
            d_model=16, nhead=2, layer_iter_n=1, dtype="float32"
        ),
        coarse_matching=cfg_lib.CoarseMatchingConfig(
            threshold=0.2, temperature=0.1, max_matches=32,
            train_pad_num_gt_min=16, border_rm=1,
        ),
        fine=cfg_lib.FineMatchingConfig(
            window_size=5, d_model=8, nhead=2, dtype="float32"
        ),
    )


def test_homography_supervision_identity():
    gt_j, valid, uv = loftr_data.homography_supervision(
        np.eye(3), (64, 64), stride=8
    )
    S = 64
    assert gt_j.shape == (S,) and valid.all()
    np.testing.assert_array_equal(gt_j, np.arange(S))
    np.testing.assert_allclose(uv, loftr_data.cell_anchors((64, 64), 8))


def test_homography_supervision_shift():
    # pure translation by exactly one coarse cell in x
    H = np.array([[1, 0, 8.0], [0, 1, 0], [0, 0, 1]])
    gt_j, valid, uv = loftr_data.homography_supervision(H, (64, 64), stride=8)
    Wc = 8
    cells = np.arange(64)
    expected_valid = (cells % Wc) < Wc - 1  # last column warps out
    np.testing.assert_array_equal(valid, expected_valid)
    np.testing.assert_array_equal(gt_j[expected_valid], cells[expected_valid] + 1)


def test_multiview_supervision_matches_scene():
    rng = np.random.default_rng(0)
    scene = synthetic.make_scene(
        rng, n_points=60, n_frames=6, image_hw=(64, 64), focal=80.0
    )
    gt_j, gt_valid, uv_gt, row_mask = loftr_data.multiview_supervision(
        scene, 0, 1, stride=8
    )
    assert row_mask.sum() > 0
    # every supervised-and-valid row's uv must be some point's projection in
    # view 1, and that point must project into the row's cell in view 0
    Wc = 8
    for cell in np.nonzero(gt_valid)[0]:
        uv = uv_gt[cell]
        d = np.linalg.norm(scene.uv[1] - uv, axis=1)
        p = int(np.argmin(d))
        assert d[p] < 1e-4
        assert scene.visible[0, p] and scene.visible[1, p]
        u0, v0 = scene.uv[0, p]
        assert int(v0 // 8) * Wc + int(u0 // 8) == cell


def test_texture_row_mask():
    img = np.zeros((32, 32), np.float32)
    img[10:14, 10:14] = 1.0  # contrast inside cell (1, 1)
    mask = loftr_data.texture_row_mask(img, stride=8)
    assert mask.reshape(4, 4)[1, 1]
    assert not mask[0]  # top-left cell is uniform


def test_loftr_batches_shapes():
    rng = np.random.default_rng(0)
    bank = loftr_data.make_scene_bank(
        rng, n_scenes=1, n_frames=4, n_points=50, image_hw=(64, 64)
    )
    it = loftr_data.loftr_batches(
        rng, stride=8, batch_size=2, image_hw=(64, 64), bank=bank,
        p_homography=0.5, n_textures=2,
    )
    b = next(it)
    assert b.image0.shape == (2, 64, 64, 1)
    assert b.gt_j.shape == (2, 64)
    assert b.uv_gt.shape == (2, 64, 2)
    assert b.gt_valid.dtype == bool and b.row_mask.dtype == bool
    # valid rows are always supervised rows
    assert not (b.gt_valid & ~b.row_mask).any()


@pytest.mark.slow
def test_loftr_train_learns():
    """A tiny LoFTR learns identity-ish homography matching in ~60 steps."""
    import jax

    from onepose_st_tpu.models.loftr import LoFTRMatcher
    from onepose_st_tpu.train import loftr_train

    cfg = tiny_loftr_cfg()
    train_cfg = cfg_lib.replace(
        cfg_lib.TrainConfig(), batch_size_per_device=2, canonical_lr=2e-3
    )
    model = LoFTRMatcher(cfg)
    rng = np.random.default_rng(0)
    easy = dict(max_angle=10.0, translation=0.06, scale_range=(0.9, 1.08),
                k1_range=0.0, perspective=0.03)
    batches = loftr_data.loftr_batches(
        rng, stride=8, batch_size=2, image_hw=(64, 64),
        p_homography=1.0, n_textures=4, photometric="none",
        homography_kwargs=easy,
    )
    state, history = loftr_train.fit_loftr(
        cfg, train_cfg, model, batches, n_steps=150, log_every=15,
    )
    losses = [h["loss"] for h in history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses

    # held-out precision beats chance comfortably (extraction threshold
    # lowered: 150 CPU steps don't reach production confidence levels)
    eval_batch = next(loftr_data.loftr_batches(
        np.random.default_rng(1), stride=8, batch_size=4,
        image_hw=(64, 64), p_homography=1.0, n_textures=2,
        photometric="none", homography_kwargs=easy,
    ))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_model = LoFTRMatcher(cfg_lib.replace(
        cfg, coarse_matching=cfg_lib.replace(cfg.coarse_matching, threshold=0.02)
    ))
    stats = loftr_train.match_precision(eval_model, variables, eval_batch)
    assert stats["n_matches"] >= 2, stats
    # 9-cell tolerance window out of 64 cells -> chance ~0.14
    assert stats["precision"] > 0.5, stats


@pytest.mark.slow
def test_loftr_coarse_fine_methods_consistent():
    """coarse()+fine() compose to the same outputs as __call__."""
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu.models.loftr import LoFTRMatcher

    cfg = tiny_loftr_cfg()
    model = LoFTRMatcher(cfg)
    rng = np.random.default_rng(0)
    im0 = jnp.asarray(rng.uniform(size=(1, 64, 64, 1)).astype(np.float32))
    im1 = jnp.asarray(rng.uniform(size=(1, 64, 64, 1)).astype(np.float32))
    variables = model.init(jax.random.key(0), im0, im1)
    full = model.apply(variables, im0, im1, dense_conf=True)
    out = model.apply(variables, im0, im1, dense_conf=True,
                      method=LoFTRMatcher.coarse)
    fine = model.apply(
        variables, out["feat_f0"], out["feat_f1"],
        out["matches"].i_ids, out["matches"].j_ids, out["coarse_hw"],
        method=LoFTRMatcher.fine,
    )
    np.testing.assert_allclose(
        np.asarray(full["mkpts1_f"]), np.asarray(fine["mkpts1_f"]), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(full["i_ids"]), np.asarray(out["matches"].i_ids)
    )
