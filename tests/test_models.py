import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onepose_st_tpu import config as cfg_lib
from onepose_st_tpu.models import LoFTRMatcher, OnePoseMatcher
from onepose_st_tpu.models.backbone import ResNetFPN


def small_matcher_cfg():
    return cfg_lib.MatcherConfig(
        backbone=cfg_lib.BackboneConfig(
            initial_dim=16, block_dims=(16, 24, 32), dtype="float32"
        ),
        coarse=cfg_lib.TransformerConfig(d_model=32, nhead=4, layer_iter_n=1, dtype="float32"),
        coarse_matching=cfg_lib.CoarseMatchingConfig(max_matches=32),
        fine=cfg_lib.FineMatchingConfig(window_size=5, d_model=16, nhead=4, dtype="float32"),
        kpt_encoding=cfg_lib.KeypointEncodingConfig(hidden=(8, 16), descriptor_dim=32),
        n_points=64,
    )


def small_loftr_cfg():
    return cfg_lib.LoFTRConfig(
        backbone=cfg_lib.BackboneConfig(
            initial_dim=16, block_dims=(16, 24, 32), dtype="float32"
        ),
        coarse=cfg_lib.TransformerConfig(d_model=32, nhead=4, layer_iter_n=1, dtype="float32"),
        coarse_matching=cfg_lib.CoarseMatchingConfig(
            temperature=0.1, threshold=0.2, max_matches=32
        ),
        fine=cfg_lib.FineMatchingConfig(window_size=5, d_model=16, nhead=4, dtype="float32"),
    )


def test_backbone_shapes(rng):
    cfg = cfg_lib.BackboneConfig(initial_dim=16, block_dims=(16, 24, 32), dtype="float32")
    model = ResNetFPN(cfg)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 1)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)
    fc, ff = model.apply(variables, x, train=False)
    assert fc.shape == (2, 8, 8, 32)
    assert ff.shape == (2, 32, 32, 16)
    assert np.all(np.isfinite(np.asarray(fc)))


def test_onepose_matcher_forward(rng):
    cfg = small_matcher_cfg()
    model = OnePoseMatcher(cfg)
    B, H, W, L = 1, 64, 64, cfg.n_points
    img = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))
    kpts = jnp.asarray(rng.normal(size=(B, L, 3)).astype(np.float32))
    dc = jnp.asarray(rng.normal(size=(B, L, 32)).astype(np.float32))
    df = jnp.asarray(rng.normal(size=(B, L, 16)).astype(np.float32))
    mask = jnp.ones((B, L), dtype=bool)
    variables = model.init(jax.random.key(0), img, kpts, dc, df, mask)
    out = model.apply(variables, img, kpts, dc, df, mask, dense_conf=True)
    S = (H // 8) * (W // 8)
    K = cfg.coarse_matching.max_matches
    assert out["conf_matrix"].shape == (B, L, S)
    assert out["mkpts3d"].shape == (B, K, 3)
    assert out["mkpts_query_f"].shape == (B, K, 2)
    assert out["expec_f"].shape == (B, K, 3)
    conf = np.asarray(out["conf_matrix"])
    assert np.all(np.isfinite(conf)) and conf.min() >= 0 and conf.max() <= 1 + 1e-5
    # fine coords stay within window radius of coarse coords
    d = np.abs(np.asarray(out["mkpts_query_f"]) - np.asarray(out["mkpts_query_c"]))
    assert d.max() <= (cfg.fine.window_size // 2) * cfg.backbone.fine_stride + 1e-3


def test_onepose_matcher_point_mask(rng):
    """Masked (padding) points must get ~zero coarse confidence rows."""
    cfg = small_matcher_cfg()
    model = OnePoseMatcher(cfg)
    B, H, W, L = 1, 64, 64, cfg.n_points
    img = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))
    kpts = jnp.asarray(rng.normal(size=(B, L, 3)).astype(np.float32))
    dc = jnp.asarray(rng.normal(size=(B, L, 32)).astype(np.float32))
    df = jnp.asarray(rng.normal(size=(B, L, 16)).astype(np.float32))
    mask = jnp.asarray(np.arange(L) < L // 2)[None]
    variables = model.init(jax.random.key(0), img, kpts, dc, df, mask)
    out = model.apply(variables, img, kpts, dc, df, mask, dense_conf=True)
    conf = np.asarray(out["conf_matrix"])
    assert conf[0, L // 2 :].max() < 1e-6
    # no extracted match may point at a padded point
    m = out["matches"]
    assert np.all(np.asarray(m.i_ids)[np.asarray(m.valid)] < L // 2)


def test_onepose_matcher_fine_ids_override(rng):
    cfg = small_matcher_cfg()
    model = OnePoseMatcher(cfg)
    B, H, W, L = 1, 64, 64, cfg.n_points
    img = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))
    kpts = jnp.asarray(rng.normal(size=(B, L, 3)).astype(np.float32))
    dc = jnp.asarray(rng.normal(size=(B, L, 32)).astype(np.float32))
    df = jnp.asarray(rng.normal(size=(B, L, 16)).astype(np.float32))
    variables = model.init(jax.random.key(0), img, kpts, dc, df)
    i_ids = jnp.asarray(rng.integers(0, L, size=(B, 16)).astype(np.int32))
    j_ids = jnp.asarray(rng.integers(0, 64, size=(B, 16)).astype(np.int32))
    out = model.apply(variables, img, kpts, dc, df, fine_ids=(i_ids, j_ids))
    assert out["mkpts_query_f"].shape == (B, 16, 2)
    np.testing.assert_array_equal(np.asarray(out["i_ids"]), np.asarray(i_ids))


def test_loftr_matcher_forward(rng):
    cfg = small_loftr_cfg()
    model = LoFTRMatcher(cfg)
    B, H, W = 1, 64, 64
    img0 = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))
    img1 = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))
    variables = model.init(jax.random.key(0), img0, img1)
    out = model.apply(variables, img0, img1, dense_conf=True)
    S = (H // 8) * (W // 8)
    K = cfg.coarse_matching.max_matches
    assert out["conf_matrix"].shape == (B, S, S)
    assert out["mkpts0_c"].shape == (B, K, 2)
    assert out["mkpts1_f"].shape == (B, K, 2)
    assert np.all(np.isfinite(np.asarray(out["mkpts1_f"])))


def test_loftr_identical_images_match_diagonal(rng):
    """Matching an image against itself: valid matches must be i == j."""
    cfg = small_loftr_cfg()
    model = LoFTRMatcher(cfg)
    B, H, W = 1, 64, 64
    img = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))
    variables = model.init(jax.random.key(0), img, img)
    out = model.apply(variables, img, img)
    valid = np.asarray(out["valid"][0])
    if valid.any():
        i = np.asarray(out["i_ids"][0])[valid]
        j = np.asarray(out["j_ids"][0])[valid]
        np.testing.assert_array_equal(i, j)


def test_onepose_matcher_fused_equals_dense(rng):
    """Inference (fused Pallas) and dense (training) coarse paths must agree."""
    cfg = small_matcher_cfg()
    model = OnePoseMatcher(cfg)
    B, H, W, L = 1, 64, 64, cfg.n_points
    img = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))
    kpts = jnp.asarray(rng.normal(size=(B, L, 3)).astype(np.float32))
    dc = jnp.asarray(rng.normal(size=(B, L, 32)).astype(np.float32))
    df = jnp.asarray(rng.normal(size=(B, L, 16)).astype(np.float32))
    mask = jnp.asarray(np.arange(L) < L - 8)[None]
    variables = model.init(jax.random.key(0), img, kpts, dc, df, mask)
    dense = model.apply(variables, img, kpts, dc, df, mask, dense_conf=True)
    fsd = model.apply(variables, img, kpts, dc, df, mask)
    ds = {
        (int(i), int(j))
        for i, j, v in zip(
            dense["matches"].i_ids[0], dense["matches"].j_ids[0],
            dense["matches"].valid[0],
        )
        if v
    }
    fs = {
        (int(i), int(j))
        for i, j, v in zip(
            fsd["matches"].i_ids[0], fsd["matches"].j_ids[0],
            fsd["matches"].valid[0],
        )
        if v
    }
    assert fs == ds


def test_onepose_matcher_img_mask(rng):
    """Visibility-masked matching: masked cells never produce matches, the
    fused and dense paths agree under the mask, and a fully-True mask
    reproduces the unmasked output."""
    cfg = small_matcher_cfg()
    model = OnePoseMatcher(cfg)
    B, H, W, L = 1, 64, 64, cfg.n_points
    img = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))
    kpts = jnp.asarray(rng.normal(size=(B, L, 3)).astype(np.float32))
    dc = jnp.asarray(rng.normal(size=(B, L, 32)).astype(np.float32))
    df = jnp.asarray(rng.normal(size=(B, L, 16)).astype(np.float32))
    mask = jnp.asarray(np.arange(L) < L - 8)[None]
    variables = model.init(jax.random.key(0), img, kpts, dc, df, mask)

    Hc = Wc = H // cfg.backbone.coarse_stride
    S = Hc * Wc
    # mask out the right half of the grid (a truncated-object framing)
    col = np.arange(S) % Wc
    img_mask = jnp.asarray((col < Wc // 2)[None])

    dense = model.apply(
        variables, img, kpts, dc, df, mask, dense_conf=True, img_mask=img_mask
    )
    fsd = model.apply(variables, img, kpts, dc, df, mask, img_mask=img_mask)
    for out in (dense, fsd):
        m = out["matches"]
        js = np.asarray(m.j_ids[0])[np.asarray(m.valid[0])]
        assert np.all(np.asarray(img_mask[0])[js]), "match in a masked cell"
    ds = {
        (int(i), int(j))
        for i, j, v in zip(
            dense["matches"].i_ids[0], dense["matches"].j_ids[0],
            dense["matches"].valid[0],
        )
        if v
    }
    fs = {
        (int(i), int(j))
        for i, j, v in zip(
            fsd["matches"].i_ids[0], fsd["matches"].j_ids[0],
            fsd["matches"].valid[0],
        )
        if v
    }
    assert fs == ds
    # all-True mask == no mask
    ones = jnp.ones((B, S), bool)
    base = model.apply(variables, img, kpts, dc, df, mask)
    masked = model.apply(variables, img, kpts, dc, df, mask, img_mask=ones)
    np.testing.assert_array_equal(
        np.asarray(base["matches"].j_ids), np.asarray(masked["matches"].j_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(base["matches"].valid), np.asarray(masked["matches"].valid)
    )


def test_valid_cell_mask_geometry():
    """Crop fully inside the frame -> all cells valid; crop hanging past the
    left frame edge -> exactly the warp-fill cells invalid."""
    from onepose_st_tpu.data import images as img_ops

    frame = np.zeros((128, 128), np.float32)
    # box fully inside
    _, A3 = img_ops.crop_image(frame, np.array([16.0, 16.0, 112.0, 112.0]), (64, 64))
    m = img_ops.valid_cell_mask(A3, (128, 128), (64, 64), 8)
    assert m.all()
    # box hanging 48 px past the left edge: box [-48, 16, 48, 112] -> the
    # left half of the crop is warp fill
    _, A3 = img_ops.crop_image(frame, np.array([-48.0, 16.0, 48.0, 112.0]), (64, 64))
    m = img_ops.valid_cell_mask(A3, (128, 128), (64, 64), 8).reshape(8, 8)
    assert not m[:, :4].any()      # fill half
    assert m[:, 4:].all() or m[:, 5:].all()  # real half (edge cell may clip)


def test_supervision_img_mask_gates_gt(rng):
    """GT projections landing in masked (warp-fill) cells must be invalid."""
    from onepose_st_tpu.train import supervision

    B, L, H, W, stride = 1, 16, 64, 64, 8
    Wc = W // stride
    S = (H // stride) * Wc
    # identity-ish camera: points at z=1, uv = f*x + c
    K = jnp.asarray(np.array(
        [[[32.0, 0, 32.0], [0, 32.0, 32.0], [0, 0, 1]]], np.float32))
    pts = rng.uniform(-0.9, 0.9, size=(B, L, 3)).astype(np.float32)
    pts[..., 2] = 1.0
    pose = jnp.zeros((B, 6), jnp.float32)
    sup_full = supervision.project_gt(
        jnp.asarray(pts), pose, K, (H, W), stride,
        img_mask=jnp.ones((B, S), bool),
    )
    col = np.arange(S) % Wc
    left_only = jnp.asarray((col < Wc // 2)[None])
    sup_masked = supervision.project_gt(
        jnp.asarray(pts), pose, K, (H, W), stride, img_mask=left_only,
    )
    gj = np.asarray(sup_full.gt_j[0])
    in_left = (gj % Wc) < Wc // 2
    np.testing.assert_array_equal(
        np.asarray(sup_masked.gt_valid[0]),
        np.asarray(sup_full.gt_valid[0]) & in_left,
    )
