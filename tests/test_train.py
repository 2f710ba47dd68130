import jax
import jax.numpy as jnp
import numpy as np

from onepose_st_tpu import config as cfg_lib
from onepose_st_tpu.models import OnePoseMatcher
from onepose_st_tpu.train import losses, step, supervision
import pytest


def tiny_engine_cfg():
    matcher = cfg_lib.MatcherConfig(
        backbone=cfg_lib.BackboneConfig(
            initial_dim=8, block_dims=(8, 12, 16), dtype="float32"
        ),
        coarse=cfg_lib.TransformerConfig(d_model=16, nhead=2, layer_iter_n=1, dtype="float32"),
        coarse_matching=cfg_lib.CoarseMatchingConfig(
            max_matches=16, train_pad_num_gt_min=8
        ),
        fine=cfg_lib.FineMatchingConfig(window_size=5, d_model=8, nhead=2, dtype="float32"),
        kpt_encoding=cfg_lib.KeypointEncodingConfig(hidden=(8,), descriptor_dim=16),
        n_points=32,
    )
    return cfg_lib.EngineConfig(matcher=matcher)


def make_batch(rng, cfg, B=2, H=64, W=64):
    L = cfg.matcher.n_points
    # points in front of an identity-ish camera so many project in-bounds
    kpts = rng.uniform(-0.5, 0.5, size=(B, L, 3)).astype(np.float32)
    kpts[..., 2] += 3.0
    K = np.tile(
        np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32),
        (B, 1, 1),
    )
    return step.Batch(
        query_image=rng.uniform(size=(B, H, W, 1)).astype(np.float32),
        kpts3d=kpts,
        desc3d_coarse=rng.normal(size=(B, L, 16)).astype(np.float32),
        desc3d_fine=rng.normal(size=(B, L, 8)).astype(np.float32),
        point_mask=np.ones((B, L), bool),
        pose_gt=np.zeros((B, 6), np.float32),
        K_crop=K,
    )


def test_project_gt(rng):
    cfg = tiny_engine_cfg()
    batch = make_batch(rng, cfg)
    sup = supervision.project_gt(
        jnp.asarray(batch.kpts3d),
        jnp.asarray(batch.pose_gt),
        jnp.asarray(batch.K_crop),
        (64, 64),
        8,
        jnp.asarray(batch.point_mask),
    )
    uv = np.asarray(sup.uv_gt)
    valid = np.asarray(sup.gt_valid)
    assert valid.mean() > 0.5  # most points project in-bounds by construction
    # check cell assignment against manual computation
    j = np.asarray(sup.gt_j)
    man = (np.floor(uv[..., 1] / 8) * 8 + np.floor(uv[..., 0] / 8)).astype(int)
    np.testing.assert_array_equal(j[valid], man[valid])


def test_select_train_slots_contains_gt(rng):
    cfg = tiny_engine_cfg()
    batch = make_batch(rng, cfg, B=1)
    sup = supervision.project_gt(
        jnp.asarray(batch.kpts3d), jnp.asarray(batch.pose_gt),
        jnp.asarray(batch.K_crop), (64, 64), 8, jnp.asarray(batch.point_mask),
    )
    K = cfg.matcher.coarse_matching.max_matches
    pred_i = jnp.zeros((1, K), jnp.int32)
    pred_j = jnp.zeros((1, K), jnp.int32)
    pred_v = jnp.zeros((1, K), bool)
    i_ids, j_ids, is_gt = supervision.select_train_slots(
        jax.random.key(0), pred_i, pred_j, pred_v, sup, n_gt_pad=8
    )
    assert i_ids.shape == (1, K)
    is_gt = np.asarray(is_gt)
    assert is_gt[:, -8:].sum() > 0  # some GT pads selected
    # every GT pad must be a valid (i -> gt_j[i]) pair
    gi = np.asarray(i_ids)[0, -8:]
    gj = np.asarray(j_ids)[0, -8:]
    gt_j = np.asarray(sup.gt_j)[0]
    ok = np.asarray(is_gt)[0, -8:]
    np.testing.assert_array_equal(gj[ok], gt_j[gi[ok]])


def test_focal_loss_prefers_correct_conf():
    cfg = cfg_lib.LossConfig()
    B, L, S = 1, 4, 8
    gt_j = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    valid = jnp.ones((B, L), bool)
    good = jnp.full((B, L, S), 0.01)
    for i in range(4):
        good = good.at[0, i, i].set(0.95)
    bad = jnp.full((B, L, S), 0.5)
    l_good = losses.coarse_focal_loss(good, gt_j, valid, valid, cfg)
    l_bad = losses.coarse_focal_loss(bad, gt_j, valid, valid, cfg)
    assert float(l_good) < float(l_bad)


def test_fine_loss_zero_offset():
    cfg = cfg_lib.LossConfig()
    expec = jnp.concatenate(
        [jnp.zeros((1, 8, 2)), 0.5 * jnp.ones((1, 8, 1))], axis=-1
    )
    gt = jnp.zeros((1, 8, 2))
    valid = jnp.ones((1, 8), bool)
    assert float(losses.fine_l2_std_loss(expec, gt, valid, cfg)) < 1e-9
    gt_off = jnp.full((1, 8, 2), 0.5)
    assert float(losses.fine_l2_std_loss(expec, gt_off, valid, cfg)) > 0.1


@pytest.mark.slow
def test_train_step_runs_and_descends(rng):
    cfg = tiny_engine_cfg()
    model = OnePoseMatcher(cfg.matcher)
    batch_np = make_batch(rng, cfg, B=2)
    batch = jax.tree.map(jnp.asarray, batch_np)
    tx = step.make_optimizer(cfg.train, world_size=1, steps_per_epoch=100)
    state = step.init_state(jax.random.key(0), model, tx, batch)

    jitted = jax.jit(
        step.train_step, static_argnames=("model", "tx", "cfg")
    )
    losses_seen = []
    for i in range(8):
        state, scalars = jitted(
            state, batch, jax.random.key(i), model=model, tx=tx, cfg=cfg
        )
        losses_seen.append(float(scalars["loss"]))
    assert all(np.isfinite(losses_seen))
    assert float(scalars["grad_norm"]) > 0
    # overfitting a single fixed batch must reduce the loss
    assert losses_seen[-1] < losses_seen[0]


@pytest.mark.slow
def test_freeze_backbone_schedule(rng):
    """Backbone params must stay fixed for the first N steps, then move
    (reference src/callbacks/custom_callbacks.py unfreeze-after-N-epochs)."""
    cfg = tiny_engine_cfg()
    cfg = cfg_lib.replace(
        cfg, train=cfg_lib.replace(cfg.train, freeze_backbone_steps=2)
    )
    model = OnePoseMatcher(cfg.matcher)
    batch = jax.tree.map(jnp.asarray, make_batch(rng, cfg, B=2))
    tx = step.make_optimizer(cfg.train, world_size=1, steps_per_epoch=100)
    state = step.init_state(jax.random.key(0), model, tx, batch)
    bb0 = jax.tree.map(np.asarray, state.params["backbone"])

    jitted = jax.jit(step.train_step, static_argnames=("model", "tx", "cfg"))
    for i in range(2):
        state, _ = jitted(
            state, batch, jax.random.key(i), model=model, tx=tx, cfg=cfg
        )
    frozen = jax.tree.map(
        lambda a, b: np.array_equal(a, np.asarray(b)),
        bb0, state.params["backbone"],
    )
    assert all(jax.tree.leaves(frozen)), "backbone moved while frozen"
    # non-backbone params must have trained during the freeze
    init_state2 = step.init_state(jax.random.key(0), model, tx, batch)
    moved = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        init_state2.params["loftr_coarse"],
        state.params["loftr_coarse"],
    )
    assert any(jax.tree.leaves(moved))
    for i in range(2, 4):
        state, _ = jitted(
            state, batch, jax.random.key(i), model=model, tx=tx, cfg=cfg
        )
    unfrozen = jax.tree.map(
        lambda a, b: not np.allclose(a, np.asarray(b)),
        bb0, state.params["backbone"],
    )
    assert any(jax.tree.leaves(unfrozen)), "backbone never unfroze"


@pytest.mark.slow
def test_gradient_accumulation(rng):
    """accumulate_steps=k updates params only every k micro-steps, and k
    identical micro-batches produce exactly one plain optimizer step
    (reference train.yaml:33 accumulate_grad_batches: 2)."""
    cfg = tiny_engine_cfg()
    cfg_acc = cfg_lib.replace(
        cfg, train=cfg_lib.replace(cfg.train, accumulate_steps=2)
    )
    model = OnePoseMatcher(cfg.matcher)
    b1 = jax.tree.map(jnp.asarray, make_batch(rng, cfg, B=2))

    tx = step.make_optimizer(cfg_acc.train, world_size=1, steps_per_epoch=100)
    state = step.init_state(jax.random.key(0), model, tx, b1)
    p0 = jax.tree.map(np.asarray, state.params)
    jitted = jax.jit(step.train_step, static_argnames=("model", "tx", "cfg"))

    # micro-step 1: gradients buffered, params unchanged
    state, _ = jitted(state, b1, jax.random.key(9), model=model, tx=tx,
                      cfg=cfg_acc)
    unchanged = jax.tree.map(
        lambda a, b: np.array_equal(a, np.asarray(b)), p0, state.params
    )
    assert all(jax.tree.leaves(unchanged)), "params moved mid-accumulation"
    # micro-step 2: the averaged update is applied
    state, _ = jitted(state, b1, jax.random.key(9), model=model, tx=tx,
                      cfg=cfg_acc)
    moved = jax.tree.map(
        lambda a, b: not np.array_equal(a, np.asarray(b)), p0, state.params
    )
    assert any(jax.tree.leaves(moved)), "accumulated update never applied"

    # average of two identical gradients == the gradient: the accumulated
    # update must equal one plain (accum=1) step on the same batch
    tx1 = step.make_optimizer(cfg.train, world_size=1, steps_per_epoch=100)
    state1 = step.init_state(jax.random.key(0), model, tx1, b1)
    state1, _ = jitted(state1, b1, jax.random.key(9), model=model,
                       tx=tx1, cfg=cfg)
    close = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        state.params, state1.params,
    )
    assert all(jax.tree.leaves(close)), "k-step accum != one plain step"


@pytest.mark.slow
def test_resume_is_bit_exact(tmp_path, rng):
    """Full-state checkpoint resume: killing a run at step 2 and resuming
    reproduces the uninterrupted run exactly — optimizer moments, step
    counter, and the fold_in RNG stream all survive (reference: PL
    resume_from_checkpoint)."""
    from onepose_st_tpu.train import loop as loop_mod

    cfg = tiny_engine_cfg()
    model = OnePoseMatcher(cfg.matcher)
    batches = [make_batch(rng, cfg, B=2) for _ in range(4)]

    d_full = tmp_path / "full"
    state_full, _ = loop_mod.fit(
        cfg, model, iter(batches), n_steps=4,
        ckpt_dir=d_full, ckpt_every=2, log_every=10,
    )

    d_cut = tmp_path / "cut"
    loop_mod.fit(
        cfg, model, iter(batches[:2]), n_steps=2,
        ckpt_dir=d_cut, ckpt_every=2, log_every=10,
    )
    tx = step.make_optimizer(cfg.train, world_size=1, steps_per_epoch=1000)
    resumed = loop_mod.load_train_state(d_cut, tx)
    assert int(resumed.step) == 2
    state_res, _ = loop_mod.fit(
        cfg, model, iter(batches[2:]), n_steps=2,
        ckpt_dir=d_cut, ckpt_every=2, log_every=10, init_state=resumed,
    )
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state_full.params, state_res.params,
    )
    assert all(jax.tree.leaves(same)), "resumed run diverged from full run"
    mom = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        jax.tree.leaves(state_full.opt_state),
        jax.tree.leaves(state_res.opt_state),
    )
    assert all(jax.tree.leaves(mom)), "optimizer state diverged"


@pytest.mark.slow
def test_fit_with_validation_hook(tmp_path, rng):
    """val_fn runs on schedule, logs val/ metrics, tracks best checkpoint."""
    import jax

    from onepose_st_tpu.train import loop as loop_mod

    cfg = tiny_engine_cfg()
    model = OnePoseMatcher(cfg.matcher)

    def batches():
        while True:
            yield make_batch(rng, cfg)

    batches = batches()
    calls = []

    def val_fn(state):
        calls.append(1)
        return {"3cm@3degree": 0.1 * len(calls), "loss": 1.0}

    state, history = loop_mod.fit(
        cfg, model, batches, n_steps=6, log_every=3,
        ckpt_dir=tmp_path / "ck", ckpt_every=100,
        val_fn=val_fn, val_every=2,
    )
    # steps 2, 4 + final 6
    assert len(calls) == 3
    vals = [h for h in history if "val/3cm@3degree" in h]
    assert len(vals) == 3
    import json

    best = json.loads((tmp_path / "ck" / "best.json").read_text())
    assert best["step"] == 6 and abs(best["metric"] - 0.3) < 1e-9


@pytest.mark.slow
def test_train_cli_val_fn(rng):
    """_make_val_fn: matcher -> PnP -> pose APs on tiny shapes."""
    from onepose_st_tpu.cli.train_matcher import _make_val_fn
    from onepose_st_tpu.sfm.map import SfMMap
    from onepose_st_tpu.train.step import init_state, make_optimizer

    cfg = tiny_engine_cfg()
    model = OnePoseMatcher(cfg.matcher)
    m = SfMMap(
        keypoints3d=rng.normal(size=(10, 3)).astype(np.float32) * 0.1,
        desc_coarse=rng.normal(size=(10, 16)).astype(np.float32),
        desc_fine=rng.normal(size=(10, 8)).astype(np.float32),
        scores=np.ones(10, np.float32),
    )
    frames = rng.uniform(size=(3, 64, 64)).astype(np.float32)
    poses = np.tile(np.array([0, 0, 0, 0, 0, 1.5], np.float32), (3, 1))
    Ks = np.tile(
        np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], np.float32),
        (3, 1, 1),
    )
    val_fn = _make_val_fn(cfg, model, [(m, frames, poses, Ks)], n_frames=2)

    batch = make_batch(rng, cfg)
    tx = make_optimizer(cfg.train, 1, 10)
    state = init_state(jax.random.key(0), model, tx, batch)
    metrics = val_fn(state)
    assert set(metrics.keys()) == {"1cm@1degree", "3cm@3degree", "5cm@5degree"}
    for v in metrics.values():
        assert 0.0 <= v <= 1.0


def test_artifact_registry(tmp_path):
    """Versioned content-hashed artifact snapshots (W&B-artifact analogue,
    reference src/callbacks/wandb_callbacks.py:17-83)."""
    from onepose_st_tpu.utils.artifacts import ArtifactRegistry

    reg = ArtifactRegistry(tmp_path / "artifacts")
    src = tmp_path / "src"
    (src / "ckpt").mkdir(parents=True)
    (src / "ckpt" / "w.bin").write_bytes(b"\x01\x02\x03" * 100)
    (src / "meta.json").write_text('{"a": 1}')

    v0 = reg.log_artifact(
        "run", {"ckpt": src / "ckpt", "meta.json": src / "meta.json"},
        metadata={"step": 5},
    )
    assert v0.name == "v0"
    man = reg.manifest("run")
    assert man["version"] == 0 and man["metadata"]["step"] == 5
    assert man["files"]["ckpt"]["kind"] == "dir"
    assert man["files"]["ckpt"]["n_files"] == 1
    assert reg.verify("run")

    # append-only versioning
    (src / "meta.json").write_text('{"a": 2}')
    v1 = reg.log_artifact("run", {"meta.json": src / "meta.json"})
    assert v1.name == "v1" and reg.latest("run") == v1
    m0 = reg.manifest("run", 0)["files"]["meta.json"]["sha256"]
    m1 = reg.manifest("run", 1)["files"]["meta.json"]["sha256"]
    assert m0 != m1

    # bit-rot detection
    (v1 / "meta.json").write_text('{"a": 999}')
    assert not reg.verify("run", 1)
    assert reg.verify("run", 0)


def test_fit_logs_artifact(tmp_path, rng):
    """fit(artifacts_dir=...) snapshots the best checkpoint + manifest."""
    import json

    from onepose_st_tpu.train import loop as loop_mod
    from onepose_st_tpu.utils.artifacts import ArtifactRegistry

    cfg = tiny_engine_cfg()
    model = OnePoseMatcher(cfg.matcher)

    def gen():
        while True:
            yield make_batch(rng, cfg)

    def val_fn(state):
        return {"3cm@3degree": 0.5}

    loop_mod.fit(
        cfg, model, gen(), n_steps=4, log_every=2,
        ckpt_dir=tmp_path / "ck", ckpt_every=2, val_fn=val_fn, val_every=2,
        artifacts_dir=tmp_path / "artifacts",
    )
    reg = ArtifactRegistry(tmp_path / "artifacts")
    man = reg.manifest("train-run")
    assert man["metadata"]["best_metric"] == 0.5
    assert any(k.startswith("ckpt/") for k in man["files"])
    assert man["files"]["best.json"]["kind"] == "file"
    assert reg.verify("train-run")


@pytest.mark.slow
def test_train_step_with_img_mask(rng):
    """The train step accepts a visibility mask: runs, descends, and the
    masked cells carry no GT supervision (gt_valid gated)."""
    cfg = tiny_engine_cfg()
    model = OnePoseMatcher(cfg.matcher)
    batch_np = make_batch(rng, cfg, B=2)
    H = W = 64
    stride = cfg.matcher.backbone.coarse_stride
    S = (H // stride) * (W // stride)
    Wc = W // stride
    col = np.arange(S) % Wc
    img_mask = np.tile((col < Wc - 2)[None], (2, 1))   # right strip = fill
    batch_np = batch_np._replace(img_mask=img_mask)
    batch = jax.tree.map(jnp.asarray, batch_np)
    tx = step.make_optimizer(cfg.train, world_size=1, steps_per_epoch=100)
    state = step.init_state(jax.random.key(0), model, tx, batch)
    jitted = jax.jit(step.train_step, static_argnames=("model", "tx", "cfg"))
    losses_seen = []
    for i in range(6):
        state, scalars = jitted(
            state, batch, jax.random.key(i), model=model, tx=tx, cfg=cfg
        )
        losses_seen.append(float(scalars["loss"]))
    assert all(np.isfinite(losses_seen))
    assert losses_seen[-1] < losses_seen[0]
    # supervision gating matches the mask
    sup = supervision.project_gt(
        batch.kpts3d, batch.pose_gt, batch.K_crop, (H, W), stride,
        batch.point_mask, img_mask=batch.img_mask,
    )
    gv = np.asarray(sup.gt_valid)
    gj = np.asarray(sup.gt_j)
    assert np.all(img_mask[np.arange(2)[:, None], gj][gv])


def test_train_step_fused_dense_parity_img_mask(rng):
    """fused_coarse must be a loss-IMPLEMENTATION switch, not a semantics
    switch: with img_mask set, the fused path must produce the same loss
    and gradients as the dense path (advisor r4 high finding — the fused
    branch used to mask attention via coarse_tokens(img_mask=...), which
    the dense path and inference deliberately do not do)."""
    import dataclasses

    cfg_fused = tiny_engine_cfg()
    cfg_dense = dataclasses.replace(
        cfg_fused,
        train=dataclasses.replace(
            cfg_fused.train,
            loss=dataclasses.replace(cfg_fused.train.loss, fused_coarse=False),
        ),
    )
    assert cfg_fused.train.loss.fused_coarse
    model = OnePoseMatcher(cfg_fused.matcher)
    batch_np = make_batch(rng, cfg_fused, B=2)
    H = W = 64
    stride = cfg_fused.matcher.backbone.coarse_stride
    S = (H // stride) * (W // stride)
    Wc = W // stride
    col = np.arange(S) % Wc
    img_mask = np.tile((col < Wc - 2)[None], (2, 1))   # right strip = fill
    batch = jax.tree.map(jnp.asarray, batch_np._replace(img_mask=img_mask))
    tx = step.make_optimizer(cfg_fused.train, world_size=1, steps_per_epoch=100)
    state = step.init_state(jax.random.key(0), model, tx, batch)
    out = {}
    for name, cfg in [("fused", cfg_fused), ("dense", cfg_dense)]:
        jitted = jax.jit(
            step.train_step, static_argnames=("model", "tx", "cfg")
        )
        new_state, scalars = jitted(
            state, batch, jax.random.key(7), model=model, tx=tx, cfg=cfg
        )
        out[name] = (
            float(scalars["loss"]),
            float(scalars["loss_coarse"]),
            float(scalars["loss_fine"]),
            float(scalars["grad_norm"]),
        )
    for a, b in zip(out["fused"], out["dense"]):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_map_training_batches_valid_quads(rng):
    """valid_quads -> batches carry the matching cell mask; homography-free
    samples keep the affine-rect mask exactly."""
    from onepose_st_tpu.data import images as img_ops
    from onepose_st_tpu.sfm.map import SfMMap
    from onepose_st_tpu.train import data as data_mod

    cfg = tiny_engine_cfg()
    F, H, W = 3, 64, 64
    frames = rng.uniform(size=(F, H, W)).astype(np.float32)
    poses = np.zeros((F, 6), np.float32)
    Ks = np.tile(np.eye(3, dtype=np.float32)[None], (F, 1, 1))
    n_map = 16
    sfm_map = SfMMap(
        keypoints3d=rng.normal(size=(n_map, 3)).astype(np.float32),
        desc_coarse=rng.normal(size=(n_map, 16)).astype(np.float32),
        desc_fine=rng.normal(size=(n_map, 8)).astype(np.float32),
        scores=np.ones(n_map, np.float32),
    )
    # crop hanging half past the left edge of a 128-wide source frame
    _, A3 = img_ops.crop_image(
        np.zeros((128, 128), np.float32),
        np.array([-64.0, 0.0, 64.0, 128.0]), (H, W),
    )
    quads = np.tile(
        img_ops.valid_quad_from_affine(A3, (128, 128))[None], (F, 1, 1)
    )
    gen = data_mod.map_training_batches(
        sfm_map, frames, poses, Ks, cfg, np.random.default_rng(0),
        batch_size=2, valid_quads=quads,
    )
    b = next(gen)
    assert b.img_mask is not None and b.img_mask.shape == (2, 64)
    expect = img_ops.cell_mask_from_quad(
        quads[0], (H, W), cfg.matcher.backbone.coarse_stride
    )
    np.testing.assert_array_equal(np.asarray(b.img_mask[0]), expect)
    assert not expect.reshape(8, 8)[:, :3].any()
