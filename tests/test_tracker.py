"""Learned point tracker: data generator GT, forward contract, learning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onepose_st_tpu import config as cfg_lib
from onepose_st_tpu.models.tracker import CoTrackerNet
from onepose_st_tpu.train import tracker_data, tracker_train


def tiny_cfg(**kw):
    base = dict(
        window=4, feat_dim=32, levels=2, radius=2, d_model=32, nhead=2,
        num_blocks=1, update_iters=2, dtype="float32",
    )
    base.update(kw)
    return cfg_lib.TrackerConfig(**base)


def test_clip_ground_truth_consistency(rng):
    clip = tracker_data.make_clip(
        rng, T=5, H=96, W=96, n_points=32, occluder=False, noise=0.0
    )
    # the birth-frame ground truth IS the query
    idx = np.arange(32)
    birth_uv = clip.gt_uv[clip.query_frame, idx]
    np.testing.assert_allclose(birth_uv, clip.query_uv, atol=1e-3)
    # visibility == in-bounds when there is no occluder
    inb = (
        (clip.gt_uv[..., 0] >= 0) & (clip.gt_uv[..., 0] <= 95)
        & (clip.gt_uv[..., 1] >= 0) & (clip.gt_uv[..., 1] <= 95)
    )
    np.testing.assert_array_equal(clip.gt_vis, inb)
    assert clip.frames.shape == (5, 96, 96)
    assert clip.frames.min() >= 0 and clip.frames.max() <= 1
    # texture actually moves: consecutive frames differ
    assert np.abs(np.diff(clip.frames, axis=0)).mean() > 1e-3


def test_occluder_hides_points(rng):
    clip = tracker_data.make_clip(
        rng, T=4, H=96, W=96, n_points=64, occluder=True, noise=0.0
    )
    idx = np.arange(64)
    # a query is always visible at its own birth frame
    assert clip.gt_vis[clip.query_frame, idx].all()


@pytest.mark.slow
def test_forward_contract(rng):
    cfg = tiny_cfg()
    model = CoTrackerNet(cfg)
    b = tracker_data.make_batch(rng, 2, T=4, H=64, W=64, n_points=16)
    args = (
        jnp.asarray(b["frames"]), jnp.asarray(b["query_uv"]),
        jnp.asarray(b["query_frame"]), jnp.asarray(b["point_mask"]),
    )
    variables = jax.jit(model.init)(jax.random.key(0), *args)
    out = jax.jit(model.apply)(variables, *args)
    B, T, N = 2, 4, 16
    assert out["coords"].shape == (B, T, N, 2)
    assert out["coords_per_iter"].shape == (cfg.update_iters, B, T, N, 2)
    assert out["vis_logit"].shape == (B, T, N)
    assert np.isfinite(np.asarray(out["coords"])).all()
    # birth-frame positions are clamped to the query
    coords = np.asarray(out["coords"])
    for bi in range(B):
        for n in range(N):
            t = int(b["query_frame"][bi, n])
            np.testing.assert_allclose(
                coords[bi, t, n], b["query_uv"][bi, n], atol=1e-3
            )


@pytest.mark.slow
def test_train_step_learns(rng):
    cfg = tiny_cfg()
    model = CoTrackerNet(cfg)
    batch = tracker_data.make_batch(
        rng, 2, T=4, H=64, W=64, n_points=16, motion=2.0
    )
    batch_d = {k: jnp.asarray(v) for k, v in batch.items()}
    tx = tracker_train.make_optimizer(lr=1e-3, steps=60)
    state = tracker_train.init_state(jax.random.key(0), model, tx, batch)
    jitted = jax.jit(
        tracker_train.train_step, static_argnames=("model", "tx", "cfg")
    )
    first = None
    for _ in range(60):
        state, sc = jitted(state, batch_d, model=model, tx=tx, cfg=cfg)
        if first is None:
            first = {k: float(v) for k, v in sc.items()}
    last = {k: float(v) for k, v in sc.items()}
    assert np.isfinite(last["loss"])
    # overfitting a fixed tiny batch must cut the loss substantially
    assert last["loss"] < 0.7 * first["loss"], (first, last)
    assert last["epe"] < first["epe"]


@pytest.mark.slow
def test_tracker_beats_identity_baseline(rng):
    """A briefly trained tracker must beat the 'stay at the query' baseline
    on held-out clips (the actual value it adds over initialization)."""
    cfg = tiny_cfg(update_iters=3)
    model = CoTrackerNet(cfg)
    tx = tracker_train.make_optimizer(lr=2e-3, steps=150)
    sample = tracker_data.make_batch(rng, 4, T=4, H=64, W=64, n_points=32)
    state = tracker_train.init_state(jax.random.key(0), model, tx, sample)
    jitted = jax.jit(
        tracker_train.train_step, static_argnames=("model", "tx", "cfg")
    )
    for i in range(150):
        batch = tracker_data.make_batch(
            rng, 4, T=4, H=64, W=64, n_points=32, motion=2.0
        )
        batch_d = {k: jnp.asarray(v) for k, v in batch.items()}
        state, sc = jitted(state, batch_d, model=model, tx=tx, cfg=cfg)

    test_rng = np.random.default_rng(123)
    tb = tracker_data.make_batch(
        test_rng, 4, T=4, H=64, W=64, n_points=32, motion=2.0
    )
    out = jax.jit(model.apply)(
        {"params": state.params},
        jnp.asarray(tb["frames"]), jnp.asarray(tb["query_uv"]),
        jnp.asarray(tb["query_frame"]), jnp.asarray(tb["point_mask"]),
    )
    vis = tb["gt_vis"]
    err = np.linalg.norm(np.asarray(out["coords"]) - tb["gt_uv"], axis=-1)
    base = np.linalg.norm(
        tb["query_uv"][:, None] - tb["gt_uv"], axis=-1
    )
    epe = err[vis].mean()
    base_epe = base[vis].mean()
    assert epe < 0.8 * base_epe, (epe, base_epe)


@pytest.mark.slow
def test_refine_sequence_learned_backend(rng):
    """refine_sequence runs with the learned backend and never replaces a
    gated per-frame pose with a weaker consensus (untrained weights =>
    garbage tracks => the gate must hold base poses)."""
    from onepose_st_tpu import config as ecfg
    from onepose_st_tpu.data import synthetic
    from onepose_st_tpu.infer.pipeline import FrameResult
    from onepose_st_tpu.infer.tracker import (
        LearnedTemporalTracker, refine_sequence,
    )

    scene = synthetic.make_scene(
        rng, n_points=70, n_frames=60, image_hw=(64, 64), focal=90.0,
        object_size=0.25, elevation_jitter=0.0,
    )
    T = 8
    amps = rng.uniform(0.3, 1.0, size=70).astype(np.float32)
    frames = np.stack([
        synthetic.render_splats(scene, f, amps, sigma_px=2.0)
        for f in range(T)
    ])

    def T44_of(f):
        M = np.eye(4, dtype=np.float32)
        M[:3, :3] = scene.Rs[f]
        M[:3, 3] = scene.ts[f]
        return M

    results = []
    for f in range(T):
        vis = np.nonzero(scene.visible[f])[0][:40]
        uv = scene.uv[f][vis]
        p3 = scene.points[vis]
        results.append(FrameResult(
            pose6=scene.poses[f], T44=T44_of(f), n_inliers=len(uv),
            n_matches=len(uv), tracked=True, success=True,
            mkpts3d=p3.astype(np.float32), mkpts2d_full=uv.astype(np.float32),
        ))

    cfg = ecfg.EngineConfig(tracker=tiny_cfg(window=6))
    b = tracker_data.make_batch(np.random.default_rng(1), 1, T=6, H=64, W=64, n_points=8)
    model = CoTrackerNet(cfg.tracker)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.asarray(b["frames"]), jnp.asarray(b["query_uv"]),
        jnp.asarray(b["query_frame"]), jnp.asarray(b["point_mask"]),
    )
    tracker = LearnedTemporalTracker(cfg.tracker, variables)
    refined = refine_sequence(
        cfg, tracker, frames, results, scene.Ks, window=6,
        max_pts_per_frame=16,
    )
    assert len(refined) == T
    from onepose_st_tpu.core import metrics
    for f, r in enumerate(refined):
        assert np.isfinite(r.T44).all()
        # own-support gate: the base poses are ground truth with 40 clean
        # inliers each; a horde of drifted tracks must never displace them
        # (regression: pre-gate this degraded GT poses to ~18 deg error)
        r_err, t_err = metrics.query_pose_error(r.T44[:3], T44_of(f)[:3])
        assert r_err < 1.0 and t_err < 1.0, (f, r_err, t_err)


@pytest.mark.slow
def test_save_load_roundtrip(tmp_path, rng):
    from onepose_st_tpu.infer.tracker import LearnedTemporalTracker

    cfg = tiny_cfg()
    model = CoTrackerNet(cfg)
    b = tracker_data.make_batch(rng, 1, T=4, H=64, W=64, n_points=8)
    args = (
        jnp.asarray(b["frames"]), jnp.asarray(b["query_uv"]),
        jnp.asarray(b["query_frame"]), jnp.asarray(b["point_mask"]),
    )
    variables = jax.jit(model.init)(jax.random.key(0), *args)
    path = tmp_path / "tracker.msgpack"
    LearnedTemporalTracker.save_params(variables, path)
    lt = LearnedTemporalTracker.load(cfg, path)
    out_a = jax.jit(model.apply)(variables, *args)
    out_b = jax.jit(model.apply)(lt.variables, *args)
    np.testing.assert_allclose(
        np.asarray(out_a["coords"]), np.asarray(out_b["coords"]), atol=1e-6
    )


def test_refine_sequence_hybrid_polish(rng):
    """Hybrid backend: learned tracker + correlation polish runs end-to-end
    and the own-support gate still protects ground-truth base poses."""
    from onepose_st_tpu import config as ecfg
    from onepose_st_tpu.data import synthetic
    from onepose_st_tpu.infer.pipeline import FrameResult
    from onepose_st_tpu.infer.tracker import (
        LearnedTemporalTracker, TemporalTracker, refine_sequence,
    )
    from onepose_st_tpu.models import OnePoseMatcher

    from test_models import small_matcher_cfg

    scene = synthetic.make_scene(
        rng, n_points=70, n_frames=60, image_hw=(64, 64), focal=90.0,
        object_size=0.25, elevation_jitter=0.0,
    )
    T = 8
    amps = rng.uniform(0.3, 1.0, size=70).astype(np.float32)
    frames = np.stack([
        synthetic.render_splats(scene, f, amps, sigma_px=2.0)
        for f in range(T)
    ])

    def T44_of(f):
        M = np.eye(4, dtype=np.float32)
        M[:3, :3] = scene.Rs[f]
        M[:3, 3] = scene.ts[f]
        return M

    results = []
    for f in range(T):
        vis = np.nonzero(scene.visible[f])[0][:40]
        uv = scene.uv[f][vis]
        p3 = scene.points[vis]
        results.append(FrameResult(
            pose6=scene.poses[f], T44=T44_of(f), n_inliers=len(uv),
            n_matches=len(uv), tracked=True, success=True,
            mkpts3d=p3.astype(np.float32), mkpts2d_full=uv.astype(np.float32),
        ))

    mcfg = small_matcher_cfg()
    matcher = OnePoseMatcher(mcfg)
    L = mcfg.n_points
    mvars = matcher.init(
        jax.random.key(1), jnp.asarray(frames[:1, ..., None]),
        jnp.zeros((1, L, 3)), jnp.zeros((1, L, 32)), jnp.zeros((1, L, 16)),
    )

    cfg = ecfg.EngineConfig(tracker=tiny_cfg(window=6), matcher=mcfg)
    b = tracker_data.make_batch(
        np.random.default_rng(1), 1, T=6, H=64, W=64, n_points=8
    )
    model = CoTrackerNet(cfg.tracker)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.asarray(b["frames"]), jnp.asarray(b["query_uv"]),
        jnp.asarray(b["query_frame"]), jnp.asarray(b["point_mask"]),
    )
    tracker = LearnedTemporalTracker(
        cfg.tracker, variables, polish=TemporalTracker(matcher, mvars),
    )
    refined = refine_sequence(
        cfg, tracker, frames, results, scene.Ks, window=6,
        max_pts_per_frame=16,
    )
    assert len(refined) == T
    from onepose_st_tpu.core import metrics
    for f, r in enumerate(refined):
        assert np.isfinite(r.T44).all()
        r_err, t_err = metrics.query_pose_error(r.T44[:3], T44_of(f)[:3])
        assert r_err < 1.0 and t_err < 1.0, (f, r_err, t_err)


@pytest.mark.slow
def test_refine_no_regression_on_healthy_run(rng):
    """Round-3 hybrid-study regression (logs/refine_hybrid_r3.log): on a
    HEALTHY sequence — base poses imperfect but sound, own matches clean —
    an accepted refinement must never make a frame's pose worse. With the
    own-support bar at 1.0 an accepted pose explains the frame's own
    matcher-verified correspondences at least as well as the base did;
    with garbage learned proposals the gate may simply reject everything
    (gate recall 0 on healthy input is correct behavior)."""
    from onepose_st_tpu import config as ecfg
    from onepose_st_tpu.core import metrics, so3
    from onepose_st_tpu.data import synthetic
    from onepose_st_tpu.infer.pipeline import FrameResult
    from onepose_st_tpu.infer.tracker import (
        LearnedTemporalTracker, TemporalTracker, refine_sequence,
    )
    from onepose_st_tpu.models import OnePoseMatcher

    from test_models import small_matcher_cfg

    scene = synthetic.make_scene(
        rng, n_points=70, n_frames=60, image_hw=(64, 64), focal=90.0,
        object_size=0.25, elevation_jitter=0.0,
    )
    T = 8
    amps = rng.uniform(0.3, 1.0, size=70).astype(np.float32)
    frames = np.stack([
        synthetic.render_splats(scene, f, amps, sigma_px=2.0)
        for f in range(T)
    ])

    def T44_of(f):
        M = np.eye(4, dtype=np.float32)
        M[:3, :3] = scene.Rs[f]
        M[:3, 3] = scene.ts[f]
        return M

    # healthy-but-imperfect base poses: ~2 deg rotation / ~1 cm translation
    # noise on top of GT (the hybrid-study condition; the older tests use
    # exact-GT bases, which never exposed the 0.8x slack)
    noise_rng = np.random.default_rng(7)
    results = []
    base_errs = []
    for f in range(T):
        vis = np.nonzero(scene.visible[f])[0][:40]
        uv = scene.uv[f][vis]
        p3 = scene.points[vis]
        p6 = scene.poses[f].copy()
        p6[:3] += noise_rng.normal(0.0, 0.015, 3)   # ~1.5e-2 rad ~ 0.9 deg rms
        p6[3:] += noise_rng.normal(0.0, 0.005, 3)   # 5 mm rms
        R, t = so3.pose6_to_Rt(jnp.asarray(p6))
        M = np.eye(4, dtype=np.float32)
        M[:3, :3] = np.asarray(R)
        M[:3, 3] = np.asarray(t)
        base_errs.append(metrics.query_pose_error(M[:3], T44_of(f)[:3]))
        results.append(FrameResult(
            pose6=p6.astype(np.float32), T44=M, n_inliers=len(uv),
            n_matches=len(uv), tracked=True, success=True,
            mkpts3d=p3.astype(np.float32), mkpts2d_full=uv.astype(np.float32),
        ))

    mcfg = small_matcher_cfg()
    matcher = OnePoseMatcher(mcfg)
    L = mcfg.n_points
    mvars = matcher.init(
        jax.random.key(1), jnp.asarray(frames[:1, ..., None]),
        jnp.zeros((1, L, 3)), jnp.zeros((1, L, 32)), jnp.zeros((1, L, 16)),
    )
    cfg = ecfg.EngineConfig(tracker=tiny_cfg(window=6), matcher=mcfg)
    b = tracker_data.make_batch(
        np.random.default_rng(1), 1, T=6, H=64, W=64, n_points=8
    )
    model = CoTrackerNet(cfg.tracker)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.asarray(b["frames"]), jnp.asarray(b["query_uv"]),
        jnp.asarray(b["query_frame"]), jnp.asarray(b["point_mask"]),
    )
    tracker = LearnedTemporalTracker(
        cfg.tracker, variables, polish=TemporalTracker(matcher, mvars),
    )
    refined = refine_sequence(
        cfg, tracker, frames, results, scene.Ks, window=6,
        max_pts_per_frame=16,
    )
    assert len(refined) == T
    for f, r in enumerate(refined):
        assert np.isfinite(r.T44).all()
        r_err, t_err = metrics.query_pose_error(r.T44[:3], T44_of(f)[:3])
        b_r, b_t = base_errs[f]
        # no-regression contract: every frame ends at least as good as its
        # healthy base (small slack for PnP jitter on genuinely-accepted
        # refinements)
        assert r_err <= b_r + 0.2 and t_err <= b_t + 0.2, (
            f, (r_err, t_err), (b_r, b_t), r.gated)
