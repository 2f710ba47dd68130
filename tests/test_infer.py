import jax
import jax.numpy as jnp
import numpy as np

from onepose_st_tpu import config as cfg_lib
from onepose_st_tpu.core import camera
from onepose_st_tpu.infer.detector import DetectorDB, ObjectDetector
from onepose_st_tpu.infer.tracker import TemporalTracker
from onepose_st_tpu.models import LoFTRMatcher, OnePoseMatcher

from test_models import small_loftr_cfg, small_matcher_cfg
import pytest


def _texture(rng, H=64, W=64):
    """Smooth random texture (correlatable, unlike white noise)."""
    import scipy.ndimage as ndi

    img = rng.uniform(size=(H, W)).astype(np.float32)
    img = ndi.gaussian_filter(img, 1.2)
    img = (img - img.min()) / (img.max() - img.min() + 1e-8)
    return img


def make_detector(rng, n_views=2):
    # untrained weights produce diffuse confidences; drop the match
    # threshold so self-matching works in this unit test
    cfg = cfg_lib.replace(
        small_loftr_cfg(),
        coarse_matching=cfg_lib.CoarseMatchingConfig(
            temperature=0.1, threshold=0.005, max_matches=32
        ),
    )
    model = LoFTRMatcher(cfg)
    imgs = np.stack([_texture(rng) for _ in range(n_views)])
    variables = model.init(
        jax.random.key(0), jnp.asarray(imgs[:1, ..., None]),
        jnp.asarray(imgs[:1, ..., None]),
    )
    boxes = np.tile(np.array([8.0, 8.0, 56.0, 56.0], np.float32), (n_views, 1))
    db = DetectorDB(images=imgs, boxes=boxes)
    return ObjectDetector(model, variables, db, crop_hw=(64, 64)), imgs


@pytest.mark.slow
def test_detector_self_query(rng):
    """Querying with a DB view itself: affine ~ identity, box ~ DB box."""
    det, imgs = make_detector(rng)
    d = det.detect(imgs[0])
    assert d.success
    # square-expanded box center should stay near the DB box center (32, 32)
    cx = (d.box[0] + d.box[2]) / 2
    cy = (d.box[1] + d.box[3]) / 2
    assert abs(cx - 32) < 6 and abs(cy - 32) < 6


@pytest.mark.slow
def test_previous_pose_detect_projects_box(rng):
    det, _ = make_detector(rng)
    corners = np.asarray(camera.box3d_corners(jnp.asarray([0.2, 0.2, 0.2])))
    pose = np.array([0, 0, 0, 0, 0, 1.0], np.float32)
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
    d = det.previous_pose_detect(pose, K, corners)
    assert d.success
    # box extent: 0.2m at 1m with f=100 -> 20px -> padded square ~22px
    assert 18 < (d.box[2] - d.box[0]) < 30
    crop, K_crop, A3 = det.crop(_texture(rng), d, K)
    assert crop.shape == (64, 64)
    # center of projection maps to crop center
    c = A3 @ np.array([32.0, 32.0, 1.0])
    np.testing.assert_allclose(c[:2], [32.0, 32.0], atol=0.05)


@pytest.mark.slow
def test_tracker_recovers_translation(rng):
    """Shifted texture: chained correlation tracking must recover the shift."""
    cfg = small_matcher_cfg()
    model = OnePoseMatcher(cfg)
    H = W = 64
    base = _texture(rng, H + 16, W + 16)
    f0 = base[8 : 8 + H, 8 : 8 + W]
    dxy = (6, 4)  # (dx, dy) pixels
    f1 = base[8 - dxy[1] : 8 - dxy[1] + H, 8 - dxy[0] : 8 - dxy[0] + W]
    frames = np.stack([f0, f1])
    L = cfg.n_points
    variables = model.init(
        jax.random.key(0),
        jnp.asarray(frames[:1, ..., None]),
        jnp.zeros((1, L, 3)),
        jnp.zeros((1, L, 32)),
        jnp.zeros((1, L, 16)),
    )
    tracker = TemporalTracker(model, variables, search_radius=6)
    feats = tracker.features(frames)
    pts = np.array(
        [[24.0, 24.0], [32.0, 30.0], [40.0, 36.0], [28.0, 40.0]], np.float32
    )
    uv1, conf = tracker.track_chain(feats, pts, start=0, target=1)
    expect = pts + np.asarray(dxy, np.float32)
    err = np.linalg.norm(uv1 - expect, axis=-1)
    assert np.median(err) < 1.5, (uv1, expect)
    assert (conf > 0.5).all()


def test_tracker_identity(rng):
    """Tracking into the same frame content must stay put."""
    cfg = small_matcher_cfg()
    model = OnePoseMatcher(cfg)
    f = _texture(rng)
    frames = np.stack([f, f])
    L = cfg.n_points
    variables = model.init(
        jax.random.key(0), jnp.asarray(frames[:1, ..., None]),
        jnp.zeros((1, L, 3)), jnp.zeros((1, L, 32)), jnp.zeros((1, L, 16)),
    )
    tracker = TemporalTracker(model, variables, search_radius=6)
    feats = tracker.features(frames)
    pts = np.array([[24.0, 24.0], [36.0, 32.0]], np.float32)
    uv1, conf = tracker.track_chain(feats, pts, start=0, target=1)
    assert np.linalg.norm(uv1 - pts, axis=-1).max() < 0.75


def test_frame_result_cache_roundtrip(tmp_path, rng):
    from onepose_st_tpu.infer import pipeline as ip

    results = []
    for f in range(3):
        n = int(rng.integers(0, 6))
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = 1.0 + f
        results.append(ip.FrameResult(
            pose6=rng.normal(size=6).astype(np.float32),
            T44=T, n_inliers=n, n_matches=n + 2,
            tracked=f > 0, success=n > 1,
            mkpts3d=rng.normal(size=(n, 3)).astype(np.float32),
            mkpts2d_full=rng.uniform(0, 512, size=(n, 2)).astype(np.float32),
        ))
    p = tmp_path / "cache.npz"
    ip.save_results(p, results)
    loaded = ip.load_results(p)
    assert len(loaded) == 3
    for a, b in zip(results, loaded):
        np.testing.assert_allclose(a.pose6, b.pose6)
        np.testing.assert_allclose(a.T44, b.T44)
        assert (a.n_inliers, a.n_matches, a.tracked, a.success) == (
            b.n_inliers, b.n_matches, b.tracked, b.success
        )
        np.testing.assert_allclose(a.mkpts3d, b.mkpts3d)
        np.testing.assert_allclose(a.mkpts2d_full, b.mkpts2d_full)
    ip.save_results(tmp_path / "e.npz", [])
    assert ip.load_results(tmp_path / "e.npz") == []


def test_refine_sequence_windowed(rng):
    """refine_sequence: windowed scan tracking + fused PnP recovers a frame
    whose own correspondences are sparse/noisy, using tracks from the
    previous window's frames (the reference CoTracker phase's role)."""
    from onepose_st_tpu.core import metrics, so3
    from onepose_st_tpu.data import synthetic
    from onepose_st_tpu.infer.pipeline import FrameResult
    from onepose_st_tpu.infer.tracker import refine_sequence

    # slow orbit slice: 6 deg/frame so per-step image motion fits the
    # correlation search radius
    scene = synthetic.make_scene(
        rng, n_points=70, n_frames=60, image_hw=(64, 64), focal=90.0,
        object_size=0.25, elevation_jitter=0.0,
    )
    T = 8
    # fixed per-point amps across frames for correlatable content
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
        if f == T - 1:
            # the frame under refinement: only 6 own points, 2 px noise
            uv = uv[:6] + rng.normal(size=(6, 2)).astype(np.float32) * 2.0
            p3 = p3[:6]
        results.append(FrameResult(
            pose6=scene.poses[f], T44=T44_of(f), n_inliers=len(uv),
            n_matches=len(uv), tracked=True, success=True,
            mkpts3d=p3.astype(np.float32), mkpts2d_full=uv.astype(np.float32),
        ))

    cfg = cfg_lib.EngineConfig(matcher=small_matcher_cfg())
    model = OnePoseMatcher(cfg.matcher)
    L = cfg.matcher.n_points
    variables = model.init(
        jax.random.key(0), jnp.asarray(frames[:1, ..., None]),
        jnp.zeros((1, L, 3)), jnp.zeros((1, L, 32)), jnp.zeros((1, L, 16)),
    )
    tracker = TemporalTracker(model, variables, search_radius=8)
    refined = refine_sequence(
        cfg, tracker, frames, results, scene.Ks, window=6,
        max_pts_per_frame=32,
    )
    assert len(refined) == T
    last = refined[-1]
    assert last.used_tracks > 0
    assert last.n_inliers > 6  # tracked points joined the solve
    # loose bound: at 64 px / f=90 toy scale, per-step correlation drift over
    # 5 chained frames dominates (a few px ~ a few degrees); this gates the
    # windowed-scan mechanics, not tracker accuracy
    r_err, t_err = metrics.query_pose_error(last.T44[:3], T44_of(T - 1)[:3])
    # (12 deg absorbs render-content luck: the look_at orientation fix
    # changed which texture drifts under the toy correlation tracker)
    assert r_err < 12.0 and t_err < 5.0, (r_err, t_err, last.used_tracks)


def test_shift_box_into_frame():
    """Crop-box shifting: preserves size, maximizes real pixels (the wild
    truncation fix's inference-side half, see wild_diag)."""
    import numpy as np

    from onepose_st_tpu.infer.detector import shift_box_into_frame

    hw = (512, 512)
    # fully inside: unchanged
    b = np.array([10.0, 20.0, 110.0, 120.0], np.float32)
    np.testing.assert_allclose(shift_box_into_frame(b, hw), b)
    # hanging off the left/top: snapped to 0, size kept
    b = np.array([-40.0, -10.0, 60.0, 90.0], np.float32)
    out = shift_box_into_frame(b, hw)
    np.testing.assert_allclose(out, [0.0, 0.0, 100.0, 100.0])
    # hanging off the right/bottom: snapped to the far edge
    b = np.array([450.0, 480.0, 550.0, 580.0], np.float32)
    out = shift_box_into_frame(b, hw)
    np.testing.assert_allclose(out, [412.0, 412.0, 512.0, 512.0])
    # larger than the frame: centered
    b = np.array([-100.0, 0.0, 600.0, 700.0], np.float32)
    out = shift_box_into_frame(b, hw)
    assert out[2] - out[0] == 700.0 and out[3] - out[1] == 700.0
    np.testing.assert_allclose((out[0] + out[2]) / 2, 256.0)


@pytest.mark.slow
def test_run_sequence_pipelined_matches_sequential(rng):
    """The one-frame-lag pipelined driver returns one result per frame and
    agrees with the sequential loop when the tracking state never diverges
    (here: every frame fails under random weights, so both paths take the
    detector branch with identical inputs)."""
    from onepose_st_tpu.infer.pipeline import PoseEstimator
    from onepose_st_tpu.sfm.map import SfMMap

    mcfg = small_matcher_cfg()
    cfg = cfg_lib.EngineConfig(matcher=mcfg)
    model = OnePoseMatcher(mcfg)
    n_map = 32
    ext = np.array([0.2, 0.2, 0.2], np.float32)
    corners = np.asarray(camera.box3d_corners(jnp.asarray(ext)))
    sfm_map = SfMMap(
        keypoints3d=rng.uniform(-0.1, 0.1, size=(n_map, 3)).astype(np.float32),
        desc_coarse=rng.normal(size=(n_map, 32)).astype(np.float32),
        desc_fine=rng.normal(size=(n_map, 16)).astype(np.float32),
        scores=np.ones(n_map, np.float32),
        box_corners=corners,
    )
    detector, imgs = make_detector(rng)
    L = mcfg.n_points
    variables = model.init(
        jax.random.key(0), jnp.asarray(imgs[:1, ..., None]),
        jnp.zeros((1, L, 3)), jnp.zeros((1, L, 32)), jnp.zeros((1, L, 16)),
    )
    T = 6
    frames = np.stack([_texture(rng) for _ in range(T)])
    Ks = np.tile(np.array(
        [[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1]], np.float32)[None],
        (T, 1, 1))

    est_a = PoseEstimator(cfg, model, variables, sfm_map, detector)
    seq = [est_a.estimate(frames[f], Ks[f], frame_idx=f) for f in range(T)]
    est_b = PoseEstimator(cfg, model, variables, sfm_map, detector)
    pipe = est_b.run_sequence(frames, Ks)
    assert len(pipe) == T
    for a, b in zip(seq, pipe):
        assert a.success == b.success and a.tracked == b.tracked
        if a.success:
            np.testing.assert_allclose(a.pose6, b.pose6, atol=1e-5)


def test_self_calibrate_joint_smoke(rng):
    """The joint self-calibration path compiles and degrades gracefully:
    with random weights no frame clears min_inliers, so K is returned
    unchanged (the < 2-frames early break)."""
    from onepose_st_tpu.infer.pipeline import PoseEstimator
    from onepose_st_tpu.sfm.map import SfMMap

    mcfg = small_matcher_cfg()
    cfg = cfg_lib.EngineConfig(matcher=mcfg)
    model = OnePoseMatcher(mcfg)
    n_map = 32
    corners = np.asarray(camera.box3d_corners(
        jnp.asarray(np.array([0.2, 0.2, 0.2], np.float32))
    ))
    sfm_map = SfMMap(
        keypoints3d=rng.uniform(-0.1, 0.1, size=(n_map, 3)).astype(np.float32),
        desc_coarse=rng.normal(size=(n_map, 32)).astype(np.float32),
        desc_fine=rng.normal(size=(n_map, 16)).astype(np.float32),
        scores=np.ones(n_map, np.float32),
        box_corners=corners,
    )
    detector, imgs = make_detector(rng)
    L = mcfg.n_points
    variables = model.init(
        jax.random.key(0), jnp.asarray(imgs[:1, ..., None]),
        jnp.zeros((1, L, 3)), jnp.zeros((1, L, 32)), jnp.zeros((1, L, 16)),
    )
    est = PoseEstimator(cfg, model, variables, sfm_map, detector)
    frames = np.stack([_texture(rng) for _ in range(4)])
    K0 = np.array([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1]], np.float32)
    K_out, info = est.self_calibrate(frames, K0, sample_stride=1, method="joint")
    assert info["method"] == "joint"
    # with random weights nothing passes min_inliers -> K unchanged
    np.testing.assert_allclose(K_out, K0)


def test_box_diverged_thresholds():
    from onepose_st_tpu.infer.pipeline import PoseEstimator

    box = np.array([100.0, 100.0, 300.0, 300.0], np.float32)   # size 200
    same = box.copy()
    assert not PoseEstimator._box_diverged(box, same)
    # shift within the 1.1x padding margin (margin ~ 9.1 px): ok
    small = box + np.array([5.0, 0, 5.0, 0], np.float32)
    assert not PoseEstimator._box_diverged(box, small)
    # shift beyond the margin: re-dispatch
    big = box + np.array([20.0, 0, 20.0, 0], np.float32)
    assert PoseEstimator._box_diverged(box, big)
    # scale change > 9%: re-dispatch
    grown = np.array([88.0, 88.0, 312.0, 312.0], np.float32)   # size 224
    assert PoseEstimator._box_diverged(box, grown)
