import jax.numpy as jnp
import numpy as np

from onepose_st_tpu.config import EngineConfig
from onepose_st_tpu.core import camera
from onepose_st_tpu.data import synthetic
from onepose_st_tpu.sfm import pairs, pipeline, tracks, triangulation, twoview
import pytest


# ---------------- pairs ----------------


def test_pairs_exhaustive():
    p = pairs.pairs_exhaustive(4)
    assert len(p) == 6
    assert np.all(p[:, 0] < p[:, 1])


def test_pairs_from_index():
    p = pairs.pairs_from_index(5, gap=2)
    assert (0, 1) in set(map(tuple, p)) and (0, 2) in set(map(tuple, p))
    assert (0, 3) not in set(map(tuple, p))


def test_pairs_from_poses(rng):
    scene = synthetic.make_scene(rng, n_points=10, n_frames=12)
    p = pairs.pairs_from_poses(scene.Rs, scene.ts, covis_num=4, min_rotation_deg=10)
    assert len(p) > 0
    assert np.all(p[:, 0] < p[:, 1])
    # ring neighbours (30 deg apart) should be covisible
    assert (0, 1) in set(map(tuple, p))


def test_pairs_from_poses_blockwise_matches_small_block(rng):
    scene = synthetic.make_scene(rng, n_points=10, n_frames=24)
    a = pairs.pairs_from_poses(scene.Rs, scene.ts, covis_num=6, block=256)
    b = pairs.pairs_from_poses(scene.Rs, scene.ts, covis_num=6, block=5)
    assert set(map(tuple, a)) == set(map(tuple, b))


def test_pairs_from_poses_per_sequence_quota(rng):
    # two sequences: a dense one (every 2 deg) and a sparse one; the quota
    # must pull candidates from BOTH (reference covis_from_pose's
    # num_matched_per_seq split)
    from scipy.spatial.transform import Rotation as _Rot

    angs = np.concatenate([np.arange(0, 160, 2.0), np.arange(0, 160, 40.0)])
    seq = np.concatenate([np.zeros(80, np.int64), np.ones(4, np.int64)])
    Rs = _Rot.from_euler("y", angs[:, None], degrees=True).as_matrix().astype(np.float32)
    ts = np.tile(np.array([0, 0, 2.0], np.float32), (len(angs), 1))
    ts[80:, 0] += 0.01  # sparse seq slightly offset so distances differ
    p = pairs.pairs_from_poses(
        Rs, ts, covis_num=8, min_rotation_deg=10, seq_ids=seq
    )
    ps = set(map(tuple, p))
    # frame 0 (dense seq) must pair with at least one sparse-seq frame
    assert any(a == 0 and b >= 80 for a, b in ps)


def test_pairs_from_poses_scan_scale_memory(rng):
    # n=2000 must not allocate the naive [n,n,3,3] (288 GB); peak extra is
    # O(block*n). tracemalloc bounds the python-visible allocations <1 GB.
    import tracemalloc

    from scipy.spatial.transform import Rotation as _Rot

    n = 2000
    angs = rng.uniform(0, 360, size=n)
    Rs = _Rot.from_euler("y", angs[:, None], degrees=True).as_matrix().astype(np.float32)
    ts = rng.normal(size=(n, 3)).astype(np.float32)
    tracemalloc.start()
    p = pairs.pairs_from_poses(Rs, ts, covis_num=10, min_rotation_deg=10)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 1 << 30, f"peak {peak/1e9:.2f} GB"
    assert len(p) > 0 and np.all(p[:, 0] < p[:, 1])


# ---------------- two-view ----------------


def make_pair_matches(scene, i, j, noise_px=0.0, n_outliers=0, rng=None):
    vis = scene.visible[i] & scene.visible[j]
    ids = np.nonzero(vis)[0]
    uv_i = scene.uv[i, ids].copy()
    uv_j = scene.uv[j, ids].copy()
    if noise_px and rng is not None:
        uv_j += rng.normal(size=uv_j.shape) * noise_px
    if n_outliers and rng is not None:
        k = rng.choice(len(ids), min(n_outliers, len(ids)), replace=False)
        uv_j[k] = rng.uniform(0, 512, size=(len(k), 2))
    return tracks.PairMatches(
        img_i=i, img_j=j, uv_i=uv_i.astype(np.float32),
        uv_j=uv_j.astype(np.float32),
        score=np.ones(len(ids), np.float32),
    ), ids


def test_epipolar_inliers_accepts_gt_rejects_outliers(rng):
    scene = synthetic.make_scene(rng, n_points=100, n_frames=6)
    pm, _ = make_pair_matches(scene, 0, 1, n_outliers=30, rng=rng)
    ok = np.asarray(
        twoview.epipolar_inliers(
            jnp.asarray(pm.uv_i), jnp.asarray(pm.uv_j),
            jnp.asarray(scene.poses[0]), jnp.asarray(scene.poses[1]),
            jnp.asarray(scene.Ks[0]), jnp.asarray(scene.Ks[1]),
            threshold_px=2.0,
        )
    )
    # inliers dominate; outliers rejected (a random point may land near the
    # epipolar line by chance, so allow a couple)
    assert ok.sum() >= len(ok) - 32
    assert ok.sum() <= len(ok) - 25


# ---------------- tracks ----------------


def test_merge_keypoints_dedup():
    pm1 = tracks.PairMatches(
        0, 1,
        uv_i=np.array([[8.0, 8.0], [16.0, 8.0]], np.float32),
        uv_j=np.array([[50.0, 50.0], [60.0, 50.0]], np.float32),
        score=np.ones(2, np.float32),
    )
    pm2 = tracks.PairMatches(
        0, 2,
        uv_i=np.array([[8.2, 7.9]], np.float32),  # same grid cell as (8, 8)
        uv_j=np.array([[70.0, 70.0]], np.float32),
        score=np.ones(1, np.float32),
    )
    kp = tracks.merge_keypoints(3, [pm1, pm2])
    assert len(kp.kpts[0]) == 2          # (8,8)-ish merged, (16,8) separate
    assert len(kp.matches) == 3
    assert kp.scores[0].max() == 2.0      # merged score sum


def test_build_tracks_transitive():
    """0:a ~ 1:b and 1:b ~ 2:c must become one 3-view track."""
    pm1 = tracks.PairMatches(
        0, 1, np.array([[8.0, 8]], np.float32), np.array([[24.0, 8]], np.float32),
        np.ones(1, np.float32),
    )
    pm2 = tracks.PairMatches(
        1, 2, np.array([[24.0, 8]], np.float32), np.array([[40.0, 8]], np.float32),
        np.ones(1, np.float32),
    )
    kp = tracks.merge_keypoints(3, [pm1, pm2])
    td = tracks.build_tracks(kp)
    assert len(td.track_imgs) == 1
    assert set(td.track_imgs[0].tolist()) == {0, 1, 2}


def test_greedy_keyframes(rng):
    scene = synthetic.make_scene(rng, n_points=80, n_frames=6)
    pms = []
    for i, j in pairs.pairs_exhaustive(6):
        pm, _ = make_pair_matches(scene, int(i), int(j))
        pms.append(pm)
    kp = tracks.merge_keypoints(6, pms)
    td = tracks.build_tracks(kp)
    at = tracks.assign_keyframes_greedy(kp, td, max_track_length=8)
    assert np.all(at.ref_idx >= 0)
    # first keyframe observes the most tracks
    assert len(at.keyframes) >= 1
    # reference view must not appear among its own track's obs slots
    for t in range(len(at.ref_idx)):
        obs = at.obs_idx[t][at.mask[t]]
        assert at.ref_idx[t] not in obs


# ---------------- triangulation ----------------


def test_triangulate_tracks_exact(rng):
    scene = synthetic.make_scene(rng, n_points=60, n_frames=8)
    ts = synthetic.make_tracks(scene, rng)
    obs_frame = np.concatenate([ts.ref_idx[:, None], ts.obs_idx], axis=1)
    obs_uv = np.concatenate([ts.kpt0[:, None], ts.kpt1], axis=1)
    obs_mask = np.concatenate(
        [np.ones((len(ts.ref_idx), 1), bool), ts.mask], axis=1
    )
    res = triangulation.triangulate_tracks(
        jnp.asarray(obs_frame), jnp.asarray(obs_uv), jnp.asarray(obs_mask),
        jnp.asarray(scene.poses), jnp.asarray(scene.Ks),
    )
    valid = np.asarray(res.valid)
    assert valid.mean() > 0.9
    gt = scene.points[ts.point_ids]
    err = np.linalg.norm(np.asarray(res.points) - gt, axis=-1)
    assert np.median(err[valid]) < 1e-3


# ---------------- end-to-end geometry spine ----------------


@pytest.mark.slow
def test_build_map_from_matches_e2e(rng):
    """Synthetic scene -> noisy matches + outliers -> map ~ GT points."""
    scene = synthetic.make_scene(rng, n_points=300, n_frames=10)
    cfg = EngineConfig()
    pair_list = pairs.pairs_from_poses(scene.Rs, scene.ts, covis_num=6)
    pms = []
    for i, j in pair_list:
        pm, _ = make_pair_matches(
            scene, int(i), int(j), noise_px=0.3, n_outliers=10, rng=rng
        )
        pms.append(pm)
    corners = np.asarray(
        camera.box3d_corners(jnp.asarray([0.25, 0.25, 0.25]))
    )
    sfm_map, diag = pipeline.build_map_from_matches(
        pms, scene.poses, scene.Ks, cfg, box_corners=corners
    )
    assert diag.n_verified_matches > 0.8 * diag.n_raw_matches * 0.9
    assert diag.n_tracks > 100
    assert diag.ba_final_cost < diag.ba_initial_cost
    assert len(sfm_map.keypoints3d) > 100
    # every map point must be close to SOME ground-truth point
    d = np.linalg.norm(
        sfm_map.keypoints3d[:, None, :] - scene.points[None, :, :], axis=-1
    ).min(axis=1)
    assert np.median(d) < 2e-3
    assert diag.mean_reproj_err_px < 1.0


def test_map_save_load_padded(tmp_path, rng):
    from onepose_st_tpu.sfm.map import SfMMap

    m = SfMMap(
        keypoints3d=rng.normal(size=(50, 3)).astype(np.float32),
        desc_coarse=rng.normal(size=(50, 8)).astype(np.float32),
        desc_fine=rng.normal(size=(50, 4)).astype(np.float32),
        scores=np.ones(50, np.float32),
    )
    p = tmp_path / "map.npz"
    m.save(p)
    m2 = SfMMap.load(p)
    np.testing.assert_allclose(m2.keypoints3d, m.keypoints3d)
    k, dc, df, s, mask = m2.padded(64)
    assert k.shape == (64, 3) and mask.sum() == 50
    k, dc, df, s, mask = m2.padded(32, rng)
    assert k.shape == (32, 3) and mask.all()


def test_pair_match_cache_roundtrip(tmp_path, rng):
    from onepose_st_tpu.sfm import pipeline, tracks as tracks_mod

    pms = [
        tracks_mod.PairMatches(
            0, 1,
            rng.uniform(0, 64, (7, 2)).astype(np.float32),
            rng.uniform(0, 64, (7, 2)).astype(np.float32),
            rng.uniform(0.2, 1, 7).astype(np.float32),
        ),
        tracks_mod.PairMatches(
            2, 3,
            rng.uniform(0, 64, (3, 2)).astype(np.float32),
            rng.uniform(0, 64, (3, 2)).astype(np.float32),
            rng.uniform(0.2, 1, 3).astype(np.float32),
        ),
    ]
    path = tmp_path / "matches.npz"
    pipeline.save_pair_matches(path, pms)
    loaded = pipeline.load_pair_matches(path)
    assert len(loaded) == 2
    for a, b in zip(pms, loaded):
        assert (a.img_i, a.img_j) == (b.img_i, b.img_j)
        np.testing.assert_allclose(a.uv_i, b.uv_i)
        np.testing.assert_allclose(a.uv_j, b.uv_j)
        np.testing.assert_allclose(a.score, b.score)
    # empty list round-trips too
    pipeline.save_pair_matches(tmp_path / "empty.npz", [])
    assert pipeline.load_pair_matches(tmp_path / "empty.npz") == []


@pytest.mark.slow
def test_match_pairs_sharded_equals_single(rng):
    """Mesh-sharded pair matching returns the same matches as unsharded."""
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.models import LoFTRMatcher
    from onepose_st_tpu.parallel import make_mesh
    from onepose_st_tpu.sfm import pipeline

    cfg = cfg_lib.LoFTRConfig(
        backbone=cfg_lib.BackboneConfig(
            initial_dim=8, block_dims=(8, 12, 16), dtype="float32"
        ),
        coarse=cfg_lib.TransformerConfig(
            d_model=16, nhead=2, layer_iter_n=1, dtype="float32"
        ),
        coarse_matching=cfg_lib.CoarseMatchingConfig(
            max_matches=32, threshold=0.0
        ),
        fine=cfg_lib.FineMatchingConfig(
            window_size=5, d_model=8, nhead=2, dtype="float32"
        ),
    )
    model = LoFTRMatcher(cfg)
    F, H, W = 6, 32, 32
    images = rng.uniform(size=(F, H, W)).astype(np.float32)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.asarray(images[:1, ..., None]), jnp.asarray(images[:1, ..., None]),
    )
    pairs = np.asarray([(i, j) for i in range(F) for j in range(i + 1, F)])

    single = pipeline.match_pairs_loftr(model, variables, images, pairs, batch_size=4)
    mesh = make_mesh(8)
    sharded = pipeline.match_pairs_loftr(
        model, variables, images, pairs, batch_size=1, mesh=mesh
    )
    assert len(single) == len(sharded)
    for a, b in zip(single, sharded):
        assert (a.img_i, a.img_j) == (b.img_i, b.img_j)
        np.testing.assert_allclose(a.uv_i, b.uv_i, atol=1e-4)
        np.testing.assert_allclose(a.uv_j, b.uv_j, atol=1e-3)
        np.testing.assert_allclose(a.score, b.score, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_refine_track_observations_mechanics(rng):
    """Fine-only refinement stays inside the window around the coarse cell
    and preserves the assigned-track structure."""
    import jax
    import jax.numpy as jnp

    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.models import LoFTRMatcher
    from onepose_st_tpu.sfm import pipeline, tracks as tracks_mod

    cfg = cfg_lib.LoFTRConfig(
        backbone=cfg_lib.BackboneConfig(
            initial_dim=8, block_dims=(8, 12, 16), dtype="float32"
        ),
        coarse=cfg_lib.TransformerConfig(
            d_model=16, nhead=2, layer_iter_n=1, dtype="float32"
        ),
        coarse_matching=cfg_lib.CoarseMatchingConfig(max_matches=32),
        fine=cfg_lib.FineMatchingConfig(
            window_size=5, d_model=8, nhead=1, attention="full", dtype="float32"
        ),
    )
    model = LoFTRMatcher(cfg)
    F, H, W = 4, 64, 64
    images = rng.uniform(size=(F, H, W)).astype(np.float32)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.asarray(images[:1, ..., None]), jnp.asarray(images[:1, ..., None]),
    )

    T, M = 6, 3
    assigned = tracks_mod.AssignedTracks(
        ref_idx=rng.integers(0, F, T).astype(np.int32),
        kpt0=rng.uniform(8, 56, size=(T, 2)).astype(np.float32),
        obs_idx=rng.integers(0, F, (T, M)).astype(np.int32),
        kpt1=rng.uniform(8, 56, size=(T, M, 2)).astype(np.float32),
        mask=rng.uniform(size=(T, M)) < 0.7,
        obs_kpt_ids=np.zeros((T, M), np.int32),
        ref_kpt_ids=np.zeros(T, np.int32),
        keyframes=np.arange(F, dtype=np.int32),
    )
    out = pipeline.refine_track_observations(model, variables, images, assigned)
    assert out.kpt1.shape == assigned.kpt1.shape
    np.testing.assert_array_equal(out.mask, assigned.mask)
    np.testing.assert_allclose(out.kpt0, assigned.kpt0)
    stride = cfg.backbone.coarse_stride
    r = cfg.fine.window_size // 2 * cfg.backbone.fine_stride
    for t in range(T):
        for m in range(M):
            if not assigned.mask[t, m]:
                # untouched slots keep their values
                np.testing.assert_allclose(
                    out.kpt1[t, m], assigned.kpt1[t, m]
                )
                continue
            # refined point lies within the fine window of the coarse cell
            cell = (assigned.kpt1[t, m] // stride) * stride
            assert np.all(np.abs(out.kpt1[t, m] - cell) <= stride + r + 1e-3)


@pytest.mark.slow
def test_build_map_with_global_ba(rng):
    """Global BA recovers perturbed scan poses inside the map pipeline."""
    from onepose_st_tpu import config as cfg_lib
    from onepose_st_tpu.data import synthetic
    from onepose_st_tpu.sfm import pipeline, tracks as tracks_mod
    from onepose_st_tpu.sfm.pairs import pairs_exhaustive

    cfg = cfg_lib.EngineConfig()
    cfg = cfg_lib.replace(
        cfg, sfm=cfg_lib.replace(
            cfg.sfm, enable_global_ba=True, merge_radius=1e-4
        )
    )
    scene = synthetic.make_scene(rng, n_points=80, n_frames=8)
    pms = []
    for i, j in pairs_exhaustive(len(scene.poses)):
        vis = scene.visible[int(i)] & scene.visible[int(j)]
        ids = np.nonzero(vis)[0]
        if len(ids) < 8:
            continue
        pms.append(tracks_mod.PairMatches(
            int(i), int(j),
            scene.uv[int(i), ids].astype(np.float32),
            scene.uv[int(j), ids].astype(np.float32),
            np.ones(len(ids), np.float32),
        ))
    # perturb the later poses: global BA should still produce a low-error map
    poses_noisy = scene.poses.copy()
    poses_noisy[2:, 3:] += rng.normal(size=(len(scene.poses) - 2, 3)).astype(np.float32) * 0.002
    m_ba, diag_ba = pipeline.build_map_from_matches(
        pms, poses_noisy, scene.Ks, cfg
    )
    cfg_off = cfg_lib.replace(
        cfg, sfm=cfg_lib.replace(cfg.sfm, enable_global_ba=False)
    )
    m_off, diag_off = pipeline.build_map_from_matches(
        pms, poses_noisy, scene.Ks, cfg_off
    )
    assert len(m_ba.keypoints3d) > 30
    # map points should sit closer to the true surface with global BA
    from scipy.spatial import cKDTree

    tree = cKDTree(scene.points)
    d_ba, _ = tree.query(m_ba.keypoints3d)
    d_off, _ = tree.query(m_off.keypoints3d)
    assert np.median(d_ba) <= np.median(d_off) + 1e-5


def test_filter_by_bbox_any_corner_ordering(rng):
    """The box filter must not depend on the corner enumeration: the ARKit
    parser, the LINEMOD parser, and core.camera.box3d_corners all order the
    8 corners differently."""
    import jax.numpy as jnp

    from onepose_st_tpu.core import camera
    from onepose_st_tpu.data.parse_arkit import CORNER_SIGNS
    from onepose_st_tpu.sfm import filtering

    extent = np.array([0.4, 1.0, 0.2])
    center = np.array([0.3, -0.2, 1.0])
    # random rotation applied to the box (oriented, not axis-aligned)
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec([0.3, -0.5, 0.9]).as_matrix()
    pts = rng.uniform(-1.5, 1.5, size=(4000, 3)) * extent + center
    pts = (pts - center) @ R.T + center

    def corners_from(signs):
        c = signs * (extent / 2)[None]
        return c @ R.T + center

    m_camera = filtering.filter_by_bbox(
        pts, np.asarray(camera.box3d_corners(jnp.asarray(extent))) @ R.T + center
    )
    m_arkit = filtering.filter_by_bbox(pts, corners_from(CORNER_SIGNS))
    np.testing.assert_array_equal(m_camera, m_arkit)
    # ground truth: local-frame half-space test
    local = (pts - center) @ R
    gt = np.all(np.abs(local) <= extent / 2 + 1e-9, axis=-1)
    np.testing.assert_array_equal(m_camera, gt)
    assert 0 < gt.sum() < len(pts)


def test_build_map_with_sampler_reports_final_reproj(rng):
    """The reproj diagnostic must survive the descriptor-aggregation block
    (which reuses local names for its flat observation table) and reflect
    the point-refined map (well under the 0.3 px observation noise * DLT)."""
    from onepose_st_tpu import config as cfg_lib

    scene = synthetic.make_scene(rng, n_points=100, n_frames=8)
    pms = []
    for i in range(8):
        for j in range(i + 1, 8):
            vis = scene.visible[i] & scene.visible[j]
            ids = np.nonzero(vis)[0]
            if len(ids) < 8:
                continue
            noise = rng.normal(size=(len(ids), 2)).astype(np.float32) * 0.3
            pms.append(tracks.PairMatches(
                i, j, scene.uv[i, ids].astype(np.float32),
                scene.uv[j, ids].astype(np.float32) + noise,
                np.ones(len(ids), np.float32),
            ))
    stub = lambda img, uv: (  # noqa: E731
        np.ones((len(uv), 256), np.float32),
        np.ones((len(uv), 128), np.float32),
    )
    m, d = pipeline.build_map_from_matches(
        pms, scene.poses, scene.Ks, cfg_lib.EngineConfig(),
        sample_descriptors=stub,
    )
    assert len(m.keypoints3d) > 50
    assert 0 < d.mean_reproj_err_px < 0.6


def test_build_map_iterative_refine(rng):
    """refine_iters=2: second refine pass receives reprojection centers of
    the BA-refined points and the point GN re-solves on the new
    observations (SfMConfig.refine_iters)."""
    from onepose_st_tpu import config as cfg_lib

    scene = synthetic.make_scene(rng, n_points=200, n_frames=8)
    cfg = cfg_lib.replace(
        EngineConfig(), sfm=cfg_lib.replace(EngineConfig().sfm, refine_iters=2)
    )
    pair_list = pairs.pairs_from_poses(scene.Rs, scene.ts, covis_num=6)
    pms = []
    for i, j in pair_list:
        pm, _ = make_pair_matches(
            scene, int(i), int(j), noise_px=0.0, n_outliers=0, rng=rng
        )
        # quantize observations to an 8 px grid: the error a single
        # cell-centered fine pass cannot remove
        pms.append(pm._replace(uv_j=(np.floor(pm.uv_j / 8) + 0.5) * 8))

    calls = []

    def refine_obs(assigned, centers=None):
        calls.append(centers is not None)
        if centers is None:
            return assigned  # pass 1: nothing to add on synthetic data
        assert centers.shape == assigned.kpt1.shape
        # pass 2 stand-in for the fine matcher: trust the window center
        # (the reprojection) — plumbing test; accuracy value is measured
        # in the e2e experiments
        kpt1 = np.where(assigned.mask[..., None], centers, assigned.kpt1)
        return assigned._replace(kpt1=kpt1.astype(np.float32))

    m2, d2 = pipeline.build_map_from_matches(
        pms, scene.poses, scene.Ks, cfg, refine_observations=refine_obs
    )
    assert calls == [False, True]
    assert "refine2" in d2.stage_seconds and "point_ba2" in d2.stage_seconds

    cfg1 = EngineConfig()
    m1, d1 = pipeline.build_map_from_matches(
        pms, scene.poses, scene.Ks, cfg1,
        refine_observations=lambda a, centers=None: a,
    )
    # reprojection-centered pass tightened the map
    assert d2.mean_reproj_err_px < d1.mean_reproj_err_px
    assert len(m2.keypoints3d) > 50
