import jax
import jax.numpy as jnp
import numpy as np

from onepose_st_tpu.core import so3
from onepose_st_tpu.data import synthetic
from onepose_st_tpu.sfm.ba import (
    BundleProblem,
    DepthBAProblem,
    solve_bundle,
    solve_depth_ba,
)
from onepose_st_tpu.sfm.ba import depth_ba as depth_ba_mod


def _depth_problem(rng, noise_px=0.0, n_points=200, n_frames=10):
    scene = synthetic.make_scene(rng, n_points=n_points, n_frames=n_frames)
    tracks = synthetic.make_tracks(scene, rng, noise_px=noise_px)
    prob = DepthBAProblem(
        kpt0=jnp.asarray(tracks.kpt0),
        ref_idx=jnp.asarray(tracks.ref_idx),
        obs_idx=jnp.asarray(tracks.obs_idx),
        kpt1=jnp.asarray(tracks.kpt1),
        mask=jnp.asarray(tracks.mask),
        poses=jnp.asarray(scene.poses),
        Ks=jnp.asarray(scene.Ks),
    )
    return scene, tracks, prob


def test_depth_residual_zero_at_gt(rng):
    _, tracks, prob = _depth_problem(rng)
    r = depth_ba_mod.residuals(jnp.asarray(tracks.depth_gt), prob)
    assert float(jnp.abs(r).max()) < 0.5  # f32 projection roundoff, px


def test_depth_ba_recovers_depth(rng):
    _, tracks, prob = _depth_problem(rng)
    depth0 = jnp.asarray(tracks.depth_gt * (1 + rng.uniform(-0.2, 0.2, tracks.depth_gt.shape)).astype(np.float32))
    depth, info = solve_depth_ba(depth0, prob)
    rel = np.abs(np.asarray(depth) - tracks.depth_gt) / tracks.depth_gt
    assert float(info["final_cost"]) < float(info["initial_cost"]) * 1e-3
    assert np.median(rel) < 1e-3


def test_depth_ba_noisy(rng):
    _, tracks, prob = _depth_problem(rng, noise_px=1.0)
    depth0 = jnp.asarray(tracks.depth_gt * 1.1)
    depth, info = solve_depth_ba(depth0, prob)
    rel = np.abs(np.asarray(depth) - tracks.depth_gt) / tracks.depth_gt
    assert np.median(rel) < 0.02
    assert float(info["final_cost"]) < float(info["initial_cost"])


def test_depth_ba_matches_float64_reference(rng):
    """f32 on-device LM vs a float64 numpy Gauss-Newton on the same problem."""
    scene, tracks, prob = _depth_problem(rng, n_points=50, n_frames=6)
    depth0 = tracks.depth_gt * 1.15

    # float64 reference: per-track scalar GN with numeric jacobian
    def np_residual(d, t):
        K0 = scene.Ks[tracks.ref_idx[t]].astype(np.float64)
        uv0 = tracks.kpt0[t].astype(np.float64)
        x = (uv0[0] - K0[0, 2]) / K0[0, 0]
        y = (uv0[1] - K0[1, 2]) / K0[1, 1]
        p_cam = np.array([x * d, y * d, d])
        R0 = scene.Rs[tracks.ref_idx[t]].astype(np.float64)
        t0 = scene.ts[tracks.ref_idx[t]].astype(np.float64)
        p_w = R0.T @ (p_cam - t0)
        rs = []
        for m in range(tracks.obs_idx.shape[1]):
            if not tracks.mask[t, m]:
                continue
            f = tracks.obs_idx[t, m]
            pc = scene.Rs[f].astype(np.float64) @ p_w + scene.ts[f]
            uvz = scene.Ks[f].astype(np.float64) @ pc
            uv = uvz[:2] / (uvz[2] + 1e-4)
            rs.append(uv - tracks.kpt1[t, m])
        return np.concatenate(rs)

    ref_depth = np.empty_like(depth0, dtype=np.float64)
    for t in range(len(depth0)):
        d = float(depth0[t])
        for _ in range(20):
            r = np_residual(d, t)
            h = 1e-7 * max(d, 1.0)
            j = (np_residual(d + h, t) - r) / h
            d = d - float(j @ r) / float(j @ j + 1e-12)
        ref_depth[t] = d

    depth, _ = solve_depth_ba(jnp.asarray(depth0), prob)
    rel = np.abs(np.asarray(depth, np.float64) - ref_depth) / ref_depth
    assert np.median(rel) < 1e-3


def _bundle_problem(scene, tracks, max_track_length=9):
    """Bundle layout: per point, all its observations (ref first)."""
    T = len(tracks.point_ids)
    M = max_track_length
    obs_frame = np.zeros((T, M), np.int32)
    obs_uv = np.zeros((T, M, 2), np.float32)
    obs_mask = np.zeros((T, M), bool)
    for t in range(T):
        obs_frame[t, 0] = tracks.ref_idx[t]
        obs_uv[t, 0] = tracks.kpt0[t]
        obs_mask[t, 0] = True
        m = int(tracks.mask[t].sum())
        n = min(m, M - 1)
        obs_frame[t, 1 : 1 + n] = tracks.obs_idx[t, :n]
        obs_uv[t, 1 : 1 + n] = tracks.kpt1[t, :n]
        obs_mask[t, 1 : 1 + n] = True
    return obs_frame, obs_uv, obs_mask


def test_bundle_triangulation_mode(rng):
    """All poses fixed: perturbed points must return to GT."""
    scene = synthetic.make_scene(rng, n_points=100, n_frames=8)
    tracks = synthetic.make_tracks(scene, rng)
    obs_frame, obs_uv, obs_mask = _bundle_problem(scene, tracks)
    pts_gt = scene.points[tracks.point_ids]
    pts0 = pts_gt + rng.normal(size=pts_gt.shape).astype(np.float32) * 0.01
    prob = BundleProblem(
        Ks=jnp.asarray(scene.Ks),
        obs_frame=jnp.asarray(obs_frame),
        obs_uv=jnp.asarray(obs_uv),
        obs_mask=jnp.asarray(obs_mask),
        fixed_pose=jnp.ones(len(scene.poses), bool),
    )
    poses, points, info = solve_bundle(
        jnp.asarray(scene.poses), jnp.asarray(pts0), prob
    )
    np.testing.assert_allclose(np.asarray(poses), scene.poses)  # untouched
    err = np.linalg.norm(np.asarray(points) - pts_gt, axis=-1)
    assert np.median(err) < 5e-4
    assert float(info.final_cost) < float(info.initial_cost) * 1e-2


def test_bundle_full_recovers_poses_and_points(rng):
    """Two poses fixed (gauge + scale); perturb the rest + points."""
    scene = synthetic.make_scene(rng, n_points=120, n_frames=8)
    tracks = synthetic.make_tracks(scene, rng)
    obs_frame, obs_uv, obs_mask = _bundle_problem(scene, tracks)
    pts_gt = scene.points[tracks.point_ids]
    F = len(scene.poses)
    fixed = np.zeros(F, bool)
    fixed[:2] = True
    poses0 = scene.poses.copy()
    poses0[2:, :3] += rng.normal(size=(F - 2, 3)).astype(np.float32) * 0.01
    poses0[2:, 3:] += rng.normal(size=(F - 2, 3)).astype(np.float32) * 0.005
    pts0 = pts_gt + rng.normal(size=pts_gt.shape).astype(np.float32) * 0.005
    prob = BundleProblem(
        Ks=jnp.asarray(scene.Ks),
        obs_frame=jnp.asarray(obs_frame),
        obs_uv=jnp.asarray(obs_uv),
        obs_mask=jnp.asarray(obs_mask),
        fixed_pose=jnp.asarray(fixed),
    )
    poses, points, info = solve_bundle(
        jnp.asarray(poses0), jnp.asarray(pts0), prob, max_iters=24
    )
    assert float(info.final_cost) < float(info.initial_cost) * 1e-2
    # rotation error of recovered poses vs GT
    R_rec = np.asarray(so3.exp(jnp.asarray(np.asarray(poses)[:, :3])))
    for f in range(F):
        dR = R_rec[f] @ scene.Rs[f].T
        ang = np.rad2deg(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.15, f"frame {f}: {ang} deg"
        t_err = np.linalg.norm(np.asarray(poses)[f, 3:] - scene.ts[f])
        assert t_err < 2e-3, f"frame {f}: {t_err} m"
    err = np.linalg.norm(np.asarray(points) - pts_gt, axis=-1)
    assert np.median(err) < 1e-3


def test_bundle_sharded_matches_single_device(rng):
    """8-way sharded BA must agree with the single-device solver."""
    from onepose_st_tpu.parallel import make_mesh
    from onepose_st_tpu.sfm.ba.distributed import solve_bundle_sharded

    scene = synthetic.make_scene(rng, n_points=100, n_frames=6)
    tracks = synthetic.make_tracks(scene, rng)
    obs_frame, obs_uv, obs_mask = _bundle_problem(scene, tracks)
    pts_gt = scene.points[tracks.point_ids]
    F = len(scene.poses)
    fixed = np.zeros(F, bool)
    fixed[:2] = True
    poses0 = scene.poses.copy()
    poses0[2:, :3] += rng.normal(size=(F - 2, 3)).astype(np.float32) * 0.01
    pts0 = pts_gt + rng.normal(size=pts_gt.shape).astype(np.float32) * 0.005
    prob = BundleProblem(
        Ks=jnp.asarray(scene.Ks),
        obs_frame=jnp.asarray(obs_frame),
        obs_uv=jnp.asarray(obs_uv),
        obs_mask=jnp.asarray(obs_mask),
        fixed_pose=jnp.asarray(fixed),
    )
    poses_s, points_s, info_s = solve_bundle(
        jnp.asarray(poses0), jnp.asarray(pts0), prob, max_iters=10
    )
    mesh = make_mesh(8)
    poses_d, points_d, info_d = solve_bundle_sharded(
        jnp.asarray(poses0), jnp.asarray(pts0), prob, mesh, max_iters=10
    )
    # same optimum (iteration-for-iteration identical up to f32 reduction order)
    np.testing.assert_allclose(
        np.asarray(poses_d), np.asarray(poses_s), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(points_d), np.asarray(points_s), atol=5e-4
    )
    assert float(info_d.final_cost) < float(info_d.initial_cost) * 1e-2


def test_bundle_point_count_not_multiple_of_chunk(rng):
    """P > chunk with P % chunk != 0 exercised the negative-pad bug in the
    Schur chunking (n_chunks floor-divided instead of ceil)."""
    scene = synthetic.make_scene(rng, n_points=700, n_frames=6)
    tracks = synthetic.make_tracks(scene, rng)
    obs_frame, obs_uv, obs_mask = _bundle_problem(scene, tracks)
    pts_gt = scene.points[tracks.point_ids]
    pts0 = pts_gt + rng.normal(size=pts_gt.shape).astype(np.float32) * 0.005
    prob = BundleProblem(
        Ks=jnp.asarray(scene.Ks),
        obs_frame=jnp.asarray(obs_frame),
        obs_uv=jnp.asarray(obs_uv),
        obs_mask=jnp.asarray(obs_mask),
        fixed_pose=jnp.ones(len(scene.poses), bool),
    )
    # default chunk=512 < P=700 and 700 % 512 != 0
    poses, points, info = solve_bundle(
        jnp.asarray(scene.poses), jnp.asarray(pts0), prob, max_iters=8
    )
    assert float(info.final_cost) < float(info.initial_cost)
