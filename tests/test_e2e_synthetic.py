"""End-to-end: render -> map -> train matcher -> inference -> pose error.

The framework analogue of the reference's demo.sh smoke path (SURVEY.md §4):
everything ground-truthed by construction. Small sizes so it runs on the
CPU mesh in a few minutes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onepose_st_tpu import config as cfg_lib
from onepose_st_tpu.core import camera, metrics, so3
from onepose_st_tpu.data import synthetic
from onepose_st_tpu.models import OnePoseMatcher
from onepose_st_tpu.sfm import pipeline as sfm_pipeline
from onepose_st_tpu.sfm import tracks as tracks_mod
from onepose_st_tpu.sfm import pairs as pairs_mod
from onepose_st_tpu.solvers import ransac_pnp
from onepose_st_tpu.train import data as data_mod, loop as loop_mod


def tiny_cfg():
    matcher = cfg_lib.MatcherConfig(
        backbone=cfg_lib.BackboneConfig(
            initial_dim=16, block_dims=(16, 24, 32), dtype="float32"
        ),
        coarse=cfg_lib.TransformerConfig(
            d_model=32, nhead=4, layer_iter_n=2, dtype="float32"
        ),
        coarse_matching=cfg_lib.CoarseMatchingConfig(
            max_matches=96, train_pad_num_gt_min=32, threshold=0.1,
        ),
        fine=cfg_lib.FineMatchingConfig(
            window_size=5, d_model=16, nhead=4, dtype="float32"
        ),
        kpt_encoding=cfg_lib.KeypointEncodingConfig(
            hidden=(16, 32), descriptor_dim=32
        ),
        n_points=128,
    )
    return cfg_lib.EngineConfig(matcher=matcher)


@pytest.mark.slow
def test_e2e_render_map_train_infer(rng):
    """Pipeline-mechanics e2e: pose recovery on a trained view.

    A from-scratch micro-model over 12 synthetic views does not generalize
    to held-out viewpoints (that requires the full-size model + long
    training — exercised by the TPU-scale experiment in examples/); this
    test instead gates the full mechanical loop: render -> map (dedup'd)
    -> train -> match -> PnP, catching coordinate/supervision misalignment.
    """
    cfg = tiny_cfg()
    cfg = cfg_lib.replace(
        cfg, sfm=cfg_lib.replace(cfg.sfm, merge_radius=8e-3)
    )
    scene = synthetic.make_scene(
        rng, n_points=70, n_frames=14, image_hw=(64, 64), focal=90.0,
        object_size=0.25,
    )
    frames = synthetic.render_sequence(scene, rng, sigma_px=1.6)
    train_ids = np.arange(0, 12)
    eval_ids = np.array([0, 6])  # trained views: mechanics, not generalization

    # --- 1. map building from GT-derived matches, descriptors from the
    # (untrained) backbone — self-consistent with what inference sees
    model = OnePoseMatcher(cfg.matcher)
    L = cfg.matcher.n_points
    variables = model.init(
        jax.random.key(0),
        jnp.asarray(frames[:1, ..., None]),
        jnp.zeros((1, L, 3)), jnp.zeros((1, L, 32)), jnp.zeros((1, L, 16)),
    )

    feat_cache = {}

    def backbone_feats(img_id):
        if img_id not in feat_cache:
            fc, ff = model.apply(
                variables, jnp.asarray(frames[img_id][None, ..., None]),
                train=False,
                method=lambda m, im, train: m.backbone(im, train),
            )
            feat_cache[img_id] = (fc, ff)
        return feat_cache[img_id]

    from onepose_st_tpu.ops import sampling as sampling_ops

    def sample_desc(img_id, uv):
        fc, ff = backbone_feats(img_id)
        dc = sampling_ops.sample_descriptors(fc, jnp.asarray(uv)[None], 8.0)[0]
        df = sampling_ops.sample_descriptors(ff, jnp.asarray(uv)[None], 2.0)[0]
        return np.asarray(dc), np.asarray(df)

    pms = []
    for i, j in pairs_mod.pairs_exhaustive(len(train_ids)):
        vis = scene.visible[int(i)] & scene.visible[int(j)]
        ids = np.nonzero(vis)[0]
        if len(ids) < 6:
            continue
        pms.append(
            tracks_mod.PairMatches(
                int(i), int(j),
                scene.uv[int(i), ids].astype(np.float32),
                (scene.uv[int(j), ids] + rng.normal(size=(len(ids), 2)) * 0.2).astype(np.float32),
                np.ones(len(ids), np.float32),
            )
        )
    corners = np.asarray(camera.box3d_corners(jnp.asarray([0.3, 0.3, 0.3])))
    sfm_map, diag = sfm_pipeline.build_map_from_matches(
        pms, scene.poses, scene.Ks, cfg, box_corners=corners,
        sample_descriptors=sample_desc, desc_dims=(32, 16),
    )
    assert len(sfm_map.keypoints3d) >= 40

    # --- 2. train the matcher on the training frames
    batches = data_mod.map_training_batches(
        sfm_map, frames, scene.poses, scene.Ks, cfg,
        rng, batch_size=2, frame_ids=train_ids,
    )
    state, history = loop_mod.fit(
        cfg, model, batches, n_steps=800, log_every=100,
    )
    assert history[-1]["loss_coarse"] < history[0]["loss_coarse"] * 0.4

    # --- 3. inference on held-out frames: matcher -> PnP -> pose error
    trained = {"params": state.params, "batch_stats": state.batch_stats}
    k, dc, df, s, mask = sfm_map.padded(cfg.matcher.n_points)
    r_errs, t_errs, n_correct = [], [], []
    for t in eval_ids:
        out = model.apply(
            trained,
            jnp.asarray(frames[t][None, ..., None]),
            jnp.asarray(k)[None], jnp.asarray(dc)[None],
            jnp.asarray(df)[None], jnp.asarray(mask)[None],
        )
        res = ransac_pnp(
            jax.random.key(int(t)),
            out["mkpts3d"][0], out["mkpts_query_f"][0],
            jnp.asarray(scene.Ks[t]), out["matches"].valid[0], cfg.pnp,
        )
        R, tr = so3.pose6_to_Rt(res.pose6)
        T_pred = np.eye(4); T_pred[:3, :3] = np.asarray(R); T_pred[:3, 3] = np.asarray(tr)
        T_gt = np.eye(4); T_gt[:3, :3] = scene.Rs[t]; T_gt[:3, 3] = scene.ts[t]
        r_err, t_err = metrics.query_pose_error(T_pred, T_gt)
        r_errs.append(r_err)
        t_errs.append(t_err)
        # cell-level correctness of the extracted matches vs GT projection
        from onepose_st_tpu.train import supervision

        sup = supervision.project_gt(
            jnp.asarray(k)[None], jnp.asarray(scene.poses[t])[None],
            jnp.asarray(scene.Ks[t])[None], (64, 64), 8,
            jnp.asarray(mask)[None],
        )
        m = out["matches"]
        valid = np.asarray(m.valid[0])
        ii = np.asarray(m.i_ids[0])[valid]
        jj = np.asarray(m.j_ids[0])[valid]
        gt_j = np.asarray(sup.gt_j[0])
        correct = (gt_j[ii] == jj).mean() if valid.any() else 0.0
        n_correct.append(correct)
    assert np.median(n_correct) > 0.8, (n_correct, r_errs, t_errs)
    assert np.median(r_errs) < 15.0, (r_errs, t_errs)
    assert np.median(t_errs) < 15.0, (r_errs, t_errs)  # cm


@pytest.mark.slow
def test_e2e_sharded_full_pipeline(rng):
    """Whole-pipeline multichip correctness on the 8-virtual-device mesh
    (VERDICT r4 #8): sharded 2D-2D pair matching -> map build -> sharded
    data-parallel matcher training (fit(mesh=...)) -> eval with PnP. The
    single-device e2e above gates QUALITY; this gates that the SHARDED
    path runs the same pipeline end-to-end (matching parity, finite
    descending loss through the gradient psum, sane poses out).

    Reference analogue: the Ray/DDP fan-outs (run.py:80-89,
    configs/experiment/train.yaml:17-34)."""
    from onepose_st_tpu.models import LoFTRMatcher
    from onepose_st_tpu.parallel import make_mesh

    cfg = tiny_cfg()
    cfg = cfg_lib.replace(
        cfg, sfm=cfg_lib.replace(cfg.sfm, merge_radius=8e-3)
    )
    mesh = make_mesh(8)
    scene = synthetic.make_scene(
        rng, n_points=70, n_frames=14, image_hw=(64, 64), focal=90.0,
        object_size=0.25,
    )
    frames = synthetic.render_sequence(scene, rng, sigma_px=1.6)
    train_ids = np.arange(0, 12)
    eval_ids = np.array([0, 6])

    # --- 1. SHARDED pair matching runs and agrees with single-device
    lcfg = cfg_lib.LoFTRConfig(
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
    loftr = LoFTRMatcher(lcfg)
    lvars = jax.jit(loftr.init)(
        jax.random.key(3),
        jnp.asarray(frames[:1, ..., None]), jnp.asarray(frames[:1, ..., None]),
    )
    some_pairs = np.asarray([(0, 1), (1, 2), (2, 3), (3, 4)])
    pm_sharded = sfm_pipeline.match_pairs_loftr(
        loftr, lvars, frames, some_pairs, batch_size=1, mesh=mesh
    )
    pm_single = sfm_pipeline.match_pairs_loftr(
        loftr, lvars, frames, some_pairs, batch_size=2
    )
    assert len(pm_sharded) == len(pm_single)
    for a, b in zip(pm_single, pm_sharded):
        np.testing.assert_allclose(a.uv_i, b.uv_i, atol=1e-3)

    # --- 2. map from GT-derived matches (quality-independent of the
    # untrained LoFTR), descriptors from the matcher backbone
    model = OnePoseMatcher(cfg.matcher)
    L = cfg.matcher.n_points
    variables = model.init(
        jax.random.key(0),
        jnp.asarray(frames[:1, ..., None]),
        jnp.zeros((1, L, 3)), jnp.zeros((1, L, 32)), jnp.zeros((1, L, 16)),
    )
    from onepose_st_tpu.ops import sampling as sampling_ops

    feat_cache = {}

    def sample_desc(img_id, uv):
        if img_id not in feat_cache:
            feat_cache[img_id] = model.apply(
                variables, jnp.asarray(frames[img_id][None, ..., None]),
                train=False,
                method=lambda m, im, train: m.backbone(im, train),
            )
        fc, ff = feat_cache[img_id]
        dc = sampling_ops.sample_descriptors(fc, jnp.asarray(uv)[None], 8.0)[0]
        df = sampling_ops.sample_descriptors(ff, jnp.asarray(uv)[None], 2.0)[0]
        return np.asarray(dc), np.asarray(df)

    pms = []
    for i, j in pairs_mod.pairs_exhaustive(len(train_ids)):
        vis = scene.visible[int(i)] & scene.visible[int(j)]
        ids = np.nonzero(vis)[0]
        if len(ids) < 6:
            continue
        pms.append(tracks_mod.PairMatches(
            int(i), int(j),
            scene.uv[int(i), ids].astype(np.float32),
            (scene.uv[int(j), ids]
             + rng.normal(size=(len(ids), 2)) * 0.2).astype(np.float32),
            np.ones(len(ids), np.float32),
        ))
    corners = np.asarray(camera.box3d_corners(jnp.asarray([0.3, 0.3, 0.3])))
    sfm_map, _ = sfm_pipeline.build_map_from_matches(
        pms, scene.poses, scene.Ks, cfg, box_corners=corners,
        sample_descriptors=sample_desc, desc_dims=(32, 16),
    )
    assert len(sfm_map.keypoints3d) >= 40

    # --- 3. SHARDED training: batch axis split over the 8-device mesh,
    # XLA inserts the gradient psum (fit(mesh=...))
    batches = data_mod.map_training_batches(
        sfm_map, frames, scene.poses, scene.Ks, cfg,
        rng, batch_size=8, frame_ids=train_ids,
    )
    state, history = loop_mod.fit(
        cfg, model, batches, n_steps=800, log_every=100, mesh=mesh,
    )
    assert np.isfinite(history[-1]["loss"])
    assert history[-1]["loss_coarse"] < history[0]["loss_coarse"] * 0.5

    # --- 4. eval: matcher + PnP on trained views (mechanics gate)
    trained = {"params": state.params, "batch_stats": state.batch_stats}
    k, dc, df, s, mask = sfm_map.padded(cfg.matcher.n_points)
    ok = 0
    for t in eval_ids:
        out = model.apply(
            trained,
            jnp.asarray(frames[t][None, ..., None]),
            jnp.asarray(k)[None], jnp.asarray(dc)[None],
            jnp.asarray(df)[None], jnp.asarray(mask)[None],
        )
        res = ransac_pnp(
            jax.random.key(int(t)),
            out["mkpts3d"][0], out["mkpts_query_f"][0],
            jnp.asarray(scene.Ks[t]), out["matches"].valid[0], cfg.pnp,
        )
        R, tr = so3.pose6_to_Rt(res.pose6)
        T_pred = np.eye(4)
        T_pred[:3, :3] = np.asarray(R)
        T_pred[:3, 3] = np.asarray(tr)
        T_gt = np.eye(4)
        T_gt[:3, :3] = scene.Rs[t]
        T_gt[:3, 3] = scene.ts[t]
        r_err, t_err = metrics.query_pose_error(T_pred, T_gt)
        if bool(res.success) and r_err < 30.0 and t_err < 30.0:
            ok += 1
    assert ok >= 1, "no eval view recovered a sane pose on the sharded path"
