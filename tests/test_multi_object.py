"""Detector reference DB on the map + multi-object training data."""
import numpy as np

from onepose_st_tpu import config as cfg_lib
from onepose_st_tpu.data import annotations as anno
from onepose_st_tpu.sfm.map import SfMMap, make_reference_db, select_reference_views
from onepose_st_tpu.train.data import multi_object_batches


def _toy_map(rng, P=20, cc=8, cf=4):
    return SfMMap(
        keypoints3d=rng.normal(size=(P, 3)).astype(np.float32) * 0.1,
        desc_coarse=rng.normal(size=(P, cc)).astype(np.float32),
        desc_fine=rng.normal(size=(P, cf)).astype(np.float32),
        scores=np.ones(P, np.float32),
    )


def test_select_reference_views(rng):
    from scipy.spatial.transform import Rotation

    F = 40
    poses = np.zeros((F, 6), np.float32)
    poses[:, :3] = Rotation.random(F, rng).as_rotvec()
    sel = select_reference_views(poses, 10)
    assert len(sel) == 10 and len(np.unique(sel)) == 10
    sel_even = select_reference_views(poses, 10, strategy="even")
    assert sel_even[0] == 0 and sel_even[-1] == F - 1
    # fewer frames than views
    assert len(select_reference_views(poses[:4], 10)) == 4


def test_reference_db_roundtrip(tmp_path, rng):
    m = _toy_map(rng)
    F, H, W = 12, 48, 64
    images = rng.uniform(size=(F, H, W)).astype(np.float32)
    poses = np.tile(np.array([0, 0, 0, 0, 0, 1.5], np.float32), (F, 1))
    poses[:, 0] = np.linspace(0, 0.5, F)  # vary rotation
    Ks = np.tile(np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32), (F, 1, 1))
    make_reference_db(m, images, poses, Ks, n_views=5)
    assert m.ref_images.shape == (5, H, W) and m.ref_images.dtype == np.uint8
    assert m.ref_boxes.shape == (5, 4)
    assert (m.ref_boxes[:, 2] > m.ref_boxes[:, 0]).all()
    m.save(tmp_path / "m.npz")
    m2 = SfMMap.load(tmp_path / "m.npz")
    np.testing.assert_array_equal(m2.ref_images, m.ref_images)
    np.testing.assert_allclose(m2.ref_boxes, m.ref_boxes)


def test_multi_object_batches(rng):
    cfg = cfg_lib.EngineConfig(
        matcher=cfg_lib.replace(cfg_lib.MatcherConfig(), n_points=32)
    )
    objects = []
    for o in range(3):
        m = _toy_map(rng, P=10 + o)
        frames = rng.uniform(size=(4, 32, 32)).astype(np.float32)
        poses = np.tile(np.array([0, 0, 0, 0, 0, 1.0 + o], np.float32), (4, 1))
        Ks = np.tile(np.array([[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]], np.float32), (4, 1, 1))
        objects.append((m, frames, poses, Ks))
    it = multi_object_batches(objects, cfg, rng, batch_size=8)
    b = next(it)
    assert b.query_image.shape == (8, 32, 32, 1)
    assert b.kpts3d.shape == (8, 32, 3)
    # depth (tz) identifies the object: multiple objects must appear
    assert len(np.unique(b.pose_gt[:, 5])) > 1
    assert np.isfinite(b.K_crop).all()


def test_annotations_index(tmp_path):
    entries = [
        anno.ObjectEntry("obj1", "maps/obj1.npz", ["a-annotate"], ["b-annotate"]),
        anno.ObjectEntry("obj2", "maps/obj2.npz", ["c-annotate"], []),
    ]
    anno.merge_objects(tmp_path / "index.json", entries)
    loaded = anno.load_index(tmp_path / "index.json")
    assert len(loaded) == 2
    assert loaded[0].name == "obj1"
    assert loaded[0].val_seq_dirs == ["b-annotate"]
    assert loaded[1].train_seq_dirs == ["c-annotate"]
