"""COLMAP SQLite database interop."""
import numpy as np

from onepose_st_tpu.data import colmap_db as cdb


def test_pair_id_roundtrip():
    for a, b in [(1, 2), (7, 3), (100, 100000)]:
        pid = cdb.image_ids_to_pair_id(a, b)
        i, j = cdb.pair_id_to_image_ids(pid)
        assert (i, j) == (min(a, b), max(a, b))


def test_db_roundtrip(tmp_path, rng):
    path = tmp_path / "db.db"
    with cdb.ColmapDatabase(path) as db:
        cam = db.add_camera("PINHOLE", 640, 480, [500.0, 510.0, 320.0, 240.0])
        i1 = db.add_image("a.png", cam)
        i2 = db.add_image("b.png", cam)
        kp1 = rng.uniform(0, 640, size=(30, 2)).astype(np.float32)
        kp2 = rng.uniform(0, 640, size=(25, 2)).astype(np.float32)
        db.add_keypoints(i1, kp1)
        db.add_keypoints(i2, kp2)
        m = np.stack([np.arange(10), np.arange(10) + 5], axis=1)
        db.add_matches(i1, i2, m)
        db.add_two_view_geometry(i1, i2, m)

    with cdb.ColmapDatabase(path) as db:
        np.testing.assert_allclose(db.read_keypoints(i1), kp1)
        np.testing.assert_array_equal(db.read_matches(i1, i2), m)
        # reversed order flips columns
        np.testing.assert_array_equal(db.read_matches(i2, i1), m[:, ::-1])
        imgs = db.read_images()
        assert imgs[i1][0] == "a.png"


def test_export_matches_db(tmp_path, rng):
    Ks = np.tile(np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]]), (3, 1, 1))
    kps = [rng.uniform(0, 64, size=(12, 2)).astype(np.float32) for _ in range(3)]
    matches = {
        (0, 1): np.stack([np.arange(5), np.arange(5)], 1),
        (1, 2): np.stack([np.arange(4), np.arange(4) + 2], 1),
    }
    cdb.export_matches_db(tmp_path / "x.db", Ks, (64, 64), kps, matches)
    with cdb.ColmapDatabase(tmp_path / "x.db") as db:
        assert len(db.read_images()) == 3
        np.testing.assert_allclose(db.read_keypoints(1), kps[0] + 0.5)
        np.testing.assert_array_equal(db.read_matches(1, 2), matches[(0, 1)])
