"""Scene dump writer (wis3d-analogue, reference vis3d.py)."""
import json

import numpy as np

from onepose_st_tpu.data.ply_io import load_ply
from onepose_st_tpu.utils.scene3d import SceneDump


def test_scene_dump_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(500, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, size=(500, 3)).astype(np.uint8)

    dump = SceneDump(max_viewer_points=100)
    dump.add_points("map", xyz, rgb)
    K = np.array([[300.0, 0, 128], [0, 300, 128], [0, 0, 1]])
    T = np.eye(4)
    T[:3, 3] = [0.1, -0.2, 1.5]
    dump.add_camera("cam0", T, K, (256, 256), scale=0.1)
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float32,
    )[[0, 1, 3, 2, 4, 5, 7, 6]]
    dump.add_box("box", corners)
    dump.add_trajectory("traj", rng.normal(size=(10, 3)))
    out = dump.save(tmp_path / "scene")

    # PLY preserved in full
    pts, cols = load_ply(out / "map.ply")
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    np.testing.assert_array_equal(cols, rgb)

    scene = json.loads((out / "scene.json").read_text())
    assert len(scene["points"][0]["xyz"]) == 100  # viewer subsampling
    names = [l["name"] for l in scene["lines"]]
    assert names == ["cam0", "box", "traj"]
    assert len(scene["lines"][0]["seg"]) == 8  # frustum edges
    assert len(scene["lines"][1]["seg"]) == 12  # box edges
    assert len(scene["lines"][2]["seg"]) == 9  # 10-pt polyline

    html = (out / "viewer.html").read_text()
    assert "__SCENE_JSON__" not in html and "SCENE =" in html


def test_camera_frustum_apex_is_camera_center(tmp_path):
    # world->cam T: apex must land at the camera center C = -R^T t
    rng = np.random.default_rng(1)
    from scipy.spatial.transform import Rotation

    R = Rotation.random(random_state=2).as_matrix()
    t = rng.normal(size=3)
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, t
    K = np.array([[200.0, 0, 64], [0, 200, 64], [0, 0, 1]])

    dump = SceneDump()
    dump.add_camera("cam", T, K, (128, 128))
    segs = dump._lines[0]["seg"]
    apex = segs[0, 0]  # first 4 edges start at the apex
    np.testing.assert_allclose(apex, -R.T @ t, atol=1e-5)
