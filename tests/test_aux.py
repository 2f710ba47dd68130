"""Aux subsystems: viz, profiler, eval harness, COLMAP interop."""
import numpy as np

from onepose_st_tpu.data import colmap_io
from onepose_st_tpu.infer.evaluate import evaluate_poses
from onepose_st_tpu.utils import profiler, viz


def test_draw_and_reproject(rng):
    corners = rng.uniform(-0.1, 0.1, size=(8, 3))
    T = np.eye(4)
    T[2, 3] = 1.0
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    uv = viz.reproject_corners(corners, T, K)
    assert uv.shape == (8, 2)
    img = viz.draw_3d_box(rng.uniform(size=(64, 64)).astype(np.float32), uv)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8


def test_plot_matches(rng):
    img = rng.uniform(size=(32, 32)).astype(np.float32)
    uv = rng.uniform(0, 32, size=(10, 2)).astype(np.float32)
    canvas = viz.plot_matches(img, img, uv, uv)
    assert canvas.shape == (32, 64, 3)


def test_simple_profiler():
    p = profiler.SimpleProfiler(sync_device=False)
    with p.scope("a"):
        sum(range(1000))
    with p.scope("a"):
        pass
    s = p.summary()
    assert "| a | 2 |" in s


def test_advanced_profiler():
    p = profiler.AdvancedProfiler(top=5)
    with p.scope("work"):
        sum(range(10000))
    s = p.summary()
    assert "Profile of scope 'work'" in s
    assert "cumulative" in s


def test_evaluate_poses(rng):
    from scipy.spatial.transform import Rotation

    F = 10
    gt = np.tile(np.eye(4), (F, 1, 1))
    pred = gt.copy()
    for f in range(5, F):  # half the frames off by 4 deg / 4 cm
        pred[f, :3, :3] = Rotation.from_rotvec([0, 0, np.deg2rad(4)]).as_matrix()
        pred[f, 0, 3] = 0.04
    pts = rng.normal(size=(50, 3)) * 0.1
    K = np.array([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]])
    rep = evaluate_poses(pred, gt, model_points=pts, K=K)
    assert rep.aps["1cm@1degree"] == 0.5
    assert rep.aps["5cm@5degree"] == 1.0
    assert rep.n_frames == F


def test_colmap_model_roundtrip(tmp_path, rng):
    cams = {
        1: colmap_io.ColmapCamera(
            1, "PINHOLE", 640, 480, np.array([500.0, 510.0, 320.0, 240.0])
        )
    }
    imgs = {
        1: colmap_io.ColmapImage(
            1, np.array([1.0, 0, 0, 0]), np.array([0.1, 0.2, 0.3]), 1,
            "frame0.png",
            rng.uniform(0, 640, size=(5, 2)),
            np.array([1, -1, 2, -1, 3], np.int64),
        )
    }
    pts = {
        1: colmap_io.ColmapPoint3D(
            1, np.array([0.1, 0.2, 0.3]), np.array([255, 0, 0], np.uint8),
            0.5, np.array([1], np.int32), np.array([0], np.int32),
        )
    }
    colmap_io.write_model(tmp_path, cams, imgs, pts)
    c2, i2, p2 = colmap_io.read_model(tmp_path)
    np.testing.assert_allclose(c2[1].params, cams[1].params)
    np.testing.assert_allclose(c2[1].K[0, 0], 500.0)
    assert i2[1].name == "frame0.png"
    np.testing.assert_allclose(i2[1].xys, imgs[1].xys)
    np.testing.assert_array_equal(i2[1].point3D_ids, imgs[1].point3D_ids)
    np.testing.assert_allclose(p2[1].xyz, pts[1].xyz)
    assert p2[1].image_ids.tolist() == [1]


def test_export_map(tmp_path, rng):
    from onepose_st_tpu.sfm.map import SfMMap

    m = SfMMap(
        keypoints3d=rng.normal(size=(20, 3)).astype(np.float32),
        desc_coarse=np.zeros((20, 4), np.float32),
        desc_fine=np.zeros((20, 2), np.float32),
        scores=np.ones(20, np.float32),
    )
    poses = np.tile(np.array([0, 0, 0, 0, 0, 1.0], np.float32), (3, 1))
    Ks = np.tile(np.eye(3, dtype=np.float32) * 100, (3, 1, 1))
    colmap_io.export_map(tmp_path / "model", poses, Ks, (480, 640), m)
    cams, imgs, pts = colmap_io.read_model(tmp_path / "model")
    assert len(cams) == 3 and len(imgs) == 3 and len(pts) == 20


def test_ply_roundtrip(tmp_path, rng):
    from onepose_st_tpu.data import ply_io

    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.integers(0, 256, size=(50, 3)).astype(np.uint8)
    for binary in [True, False]:
        p = tmp_path / f"b{binary}.ply"
        ply_io.save_ply(p, pts, cols, binary=binary)
        pts2, cols2 = ply_io.load_ply(p)
        np.testing.assert_allclose(pts2, pts, atol=1e-5)
        np.testing.assert_array_equal(cols2, cols)
    # no colors
    p = tmp_path / "nc.ply"
    ply_io.save_ply(p, pts, binary=True)
    pts3, cols3 = ply_io.load_ply(p)
    np.testing.assert_allclose(pts3, pts, atol=1e-6)
    assert cols3 is None
    # CAD subsample
    sub = ply_io.sample_cad_points(p, n_points=20, rng=rng)
    assert sub.shape == (20, 3)


def test_partition_helpers():
    from onepose_st_tpu.parallel import partition as pt

    assert pt.chunks(list(range(10)), 3) == [[0, 1, 2], [3, 4, 5, 6], [7, 8, 9]]
    assert pt.chunks([], 4) == [[]]
    # chunk_index covers the range exactly once across parts
    got = np.concatenate([pt.chunk_index(11, 4, p) for p in range(4)])
    np.testing.assert_array_equal(got, np.arange(11))
    parts = pt.split_dict({i: i * 2 for i in range(7)}, 2)
    assert sum(len(p) for p in parts) == 7
    # single-process host_shard is identity
    assert pt.host_shard([5, 6, 7], 0, 1) == [5, 6, 7]
    assert pt.host_shard(list(range(10)), 1, 3) == [3, 4, 5, 6]
    assert pt.all_gather_host_lists([1, 2]) == [1, 2]


def test_adapt_dtypes():
    from onepose_st_tpu import config as cfg_lib

    cfg = cfg_lib.EngineConfig()
    cpu = cfg_lib.adapt_dtypes(cfg, backend="cpu")
    assert cpu.matcher.backbone.dtype == "float32"
    assert cpu.matcher.coarse.dtype == "float32"
    assert cpu.loftr.fine.dtype == "float32"
    tpu = cfg_lib.adapt_dtypes(cpu, backend="tpu")
    assert tpu.matcher.backbone.dtype == "bfloat16"
    # non-dtype fields untouched
    assert tpu.matcher.n_points == cfg.matcher.n_points
    # no-op returns an equal tree
    assert cfg_lib.adapt_dtypes(tpu, backend="tpu") == tpu


def test_model_config_roundtrip(tmp_path):
    """save_model_config/load_model_config rebuild the exact config tree
    (JSON turns tuples into lists; from_dict must coerce them back)."""
    from onepose_st_tpu import config as cfg_lib

    cfg = cfg_lib.LoFTRConfig(
        backbone=cfg_lib.BackboneConfig(initial_dim=32, block_dims=(32, 48, 64)),
        coarse=cfg_lib.TransformerConfig(d_model=64, nhead=4, layer_iter_n=2),
    )
    cfg_lib.save_model_config(tmp_path, cfg)
    loaded = cfg_lib.load_model_config(tmp_path)
    assert loaded == cfg
    assert isinstance(loaded.backbone.block_dims, tuple)
    # engine config too (nested one level deeper)
    eng = cfg_lib.replace(
        cfg_lib.EngineConfig(),
        train=cfg_lib.replace(cfg_lib.TrainConfig(), accumulate_steps=2),
    )
    cfg_lib.save_model_config(tmp_path, eng)
    assert cfg_lib.load_model_config(tmp_path) == eng
    # absent file -> None
    assert cfg_lib.load_model_config(tmp_path / "nope") is None


def test_colmap_text_model_roundtrip(tmp_path, rng):
    """Text-format model write/read matches binary exactly (repr floats)."""
    cams = {
        2: colmap_io.ColmapCamera(
            2, "SIMPLE_PINHOLE", 640, 480, np.array([500.25, 320.0, 240.0])
        )
    }
    imgs = {
        7: colmap_io.ColmapImage(
            7, np.array([0.9689124, 0.247404, 0.0, 0.0]),
            np.array([0.1, -0.2, 2.5]), 2, "seq0/frame7.png",
            rng.uniform(0, 640, size=(4, 2)),
            np.array([-1, 3, -1, 12], np.int64),
        ),
        8: colmap_io.ColmapImage(
            8, np.array([1.0, 0.0, 0.0, 0.0]), np.zeros(3), 2, "f8.png",
            np.zeros((0, 2)), np.zeros(0, np.int64),
        ),
    }
    pts = {
        3: colmap_io.ColmapPoint3D(
            3, np.array([0.015, -0.33, 1.75]), np.array([10, 200, 30], np.uint8),
            0.73, np.array([7, 8], np.int32), np.array([1, 3], np.int32),
        )
    }
    colmap_io.write_model(tmp_path, cams, imgs, pts, ext=".txt")
    assert (tmp_path / "cameras.txt").exists()
    c2, i2, p2 = colmap_io.read_model(tmp_path)  # autodetects .txt
    np.testing.assert_array_equal(c2[2].params, cams[2].params)
    assert c2[2].model == "SIMPLE_PINHOLE"
    np.testing.assert_array_equal(i2[7].qvec, imgs[7].qvec)
    np.testing.assert_array_equal(i2[7].xys, imgs[7].xys)
    np.testing.assert_array_equal(i2[7].point3D_ids, imgs[7].point3D_ids)
    assert i2[7].name == "seq0/frame7.png"
    assert len(i2[8].xys) == 0
    np.testing.assert_array_equal(p2[3].xyz, pts[3].xyz)
    np.testing.assert_array_equal(p2[3].image_ids, pts[3].image_ids)
    assert p2[3].error == 0.73


def test_tboard_event_file_format(tmp_path):
    """The dependency-free TB writer produces valid TFRecord framing with
    masked CRC32C and decodable scalar events."""
    import struct

    from onepose_st_tpu.utils import tboard

    w = tboard.SummaryWriter(tmp_path)
    w.add_scalar("train/loss", 1.5, 10)
    w.add_scalars({"a": 2.0, "b": 3.0, "skip": "str"}, 20, prefix="x/")
    w.close()
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    data = files[0].read_bytes()

    events = []
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        (hcrc,) = struct.unpack_from("<I", data, off + 8)
        assert hcrc == tboard._masked_crc(data[off:off + 8])
        payload = data[off + 12: off + 12 + length]
        (pcrc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert pcrc == tboard._masked_crc(payload)
        events.append(payload)
        off += 12 + length + 4
    assert len(events) == 4  # file_version + 3 scalars

    # first event carries file_version "brain.Event:2"
    assert b"brain.Event:2" in events[0]
    # scalar events carry their tags
    assert b"train/loss" in events[1]
    assert b"x/a" in events[2] and b"x/b" in events[3]
    # decode simple_value of the first scalar: find the 4-byte float after
    # the tag by scanning for field 2/wire 5 inside Summary.value
    tag_idx = events[1].index(b"train/loss") + len(b"train/loss")
    # next bytes: 0x15 (field 2, wire5) + float32
    assert events[1][tag_idx] == 0x15
    (val,) = struct.unpack_from("<f", events[1], tag_idx + 1)
    assert abs(val - 1.5) < 1e-6


def test_tboard_image_event(tmp_path):
    """Image summaries: PNG-encoded, decodable, RGB preserved."""
    import struct

    import cv2

    from onepose_st_tpu.utils import tboard

    img = np.zeros((8, 12, 3), np.uint8)
    img[:, :, 0] = 200  # red in RGB convention
    gray = np.linspace(0, 1, 8 * 12).reshape(8, 12).astype(np.float32)

    w = tboard.SummaryWriter(tmp_path)
    w.add_image("val/fig", img, 5)
    w.add_image("val/gray", gray, 5)
    w.close()
    data = list(tmp_path.glob("events.out.tfevents.*"))[0].read_bytes()

    events = []
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        payload = data[off + 12: off + 12 + length]
        events.append(payload)
        off += 12 + length + 4
    assert len(events) == 3  # file_version + 2 images
    assert b"val/fig" in events[1]

    # extract the embedded PNG and decode it: red must come back red
    png_magic = b"\x89PNG"
    start = events[1].find(png_magic)
    assert start > 0
    decoded = cv2.imdecode(
        np.frombuffer(events[1][start:], np.uint8), cv2.IMREAD_COLOR
    )  # BGR
    assert decoded.shape == (8, 12, 3)
    assert decoded[0, 0, 2] == 200 and decoded[0, 0, 0] == 0

    # grayscale float input: single-channel PNG, scaled to uint8
    start = events[2].find(png_magic)
    g = cv2.imdecode(
        np.frombuffer(events[2][start:], np.uint8), cv2.IMREAD_UNCHANGED
    )
    assert g.shape == (8, 12)
    assert g[0, 0] == 0 and int(g[-1, -1]) == 255
