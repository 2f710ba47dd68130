"""LINEMOD parser on a synthetic LINEMOD-format directory."""
import numpy as np
import cv2

from onepose_st_tpu.data import parse_linemod as plm
from onepose_st_tpu.data.parse_arkit import load_sequence


def make_linemod_dir(root, rng, obj_id=1, n_frames=4):
    obj = plm.LM_ID2NAME[obj_id]
    for split in ["real_train", "real_test"]:
        d = root / split / obj
        d.mkdir(parents=True)
        for i in range(n_frames):
            fid = f"{i:04d}"
            img = (rng.uniform(0, 255, size=(480, 640, 3))).astype(np.uint8)
            cv2.imwrite(str(d / f"{fid}-color.png"), img)
            T = np.eye(4)
            T[2, 3] = 1.0 + 0.1 * i
            np.savetxt(d / f"{fid}-pose.txt", T[:3])
            np.savetxt(d / f"{fid}-box.txt", np.array([200, 150, 120, 100]))
    models = root / "models" / obj
    models.mkdir(parents=True)
    (models / f"{obj}.ply").write_text("ply\nend_header\n")
    (root / "models" / "models_info.txt").write_text(
        f"{obj_id} diameter 102.09 min_x -37.9 min_y -38.7 min_z -45.8 "
        "size_x 75.8 size_y 77.4 size_z 91.6\n"
    )


def test_parse_linemod_train(tmp_path, rng):
    make_linemod_dir(tmp_path, rng)
    seq = plm.parse_linemod_split(tmp_path, 1, tmp_path / "out", split="train")
    assert seq.name == "lm1-1"
    # object-level artifacts
    corners = np.loadtxt(seq.parent / "box3d_corners.txt")
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(
        corners.max(0) - corners.min(0), [0.0758, 0.0774, 0.0916], atol=1e-6
    )
    diam = np.loadtxt(seq.parent / "diameter.txt")
    assert abs(diam - 0.10209) < 1e-9
    assert (seq.parent / "model_eval.ply").exists()
    # per-frame artifacts round-trip through the standard loader
    data = load_sequence(seq)
    assert len(data.images) == 4
    assert data.images.shape[1:] == (256, 256)
    K = data.Ks[0]
    assert K[0, 0] > 0 and K[1, 1] > 0
    T = data.poses[0]
    assert np.isfinite(T).all()


def test_parse_linemod_crop_K_consistency(tmp_path, rng):
    """A 3D point projected with K_crop lands where the crop warp puts it."""
    make_linemod_dir(tmp_path, rng)
    seq = plm.parse_linemod_split(tmp_path, 1, tmp_path / "out", split="train")
    K_crop = np.loadtxt(seq / "intrin_ba" / "0.txt")
    K_full = np.loadtxt(seq / "intrin" / "0.txt")
    np.testing.assert_allclose(K_full, plm.LM_K)
    # box center in full image: (200+60, 150+50); expanded box is centred
    # there too, so it must map to the crop center
    A = K_crop @ np.linalg.inv(K_full)   # full px -> crop px (affine in K)
    x0, y0, w, h = 200, 150, 120, 100
    cx, cy = x0 + w / 2 - 36 + (120 * 0.3), y0 + h / 2 - 30 + (100 * 0.3)
    uv_full = np.array([320.0 + 5.2611, 240.0 + 2.04899, 1.0])  # principal pt
    uv_crop = A @ uv_full
    assert 0 <= uv_crop[0] and 0 <= uv_crop[1]


def test_parse_linemod_noise_split(tmp_path, rng):
    make_linemod_dir(tmp_path, rng)
    seq = plm.parse_linemod_split(
        tmp_path, 1, tmp_path / "out", split="val", add_detector_noise=True,
        rng=rng,
    )
    assert seq.name == "lm1-3"
    data = load_sequence(seq)
    assert len(data.images) == 4
