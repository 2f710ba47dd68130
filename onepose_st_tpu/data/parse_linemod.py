"""LINEMOD real-data parser.

Re-design of reference parse_lm_real_data.py:32-245: converts a LINEMOD
object directory (`<id>-color.png` + `<id>-pose.txt` + `<id>-box.txt`,
`models/models_info.txt`, `models/<obj>/<obj>.ply`) into the framework's
sequence layout (`color/`, `color_full/`, `poses_ba/`, `intrin_ba/`,
`intrin/`, plus object-level `box3d_corners.txt`, `diameter.txt`,
`model_eval.ply`), with the same 30% box expansion, optional detector
noise, and the fixed LINEMOD intrinsics.
"""
from __future__ import annotations

import shutil
from pathlib import Path

import cv2
import numpy as np

from . import images as img_ops

LM_ID2NAME = {
    1: "ape", 2: "benchvise", 4: "camera", 5: "can", 6: "cat",
    8: "driller", 9: "duck", 10: "eggbox", 11: "glue", 12: "holepuncher",
    13: "iron", 14: "lamp", 15: "phone",
}

# the fixed LINEMOD camera (reference parse_lm_real_data.py:164)
LM_K = np.array(
    [[572.4114, 0, 325.2611], [0, 573.57043, 242.04899], [0, 0, 1]]
)

# corner ordering of the reference's canonical box (parse_lm_real_data.py:139-145)
_CORNER_SIGNS = np.array(
    [
        [-1, -1, -1], [-1, -1, 1], [-1, 1, 1], [-1, 1, -1],
        [1, -1, -1], [1, -1, 1], [1, 1, 1], [1, 1, -1],
    ],
    np.float64,
)


def parse_models_info(path: Path) -> dict[int, dict[str, float]]:
    """models_info.txt rows: `<id> key val key val ...`."""
    out = {}
    for line in Path(path).read_text().splitlines():
        parts = line.split()
        if not parts:
            continue
        obj_id = int(parts[0])
        out[obj_id] = {
            parts[i]: float(parts[i + 1]) for i in range(1, len(parts), 2)
        }
    return out


def box3d_corners_from_info(info: dict[str, float]) -> np.ndarray:
    """[8, 3] canonical box corners in meters (reference :120-145)."""
    size = np.array([info["size_x"], info["size_y"], info["size_z"]]) / 1000.0
    return _CORNER_SIGNS * (size[None] * 0.5)


def _crop_to(image, box, out_hw):
    """Reference's two-stage crop: tight box then resize to out_hw."""
    x0, y0, x1, y1 = box
    crop1, A1 = img_ops.crop_image(
        image, np.asarray([x0, y0, x1, y1], np.float64),
        (int(y1 - y0), int(x1 - x0)),
    )
    crop2, A2 = img_ops.crop_image(
        crop1, np.asarray([0, 0, x1 - x0, y1 - y0], np.float64), out_hw
    )
    return crop2, A2 @ A1


def parse_linemod_split(
    data_base_dir: str | Path,
    obj_id: int,
    out_dir: str | Path,
    split: str = "train",
    onepose_id: str = "0801",
    add_detector_noise: bool = False,
    crop_size: int = 256,
    rng: np.random.Generator | None = None,
) -> Path:
    """Parse one object's train/val split. Returns the sequence directory."""
    base = Path(data_base_dir)
    obj_name = LM_ID2NAME[obj_id]
    seq_src = base / ("real_train" if split == "train" else "real_test") / obj_name
    if not seq_src.is_dir():
        raise FileNotFoundError(seq_src)

    obj_full = f"{onepose_id}-lm{obj_id}-others"
    # seq 1 = mapping data, 2 = test, 3 = test with noisy/detected boxes
    seq_label = ("1" if split == "train" else "2") if not add_detector_noise else "3"
    seq_dir = Path(out_dir) / obj_full / f"lm{obj_id}-{seq_label}"
    if seq_dir.exists():
        shutil.rmtree(seq_dir)
    for sub in ["color", "color_full", "intrin_ba", "intrin", "poses_ba"]:
        (seq_dir / sub).mkdir(parents=True, exist_ok=True)

    info = parse_models_info(base / "models" / "models_info.txt")[obj_id]
    if split == "train":
        np.savetxt(
            seq_dir.parent / "box3d_corners.txt", box3d_corners_from_info(info)
        )
        np.savetxt(
            seq_dir.parent / "diameter.txt",
            np.array([info["diameter"] / 1000.0]),
        )
        model_ply = base / "models" / obj_name / f"{obj_name}.ply"
        if model_ply.exists():
            shutil.copyfile(model_ply, seq_dir.parent / "model_eval.ply")

    rng = rng or np.random.default_rng(0)
    rgb_paths = sorted(seq_src.glob("*-color.png"))
    for global_id, img_path in enumerate(rgb_paths):
        frame_id = img_path.name.split("-")[0]
        pose = np.loadtxt(seq_src / f"{frame_id}-pose.txt")
        image = cv2.imread(str(img_path))
        x0, y0, w, h = np.loadtxt(seq_src / f"{frame_id}-box.txt").astype(int).tolist()
        x1, y1 = x0 + w, y0 + h

        compact = 0.3
        x0 -= int(w * compact); y0 -= int(h * compact)
        x1 += int(w * compact); y1 += int(h * compact)
        if add_detector_noise:
            off = float(rng.uniform(-compact, compact))
            x0 += int(w * off); y0 += int(h * off)
            x1 += int(w * off); y1 += int(h * off)

        gray = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY).astype(np.float32)
        crop, A = _crop_to(gray, (x0, y0, x1, y1), (crop_size, crop_size))
        K_crop = A @ LM_K

        cv2.imwrite(
            str(seq_dir / "color" / f"{global_id}.png"),
            crop.clip(0, 255).astype(np.uint8),
        )
        cv2.imwrite(str(seq_dir / "color_full" / f"{global_id}.png"), image)
        np.savetxt(seq_dir / "intrin_ba" / f"{global_id}.txt", K_crop)
        # full-image K, kept for the Proj2D metric (reference note :243)
        np.savetxt(seq_dir / "intrin" / f"{global_id}.txt", LM_K)
        T = np.eye(4)
        T[:3] = pose[:3] if pose.shape == (4, 4) else pose
        np.savetxt(seq_dir / "poses_ba" / f"{global_id}.txt", T)
    return seq_dir
