"""ARKit scanned-sequence parser.

Re-design of reference parse_scanned_data.py (:12-232): consumes the raw
scan (`Frames.m4v`, `ARposes.txt`, `Box.txt`, `Frames.txt`) and produces the
same on-disk layout, so data prepared for the reference drops straight into
this framework (and vice versa):

  color/<i>.png        512x512 object-centred crops
  color_full/<i>.png   full frames
  poses/<i>.txt        4x4 world->camera matrices (uv ~ K @ (T @ X))
  intrin/<i>.txt       3x3 K of the crop
  bbox/<i>.txt         object box in crop pixels
  reproj_box/<i>.txt   8x2 projected 3D box corners (full-image pixels)
  M/<i>.txt            3x3 crop->full affine
  intrinsics.txt       averaged full-image pinhole (fx/fy/cx/cy lines)
  ../box3d_corners.txt 8x3 object box corners
  intrin_ba/, poses_ba/  symlinks (pre-BA aliases, reference :219-229)

`load_sequence` reads the layout back into arrays for the SfM engine.
"""
from __future__ import annotations

import dataclasses
import os
from pathlib import Path

import cv2
import numpy as np

CORNER_SIGNS = np.array(
    [
        [-1, -1, -1], [1, -1, -1], [1, -1, 1], [-1, -1, 1],
        [-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1],
    ],
    np.float64,
)


def read_box3d(box_path: Path) -> np.ndarray:
    """Box.txt (line 2: cx,cy,cz,ex,ey,ez,...) -> [8, 3] corners.

    Corner ordering matches reference get_bbox3d (parse_scanned_data.py:61).
    """
    lines = Path(box_path).read_text().strip().splitlines()
    vals = [float(v) for v in lines[1].split(",")]
    center = np.asarray(vals[:3])
    half = np.asarray(vals[3:6]) / 2.0
    return center[None] + CORNER_SIGNS * half[None]


def read_intrinsics_txt(path: Path) -> np.ndarray:
    """intrinsics.txt ('fx: ...' lines) -> [3, 3] K."""
    vals = [float(l.split(":")[1]) for l in Path(path).read_text().splitlines()]
    fx, fy, cx, cy = vals
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)


def average_intrinsics(frames_txt: Path) -> np.ndarray:
    """Frames.txt rows '...,...,fx,fy,cx,cy' -> averaged K."""
    rows = []
    for line in Path(frames_txt).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        rows.append([float(v) for v in line.split(",")])
    fx, fy, cx, cy = np.mean(np.asarray(rows), axis=0)[2:6]
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)


def parse_arposes(pose_file: Path) -> dict[int, np.ndarray]:
    """ARposes.txt -> {frame_index: 4x4 world->cam}.

    Rows: timestamp, tx, ty, tz, r00..r22 (reference
    parse_scanned_data.py:227-245 semantics: the stored matrix projects
    world points through K).
    """
    out = {}
    idx = 0
    for line in Path(pose_file).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        vals = [float(v) for v in line.split(",")]
        t = np.asarray(vals[1:4])
        R = np.asarray(vals[4:13]).reshape(3, 3)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        out[idx] = T
        idx += 1
    return out


def _iter_frames(d: Path):
    """Yield frames from Frames.m4v, or from a Frames/ image dir (fallback
    for environments without the video codec; also convenient for tests)."""
    video = d / "Frames.m4v"
    if video.exists():
        cap = cv2.VideoCapture(str(video))
        try:
            while True:
                ret, img = cap.read()
                if not ret:
                    break
                yield img
        finally:
            cap.release()
        return
    frame_dir = d / "Frames"
    if frame_dir.is_dir():
        for p in sorted(frame_dir.glob("*.png"), key=lambda q: int(q.stem)):
            yield cv2.imread(str(p))
        return
    raise FileNotFoundError(f"no Frames.m4v or Frames/ in {d}")


def _crop_chain(image, box, hw):
    """Reference's two-stage crop: tight box -> square hw (chained affines)."""
    from . import images as img_ops

    x0, y0, x1, y1 = box
    crop1, A1 = img_ops.crop_image(image, np.asarray([x0, y0, x1, y1]), (int(y1 - y0), int(x1 - x0)))
    crop2, A2 = img_ops.crop_image(
        crop1, np.asarray([0.0, 0.0, x1 - x0, y1 - y0]), (hw, hw)
    )
    return crop2, A2 @ A1


def parse_sequence(data_dir: str | Path, downsample_rate: int = 1, hw: int = 512) -> int:
    """Parse one `-annotate` scan directory in place. Returns #frames written."""
    d = Path(data_dir)
    for sub in ["color", "color_full", "poses", "intrin", "bbox", "reproj_box", "M"]:
        (d / sub).mkdir(exist_ok=True)

    K = average_intrinsics(d / "Frames.txt")
    (d / "intrinsics.txt").write_text(
        f"fx: {K[0,0]}\nfy: {K[1,1]}\ncx: {K[0,2]}\ncy: {K[1,2]}"
    )
    corners = read_box3d(d / "Box.txt")
    np.savetxt(d.parent / "box3d_corners.txt", corners)
    poses = parse_arposes(d / "ARposes.txt")

    frames_iter = _iter_frames(d)
    n_written = 0
    index = 0
    for image in frames_iter:
        if index % downsample_rate == 0 and index in poses:
            T = poses[index]
            uvz = (corners @ T[:3, :3].T + T[:3, 3]) @ K.T
            uv = uvz[:, :2] / uvz[:, 2:]
            x0, y0 = uv.min(0)
            x1, y1 = uv.max(0)
            if x0 < -1000 or y0 < -1000 or x1 > 3000 or y1 > 3000:
                index += 1
                continue
            gray = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY) if image.ndim == 3 else image
            crop, A_full2crop = _crop_chain(
                gray.astype(np.float32), (x0, y0, x1, y1), hw
            )
            K_crop = A_full2crop @ K
            uv_crop = (uv @ A_full2crop[:2, :2].T) + A_full2crop[:2, 2]
            box_crop = np.array(
                [uv_crop[:, 0].min(), uv_crop[:, 1].min(),
                 uv_crop[:, 0].max(), uv_crop[:, 1].max()]
            )
            cv2.imwrite(str(d / "color" / f"{index}.png"), crop.clip(0, 255).astype(np.uint8))
            cv2.imwrite(str(d / "color_full" / f"{index}.png"), image)
            np.savetxt(d / "poses" / f"{index}.txt", T)
            np.savetxt(d / "intrin" / f"{index}.txt", K_crop)
            np.savetxt(d / "bbox" / f"{index}.txt", box_crop)
            np.savetxt(d / "reproj_box" / f"{index}.txt", uv)
            np.savetxt(d / "M" / f"{index}.txt", np.linalg.inv(A_full2crop))
            n_written += 1
        index += 1

    # pre-BA aliases (reference parse_scanned_data.py:219-229)
    for link, target in [("intrin_ba", "intrin"), ("poses_ba", "poses")]:
        lp = d / link
        if lp.is_symlink() or lp.exists():
            lp.unlink()
        os.symlink(target, lp)
    return n_written


@dataclasses.dataclass
class SequenceData:
    """A parsed sequence loaded back into arrays."""

    frame_ids: np.ndarray   # [F] original frame indices
    images: np.ndarray      # [F, H, W] grayscale [0,1] (crops)
    poses: np.ndarray       # [F, 6] world->cam pose6
    Ks: np.ndarray          # [F, 3, 3] crop intrinsics
    M_crop2full: np.ndarray # [F, 3, 3]
    box_corners: np.ndarray | None  # [8, 3]


def load_sequence(data_dir: str | Path, pose_dir: str = "poses_ba", intrin_dir: str = "intrin_ba") -> SequenceData:
    """Load the parsed layout (reference data drops in unchanged)."""
    from scipy.spatial.transform import Rotation

    d = Path(data_dir)
    ids = sorted(
        int(p.stem) for p in (d / "color").glob("*.png")
    )
    images, poses, Ks, Ms = [], [], [], []
    for i in ids:
        img = cv2.imread(str(d / "color" / f"{i}.png"), cv2.IMREAD_GRAYSCALE)
        images.append(img.astype(np.float32) / 255.0)
        T = np.loadtxt(d / pose_dir / f"{i}.txt")
        rv = Rotation.from_matrix(T[:3, :3]).as_rotvec()
        poses.append(np.concatenate([rv, T[:3, 3]]))
        Ks.append(np.loadtxt(d / intrin_dir / f"{i}.txt")[:3, :3])
        m = d / "M" / f"{i}.txt"
        Ms.append(np.loadtxt(m) if m.exists() else np.eye(3))
    corners_file = d.parent / "box3d_corners.txt"
    corners = np.loadtxt(corners_file) if corners_file.exists() else None
    return SequenceData(
        frame_ids=np.asarray(ids, np.int32),
        images=np.stack(images),
        poses=np.stack(poses).astype(np.float32),
        Ks=np.stack(Ks).astype(np.float32),
        M_crop2full=np.stack(Ms).astype(np.float32),
        box_corners=corners,
    )
