"""Visualization: 3D-box reprojection overlays and demo videos.

Host-side equivalent of reference src/utils/vis_utils.py:12-222 (`reproj`,
`draw_3d_box`, `save_demo_image`, `make_video`). Videos are written with
imageio instead of shelling out to ffmpeg.
"""
from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

# 3D box wireframe edges over the corner ordering of
# data.parse_arkit.CORNER_SIGNS
BOX_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def reproject_corners(
    corners3d: np.ndarray, T44: np.ndarray, K: np.ndarray
) -> np.ndarray:
    """[8, 3] corners + 4x4 world->cam + K -> [8, 2] pixels."""
    p = corners3d @ T44[:3, :3].T + T44[:3, 3]
    uvz = p @ K.T
    return uvz[:, :2] / np.clip(uvz[:, 2:], 1e-9, None)


def draw_3d_box(
    image: np.ndarray,
    corners2d: np.ndarray,
    color=(0, 255, 0),
    thickness: int = 2,
) -> np.ndarray:
    """Draw the projected wireframe box. Accepts gray [0,1] or BGR uint8."""
    if image.ndim == 2:
        img = cv2.cvtColor(
            (np.clip(image, 0, 1) * 255).astype(np.uint8), cv2.COLOR_GRAY2BGR
        )
    else:
        img = image.copy()
    pts = corners2d.astype(int)
    for a, b in BOX_EDGES:
        cv2.line(img, tuple(pts[a]), tuple(pts[b]), color, thickness)
    return img


def save_demo_image(
    image: np.ndarray,
    corners3d: np.ndarray,
    T44: np.ndarray,
    K: np.ndarray,
    path: str | Path | None = None,
    color=(0, 255, 0),
) -> np.ndarray:
    uv = reproject_corners(corners3d, T44, K)
    img = draw_3d_box(image, uv, color=color)
    if path is not None:
        cv2.imwrite(str(path), img)
    return img


def make_video(frames: list[np.ndarray] | np.ndarray, path: str | Path, fps: int = 15):
    """Write BGR/gray frames to a video file (imageio/ffmpeg backend)."""
    import imageio.v2 as imageio

    with imageio.get_writer(str(path), fps=fps) as w:
        for f in frames:
            if f.ndim == 2:
                f = (np.clip(f, 0, 1) * 255).astype(np.uint8)
            elif f.dtype != np.uint8:
                f = np.clip(f, 0, 255).astype(np.uint8)
            if f.ndim == 3:
                f = f[..., ::-1]  # BGR -> RGB
            w.append_data(f)


def plot_matches(
    img0: np.ndarray,
    img1: np.ndarray,
    uv0: np.ndarray,
    uv1: np.ndarray,
    mask: np.ndarray | None = None,
    max_draw: int = 200,
) -> np.ndarray:
    """Side-by-side match visualization (reference plot_utils.py:356-457)."""
    def to_bgr(im):
        if im.ndim == 2:
            return cv2.cvtColor(
                (np.clip(im, 0, 1) * 255).astype(np.uint8), cv2.COLOR_GRAY2BGR
            )
        return im

    a, b = to_bgr(img0), to_bgr(img1)
    H = max(a.shape[0], b.shape[0])
    canvas = np.zeros((H, a.shape[1] + b.shape[1], 3), np.uint8)
    canvas[: a.shape[0], : a.shape[1]] = a
    canvas[: b.shape[0], a.shape[1] :] = b
    idx = np.arange(len(uv0))
    if mask is not None:
        idx = idx[mask]
    for k in idx[:max_draw]:
        p0 = tuple(np.round(uv0[k]).astype(int))
        p1 = tuple(np.round(uv1[k]).astype(int) + np.array([a.shape[1], 0]))
        cv2.line(canvas, p0, p1, (0, 200, 0), 1)
        cv2.circle(canvas, p0, 2, (0, 0, 255), -1)
        cv2.circle(canvas, p1, 2, (0, 0, 255), -1)
    return canvas
