"""Host-side image IO and warping (cv2), feeding the device pipeline.

Keeps the reference's data contract: grayscale [0,1], crops warped with the
same affine convention as core.camera.crop_affine so intrinsics updates and
pixel warps agree (reference src/utils/data_utils.py get_image_crop_resize).
"""
from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np


def read_gray(path: str | Path, resize_div: int | None = None) -> np.ndarray:
    """Read image as float32 grayscale in [0,1]; optionally crop H,W to a
    multiple of `resize_div` (reference divisor-8 resize for LoFTR)."""
    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    out = img.astype(np.float32) / 255.0
    if resize_div:
        h, w = out.shape
        h2, w2 = h - h % resize_div, w - w % resize_div
        out = out[:h2, :w2]
    return out


def crop_image(
    image: np.ndarray, box: np.ndarray, out_hw: tuple[int, int]
) -> tuple[np.ndarray, np.ndarray]:
    """Warp the `box` (x0, y0, x1, y1) region to out_hw.

    Returns (crop, affine3x3) with the affine matching
    core.camera.crop_affine (full-image px -> crop px).
    """
    x0, y0, x1, y1 = [float(v) for v in box]
    H, W = out_hw
    scale = W / (x1 - x0)
    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
    A = np.array(
        [[scale, 0, W / 2 - scale * cx], [0, scale, H / 2 - scale * cy]],
        np.float32,
    )
    crop = cv2.warpAffine(image, A, (W, H), flags=cv2.INTER_LINEAR)
    A3 = np.concatenate([A, [[0, 0, 1]]], axis=0).astype(np.float32)
    return crop, A3


def warp_points_h(A3: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Apply homogeneous 3x3 (affine) to [..., 2] points (host numpy)."""
    return uv @ A3[:2, :2].T + A3[:2, 2]


def invert_affine(A3: np.ndarray) -> np.ndarray:
    return np.linalg.inv(A3).astype(np.float32)


def valid_quad_from_affine(
    A3: np.ndarray, frame_hw: tuple[int, int]
) -> np.ndarray:
    """[4, 2] quad (crop px, CCW) of the crop region backed by real source
    pixels: the image of the source-frame rectangle under the crop affine.
    Crop pixels outside this quad are warp fill (black), not content."""
    H, W = frame_hw
    corners = np.array(
        [[0.0, 0.0], [W, 0.0], [W, H], [0.0, H]], np.float32
    )
    return warp_points_h(A3, corners).astype(np.float32)


def cell_mask_from_quad(
    quad: np.ndarray,
    crop_hw: tuple[int, int],
    stride: int,
    shrink_px: float | None = None,
) -> np.ndarray:
    """[Hc*Wc] bool: which stride-cells of a crop lie inside a convex quad.

    A cell is valid when its CENTER sits inside the quad shrunk inward by
    `shrink_px` (default stride/2 — i.e. the whole cell is inside for
    axis-aligned quads). Used as the matcher's `img_mask`: cells outside
    the valid quad are black warp-fill and must not vote or match.
    """
    Hc_px, Wc_px = crop_hw
    Hc, Wc = Hc_px // stride, Wc_px // stride
    if shrink_px is None:
        shrink_px = stride / 2.0
    ys, xs = np.mgrid[0:Hc, 0:Wc]
    centers = np.stack(
        [(xs + 0.5) * stride, (ys + 0.5) * stride], axis=-1
    ).reshape(-1, 2)
    quad = np.asarray(quad, np.float64)
    # signed distance to each edge of the convex quad (CCW -> inside is
    # left of every edge); works for CW quads too via orientation sign
    area2 = 0.0
    for i in range(4):
        a, b = quad[i], quad[(i + 1) % 4]
        area2 += a[0] * b[1] - b[0] * a[1]
    orient = 1.0 if area2 >= 0 else -1.0
    ok = np.ones(len(centers), bool)
    for i in range(4):
        a, b = quad[i], quad[(i + 1) % 4]
        e = b - a
        n = np.linalg.norm(e) + 1e-12
        cross = (e[0] * (centers[:, 1] - a[1]) - e[1] * (centers[:, 0] - a[0]))
        ok &= orient * cross / n >= shrink_px
    return ok


def valid_cell_mask(
    A3: np.ndarray,
    frame_hw: tuple[int, int],
    crop_hw: tuple[int, int],
    stride: int,
) -> np.ndarray:
    """[Hc*Wc] bool visibility mask of a crop produced by `crop_image`."""
    return cell_mask_from_quad(
        valid_quad_from_affine(A3, frame_hw), crop_hw, stride
    )
