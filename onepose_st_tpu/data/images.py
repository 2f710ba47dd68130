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
