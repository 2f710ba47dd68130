"""Training-time image augmentation.

Re-designs two reference pieces:
  * SAP homography sampling (src/utils/sample_homo.py:1-59, used by
    OnePosePlus_dataset.py:341-437 "homo warp adaptation"): similarity *
    affinity * perspective decomposition in normalized image coords.
    Ours folds the sampled H into the batch intrinsics (K' = H @ K — valid
    because core.camera.project divides by the full third homogeneous
    coordinate), so GT supervision needs no special handling.
  * photometric augmentation (src/utils/utils_phoaug.py albumentations
    chains): grayscale-appropriate subset (brightness/contrast, gamma,
    gaussian + motion blur) in plain numpy/cv2 — no albumentations dep.
"""
from __future__ import annotations

import math

import cv2
import numpy as np


def similarity_mat(angle_deg: float, tx: float, ty: float, s: float) -> np.ndarray:
    th = math.radians(angle_deg)
    return np.array(
        [
            [s * math.cos(th), -s * math.sin(th), tx],
            [s * math.sin(th), s * math.cos(th), ty],
            [0, 0, 1],
        ]
    )


def affinity_mat(k0: float, k1: float) -> np.ndarray:
    return np.array([[k0, k1, 0], [0, 1 / k0, 0], [0, 0, 1]])


def perspective_mat(v0: float, v1: float) -> np.ndarray:
    return np.array([[1, 0, 0], [0, 1, 0], [v0, v1, 1]])


def compute_homography_sap(
    h: int, w: int, angle: float = 0, tx: float = 0, ty: float = 0,
    scale: float = 1, k0: float = 1, k1: float = 0, v0: float = 0, v1: float = 0,
) -> np.ndarray:
    """Similarity-Affinity-Perspective homography about the image center."""
    max_size = max(w / 2, h / 2)
    M_norm = similarity_mat(0, 0, 0, 1 / max_size) @ similarity_mat(0, -w / 2, -h / 2, 1)
    M_denorm = similarity_mat(0, w / 2, h / 2, 1) @ similarity_mat(0, 0, 0, max_size)
    H = M_denorm @ similarity_mat(angle, tx, ty, scale) \
        @ affinity_mat(k0, k1) @ perspective_mat(v0, v1) @ M_norm
    return H


def sample_homography_sap(
    rng: np.random.Generator, h: int, w: int,
    max_angle: float = 180.0, translation: float = 0.25,
    scale_range: tuple[float, float] = (0.25, 1.0),
    k1_range: float = 0.1, perspective: float = 0.5,
) -> np.ndarray:
    """Sample an SAP homography (reference sample_homography_sap ranges)."""
    return compute_homography_sap(
        h, w,
        angle=rng.uniform(-max_angle, max_angle),
        tx=rng.uniform(-translation, translation),
        ty=rng.uniform(-translation, translation),
        scale=rng.uniform(*scale_range),
        k0=1.0,
        k1=rng.uniform(-k1_range, k1_range),
        v0=rng.uniform(-perspective, perspective),
        v1=rng.uniform(-perspective, perspective),
    )


def warp_image(img: np.ndarray, H: np.ndarray) -> np.ndarray:
    """warpPerspective with the framework's convention uv' ~ H @ [u, v, 1]."""
    return cv2.warpPerspective(
        img, H.astype(np.float64), (img.shape[1], img.shape[0]),
        flags=cv2.INTER_LINEAR,
    )


class PhotometricAug:
    """Grayscale photometric chain. mode: 'dark' | 'mobile' | 'none'.

    Approximates the reference's albumentations presets (utils_phoaug.py
    darkAug / MobileAug) with numpy/cv2 primitives on [0,1] grayscale.
    """

    def __init__(self, mode: str = "dark", p: float = 0.75):
        if mode not in ("dark", "mobile", "none"):
            raise ValueError(mode)
        self.mode = mode
        self.p = p

    def __call__(self, img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if self.mode == "none" or rng.uniform() > self.p:
            return img
        x = img.astype(np.float32)
        if self.mode == "dark":
            if rng.uniform() < 0.75:  # brightness down, contrast jitter
                x = x * (1.0 + rng.uniform(-0.6, 0.0))
                mean = x.mean()
                x = (x - mean) * (1.0 + rng.uniform(-0.5, 0.3)) + mean
            if rng.uniform() < 0.1:   # blur
                k = 2 * rng.integers(1, 5) + 1
                x = cv2.GaussianBlur(x, (k, k), 0)
            if rng.uniform() < 0.2:   # motion blur
                x = _motion_blur(x, rng, max_ksize=25)
            if rng.uniform() < 0.1:   # gamma (reference limit (15, 65)/100)
                x = np.power(np.clip(x, 1e-6, 1), rng.uniform(0.15, 0.65))
        else:  # mobile
            if rng.uniform() < 0.25:
                x = _motion_blur(x, rng, max_ksize=9)
            if rng.uniform() < 0.5:   # brightness/contrast jitter
                x = x * (1.0 + rng.uniform(-0.2, 0.2)) + rng.uniform(-0.05, 0.05)
            if rng.uniform() < 0.25:  # sensor noise
                x = x + rng.normal(0, rng.uniform(0.01, 0.05), x.shape).astype(np.float32)
        return np.clip(x, 0.0, 1.0)


def _motion_blur(x: np.ndarray, rng: np.random.Generator, max_ksize: int) -> np.ndarray:
    k = int(rng.integers(3, max_ksize + 1))
    kernel = np.zeros((k, k), np.float32)
    angle = rng.uniform(0, math.pi)
    c = (k - 1) / 2
    for i in range(k):
        t = i - c
        u = int(round(c + t * math.cos(angle)))
        v = int(round(c + t * math.sin(angle)))
        if 0 <= u < k and 0 <= v < k:
            kernel[v, u] = 1.0
    kernel /= max(kernel.sum(), 1.0)
    return cv2.filter2D(x, -1, kernel)
