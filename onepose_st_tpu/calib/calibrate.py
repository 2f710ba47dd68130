"""Bin decoding, distortion handling and per-clip K inference.

Numerical semantics follow reference calib/demo.py:62-119 (bin center
tables, vFoV -> fy conversion, rho scaling, k1_hat -> k1) and
data_utils.py:293-330 (`_get_K` / `infer_K` clip averaging). The radial
distortion adjustment that the reference delegates to pycolmap's RADIAL
camera (demo.py:23-46) is implemented directly (Newton undistort).
"""
from __future__ import annotations

import dataclasses
import math

import numpy as np

NUM_BINS_DEFAULT = 256

# per-model jitted apply (see calibrate_image)
_APPLY_CACHE: dict[int, object] = {}


def bin_centers(num_bins: int = NUM_BINS_DEFAULT) -> dict[str, np.ndarray]:
    """Bin-center tables (reference demo.py:69-77, densenet.py:42-58)."""
    n = num_bins
    return {
        "roll": np.linspace(-45.0, 45.0 + 90.0 / (n - 1), n + 1),
        "rho": np.linspace(-1.0, 1.0 + 2.0 / (n - 1), n + 1),
        "vfov": np.linspace(20.0, 105.0 + 85.0 / (n - 1), n + 1),
        "k1_hat": np.linspace(-0.45, 0.0 + 0.45 / (n - 1), n + 1),
    }


def bin_edges(num_bins: int = NUM_BINS_DEFAULT) -> dict[str, np.ndarray]:
    """Bucket edges for training targets (reference densenet.py:44-58)."""
    out = {}
    for k, c in bin_centers(num_bins).items():
        out[k] = c - (c[1] - c[0]) / 2.0
    return out


def values_to_bins(name: str, values, num_bins: int = NUM_BINS_DEFAULT):
    """GT value -> class index (reference torch.bucketize(gt, edges) - 1)."""
    edges = bin_edges(num_bins)[name]
    idx = np.searchsorted(edges, np.asarray(values), side="right") - 1
    return np.clip(idx, 0, num_bins - 1)


@dataclasses.dataclass
class CalibrationResult:
    roll: float          # degrees
    rho: float           # normalized principal-axis offset
    vertical_fov: float  # degrees
    focal_length_pixels: float
    pitch: float         # radians
    height: int
    width: int
    k1: float | None = None

    @property
    def K(self) -> np.ndarray:
        """Pinhole K (reference data_utils._get_K:293-311: fx from the
        predicted focal, fy re-derived from the vFoV, center at w/2, h/2)."""
        fy = self.height / (2 * math.tan(math.radians(self.vertical_fov / 2)))
        return np.array(
            [
                [self.focal_length_pixels, 0.0, self.width / 2],
                [0.0, fy, self.height / 2],
                [0.0, 0.0, 1.0],
            ]
        )


def _radial_undistort_y(y_dist: float, k1: float, iters: int = 25) -> float:
    """Invert y_d = y (1 + k1 y^2) for the normalized on-axis point (Newton).

    Replaces pycolmap's RADIAL image_to_world in demo.adjust_rho_distortion
    (demo.py:23-46) for points on the vertical axis through the center.
    """
    y = y_dist
    for _ in range(iters):
        f = y * (1 + k1 * y * y) - y_dist
        df = 1 + 3 * k1 * y * y
        if abs(df) < 1e-12:
            break
        y -= f / df
    return y


def adjust_rho_distortion(rho: float, fy_px: float, k1: float, w: int, h: int) -> float:
    """Map rho measured in the distorted image to the undistorted image."""
    y_dist = (rho * h) / fy_px  # normalized camera y of the distorted point
    y_undist = _radial_undistort_y(y_dist, k1)
    # tau = (reprojected_y - cy)/h with reprojected_y = cy + fy * y_undist
    return (y_undist * fy_px) / h


def decode_bins(
    log_probs: dict[str, np.ndarray],
    height: int,
    width: int,
    force_pinhole: bool = True,
    num_bins: int | None = None,
) -> CalibrationResult:
    """argmax over bins -> physical quantities (reference demo.py:66-106)."""
    num_bins = num_bins or log_probs["roll"].shape[-1]
    centers = bin_centers(num_bins)
    pick = {k: int(np.argmax(np.asarray(v).reshape(-1))) for k, v in log_probs.items()}
    roll = float(centers["roll"][pick["roll"]])
    rho = float(centers["rho"][pick["rho"]]) * 0.35
    vfov = float(centers["vfov"][pick["vfov"]])
    fy_px = height / 2 / math.tan(math.radians(vfov) / 2)

    k1 = None
    if not force_pinhole and "k1_hat" in pick:
        k1_hat = float(centers["k1_hat"][pick["k1_hat"]])
        k1 = k1_hat * (fy_px / height) ** 2
        rho = adjust_rho_distortion(rho, fy_px, k1, width, height)
    pitch = math.atan(rho * height / fy_px)
    return CalibrationResult(
        roll=roll, rho=rho, vertical_fov=vfov, focal_length_pixels=fy_px,
        pitch=pitch, height=height, width=width, k1=k1,
    )


def calibrate_image(
    model, variables, image: np.ndarray, force_pinhole: bool = True
) -> CalibrationResult:
    """Calibrate one RGB uint8/float image [H, W, 3]."""
    import cv2
    import jax
    import jax.numpy as jnp

    h, w = image.shape[:2]
    size = model.cfg.image_size
    img = cv2.resize(
        np.asarray(image), (size, size), interpolation=cv2.INTER_AREA
    ).astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    # cache the jitted apply per model so a clip of N frames compiles once
    fn = _APPLY_CACHE.get(id(model))
    if fn is None:
        fn = jax.jit(model.apply)
        _APPLY_CACHE[id(model)] = fn
    pred = fn(variables, jnp.asarray(img[None]))
    return decode_bins(
        {k: np.asarray(v)[0] for k, v in pred.items()}, h, w,
        force_pinhole=force_pinhole,
    )


def infer_K(model, variables, frames) -> np.ndarray:
    """Average per-frame K over a clip (reference data_utils.infer_K:313-330).

    `frames`: iterable of RGB images, or a directory of image files.
    """
    from pathlib import Path

    if isinstance(frames, (str, Path)):
        import cv2

        paths = sorted(Path(frames).iterdir())
        frames = (cv2.imread(str(p))[..., ::-1] for p in paths)
    Ks = [calibrate_image(model, variables, f).K for f in frames]
    if not Ks:
        raise ValueError("no frames to calibrate")
    return np.mean(np.stack(Ks), axis=0)
