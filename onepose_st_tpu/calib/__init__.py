"""Deep single-image calibration (TPU-native).

Re-design of the reference's vendored DeepSingleImageCalibration
(src/utils/calib/, ~3.4 kLoC; consumed via data_utils.infer_K at
inference.py:123 when no intrinsics file exists): a DenseNet classifier
over 256 bins per quantity (roll, rho, vertical FoV, k1_hat), decoded to a
pinhole K per frame and averaged over the clip.
"""
from .calibrate import CalibrationResult, calibrate_image, decode_bins, infer_K
from .layercam import layercam
from .model import CalibNet

__all__ = [
    "CalibNet",
    "CalibrationResult",
    "calibrate_image",
    "decode_bins",
    "infer_K",
    "layercam",
]
