from .detector import ObjectDetector, DetectorDB  # noqa: F401
from .pipeline import PoseEstimator, FrameResult  # noqa: F401
from .tracker import TemporalTracker, LearnedTemporalTracker, refine_sequence  # noqa: F401
