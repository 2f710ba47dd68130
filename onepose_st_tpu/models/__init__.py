from .backbone import ResNetFPN  # noqa: F401
from .transformer import LocalFeatureTransformer  # noqa: F401
from .matcher2d3d import OnePoseMatcher  # noqa: F401
from .loftr import LoFTRMatcher  # noqa: F401
from .tracker import CoTrackerNet, TrackerEncoder  # noqa: F401
