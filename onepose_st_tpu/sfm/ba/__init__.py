from .depth_ba import DepthBAProblem, solve_depth_ba  # noqa: F401
from .bundle import BundleProblem, solve_bundle  # noqa: F401
