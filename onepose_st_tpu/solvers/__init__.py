from .pnp import (  # noqa: F401
    PnPResult, joint_focal_refine, ransac_pnp, ransac_pnp_focal,
)
from .affine import ransac_affine  # noqa: F401
