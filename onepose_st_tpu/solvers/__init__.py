from .pnp import ransac_pnp, ransac_pnp_focal, PnPResult  # noqa: F401
from .affine import ransac_affine  # noqa: F401
