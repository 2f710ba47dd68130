from .pnp import ransac_pnp, PnPResult  # noqa: F401
from .affine import ransac_affine  # noqa: F401
