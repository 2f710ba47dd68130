from . import so3, camera, metrics  # noqa: F401
