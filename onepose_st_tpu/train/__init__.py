from . import losses, supervision, step  # noqa: F401
