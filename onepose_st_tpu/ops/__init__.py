from . import attention, matching, windows  # noqa: F401
