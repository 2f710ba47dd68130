from . import losses, supervision, step  # noqa: F401
from . import tracker_data, tracker_train  # noqa: F401
