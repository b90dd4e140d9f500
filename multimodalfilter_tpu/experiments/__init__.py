from .buddy import Buddy  # noqa: F401
from .logging import MetricLogger  # noqa: F401
