"""General utilities (logging, profiling, seeding, misc)."""

from .general import check_objects_in_frame, inverse_sigmoid, safe_state  # noqa: F401
from .logging import MetricsLogger, StepTimer  # noqa: F401
from . import debug  # noqa: F401
