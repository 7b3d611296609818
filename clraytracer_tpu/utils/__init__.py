"""Foundation utilities: pytree dataclasses, logging, timing, profiling.

TPU-native replacement for the reference's foundation layer
(Common.hpp / Logger.cpp / Timer.hpp): instead of custom containers and SSE
helpers we lean on numpy/JAX; what remains is structured logging, scope
timers, and pytree plumbing.
"""

from clraytracer_tpu.utils.pytree import pytree_dataclass, static_field  # noqa: F401
from clraytracer_tpu.utils.logging import get_logger, log_error, log_info, log_warning  # noqa: F401
from clraytracer_tpu.utils.timer import ScopeTimer, timed  # noqa: F401
