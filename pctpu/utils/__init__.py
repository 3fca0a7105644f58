from pctpu.utils import viz  # noqa: F401
from pctpu.utils.profiling import sync, time_fn, profiler_trace, Timer  # noqa: F401
