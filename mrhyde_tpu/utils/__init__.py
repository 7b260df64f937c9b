from mrhyde_tpu.utils.profiling import timed, timer_report  # noqa: F401
from mrhyde_tpu.utils.debugger import Debugger  # noqa: F401
