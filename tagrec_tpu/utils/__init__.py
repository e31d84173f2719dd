from tagrec_tpu.utils.logging import MetricsWriter, printc
from tagrec_tpu.utils.profiling import StepTimer, trace, start_trace, stop_trace

__all__ = ["MetricsWriter", "printc", "StepTimer", "trace", "start_trace",
           "stop_trace"]
