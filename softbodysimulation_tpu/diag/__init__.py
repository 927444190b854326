from .diagnostics import diagnostics, format_diagnostics
from .health import FailsafeStepper, scrub
from .profiling import StepTimer, measure_throughput, trace
