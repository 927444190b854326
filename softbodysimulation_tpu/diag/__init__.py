from .diagnostics import diagnostics, format_diagnostics
from .profiling import StepTimer, measure_throughput, trace
