"""Utilities: perf instrumentation, program introspection, system info."""

from .trace import (  # noqa: F401
    PerfCounters,
    dump_program,
    op_timer,
    perf_counters,
    system_info,
)
