"""Tracing / profiling / introspection — the GGML_PERF + graph-dump analog.

The reference accumulates per-tensor `perf_runs/perf_cycles/perf_time_us`
under GGML_PERF (ggml.c:100,384-393,9473-9616), prints per-op totals with
`ggml_graph_print`, exports Graphviz via `ggml_graph_dump_dot`
(ggml.h:664-667), and reports CPU capabilities (`ggml_cpu_has_*`,
ggml.h:779-790) through llama_print_system_info (llama.cpp:1829-1847).

TPU equivalents:
  * PerfCounters / op_timer  — named wall-clock accumulators with a
    ggml_graph_print-style dump (device work is async; timers wrap
    block_until_ready'd regions, which is the meaningful unit under jit).
  * dump_program             — writes the StableHLO and optimized HLO of a
    jitted function (the ggml_graph_dump_dot analog; XLA's HLO is the graph).
  * system_info              — platform/device/feature one-liner.

For hardware-level tracing, `jax.profiler.trace` captures a full XLA/TPU
timeline viewable in XProf/TensorBoard — `trace_region` wraps it.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class _OpStat:
    runs: int = 0
    total_us: float = 0.0


@dataclass
class PerfCounters:
    """Named wall-clock accumulators (the per-op GGML_PERF counter analog)."""

    stats: dict[str, _OpStat] = field(default_factory=dict)

    @contextlib.contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) * 1e6
            st = self.stats.setdefault(name, _OpStat())
            st.runs += 1
            st.total_us += dt

    def add(self, name: str, us: float, runs: int = 1) -> None:
        st = self.stats.setdefault(name, _OpStat())
        st.runs += runs
        st.total_us += us

    def report(self) -> str:
        """ggml_graph_print-style per-op dump."""
        lines = ["perf_total_per_op_us:"]
        for name, st in sorted(self.stats.items(), key=lambda kv: -kv[1].total_us):
            avg = st.total_us / max(st.runs, 1)
            lines.append(
                f"  {name:24s} runs={st.runs:6d} total={st.total_us/1e3:10.2f} ms"
                f" avg={avg:10.1f} us"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self.stats.clear()


_global_counters = PerfCounters()


def perf_counters() -> PerfCounters:
    """Process-global counter registry (the 'perf' singleton)."""
    return _global_counters


@contextlib.contextmanager
def op_timer(name: str):
    """Time a region into the global registry."""
    with _global_counters.timer(name):
        yield


def dump_program(fn, *args, path: str | None = None, optimized: bool = False, **kw) -> str:
    """Export a jittable function's program text (ggml_graph_dump_dot analog).

    Returns StableHLO by default; `optimized=True` compiles and returns the
    post-XLA-optimization HLO (fusion decisions, layouts, memory — the graph
    that actually executes). Writes to `path` when given.
    """
    import jax

    lowered = jax.jit(fn).lower(*args, **kw)
    text = lowered.compile().as_text() if optimized else lowered.as_text()
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


@contextlib.contextmanager
def trace_region(logdir: str):
    """Capture a hardware profile (XLA/TPU timeline) for the enclosed region."""
    import jax

    with jax.profiler.trace(logdir):
        yield


def system_info() -> str:
    """Capability one-liner (llama_print_system_info / ggml_cpu_has_* analog)."""
    import jax

    from .. import native

    devs = jax.devices()
    parts = [
        f"jax = {jax.__version__}",
        f"platform = {devs[0].platform}",
        f"devices = {len(devs)} x {devs[0].device_kind}",
        f"native = {1 if native.available() else 0}",
    ]
    try:
        from jax.experimental import pallas  # noqa: F401

        parts.append("pallas = 1")
    except ImportError:
        parts.append("pallas = 0")
    import numpy as np

    parts.append(f"numpy = {np.__version__}")
    return " | ".join(parts)
