"""Tracing and throughput observability (SURVEY §5).

The reference's only introspection is the -v flag (dexta.c:97-100).  Here:

- ``stage(name, nbytes)``: context manager recording wall time and GB/s per
  pipeline stage, with an optional ``jax.profiler`` trace annotation;
- ``Reporter``: accumulates stage stats and renders a per-stage table;
- ``trace_to(dir)``: capture a full ``jax.profiler`` trace for TensorBoard.
"""

from __future__ import annotations

import contextlib
import sys
import time
from dataclasses import dataclass, field


@dataclass
class StageStat:
    name: str
    seconds: float = 0.0
    nbytes: int = 0
    calls: int = 0

    @property
    def gbps(self) -> float:
        return self.nbytes / self.seconds / 1e9 if self.seconds else 0.0


@dataclass
class Reporter:
    stages: dict = field(default_factory=dict)
    enabled: bool = True

    @contextlib.contextmanager
    def stage(self, name: str, nbytes: int = 0):
        if not self.enabled:
            yield
            return
        try:
            import jax.profiler
            ann = jax.profiler.TraceAnnotation(name)
        except Exception:
            ann = contextlib.nullcontext()
        t0 = time.perf_counter()
        with ann:
            yield
        dt = time.perf_counter() - t0
        st = self.stages.setdefault(name, StageStat(name))
        st.seconds += dt
        st.nbytes += nbytes
        st.calls += 1

    def report(self, out=None) -> None:
        if not self.stages:
            return
        if out is None:          # bind at call time (redirect_stderr)
            out = sys.stderr
        width = max(len(s) for s in self.stages) + 2
        out.write(f"{'stage':<{width}}{'calls':>6}{'secs':>10}{'GB/s':>10}\n")
        for st in self.stages.values():
            gb = f"{st.gbps:.2f}" if st.nbytes else "-"
            out.write(f"{st.name:<{width}}{st.calls:>6}{st.seconds:>10.3f}{gb:>10}\n")


REPORTER = Reporter(enabled=False)


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard)."""
    import jax.profiler

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
