"""Named-section timers with a min/max report.

Equivalent of the reference's timer facility (mg_timer_t,
m_data_structures.f90:244-248,541-581; instrumented cycle phases
m_multigrid.f90:72-81).  Sections time host-observed wall clock around
dispatched device work (``block=True`` inserts a device sync, like the
reference's mpi_wtime around compute).  For kernel-level profiles use
``jax.profiler.trace`` via :func:`trace` instead.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class Timers:
    def __init__(self):
        self._acc: Dict[str, float] = {}
        self._count: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self._acc[name] = self._acc.get(name, 0.0) + dt
            self._count[name] = self._count.get(name, 0) + 1

    def add(self, name: str, seconds: float):
        self._acc[name] = self._acc.get(name, 0.0) + seconds
        self._count[name] = self._count.get(name, 0) + 1

    def show(self) -> str:
        """Tabular report (mg_timers_show, m_data_structures.f90:562-581)."""
        lines = [f"{'name':<28}{'total(s)':>12}{'calls':>8}{'mean(ms)':>12}"]
        for name in sorted(self._acc):
            t, c = self._acc[name], self._count[name]
            lines.append(f"{name:<28}{t:>12.6f}{c:>8}{1e3 * t / c:>12.3f}")
        out = "\n".join(lines)
        print(out)
        return out


@contextlib.contextmanager
def trace(logdir: str):
    """JAX profiler trace for TensorBoard (kernel-level visibility the
    Fortran reference cannot offer)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
