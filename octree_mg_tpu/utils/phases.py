"""Per-phase timing report for a solver configuration.

Reproduces the reference's instrumented cycle phases (``mg_add_timers``,
/root/reference/src/m_multigrid.f90:72-81: total V-cycle/FMG, smoother,
smoother ghost-cells, coarse solve, correct, update-coarse) and the
min/max table of ``mg_timers_show`` (m_data_structures.f90:562-581).

The reference wraps mpi_wtime around in-place phases; here each phase
is timed as its own jitted program ending in a device->host scalar read
(the only reliable execution barrier on tunneled runtimes), so numbers
are per-invocation wall times on real hardware.  Inside a fused cycle
program XLA may overlap/fuse phases further, so the sum of phases is an
upper bound on the fused cycle time.
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .timers import Timers


def _timed(timers, name, fn, *args, reps=2):
    """Time fn under jit with the sync scalar as an OUTPUT of the
    program: on tunneled runtimes block_until_ready returns before
    remote execution finishes, and an eager jnp.sum on a large result
    costs tens of ms and poisons the measurement (see CLAUDE.md)."""

    def run(*a):
        out = fn(*a)
        # the probe must touch EVERY output leaf or XLA dead-code-
        # eliminates the untouched phases (one scalar element per leaf;
        # jax clamps out-of-range indices)
        acc = jnp.asarray(0.0, jnp.float32)
        for l in jax.tree_util.tree_leaves(out):
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                      jnp.floating):
                acc = acc + l[(3,) * l.ndim].astype(jnp.float32)
        return acc

    jr = jax.jit(run)
    float(jr(*args))  # compile + warm
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jr(*args))
        timers.add(name, time.perf_counter() - t0)


def phase_report(solver, state, lam=0.0, show: bool = True) -> Timers:
    """Time the reference's seven cycle phases at the top level (plus
    the whole FMG) for the given solver/state; returns the Timers."""
    timers = Timers()
    lam = jnp.asarray(lam, solver.cfg.dtype)
    top = solver.levels[-1]
    if hasattr(solver, "_ensure_direct"):
        solver._ensure_direct()   # build eagerly, not inside a trace

    if hasattr(solver, "_smooth_boxes"):        # boxed MGSolver
        dmaps = solver._to_device()
        from ..core.constants import IPHI
        _timed(timers, "smoother(+gc) [1 cycle]",
               jax.jit(lambda s: solver._smooth_boxes(s, dmaps, top, 1,
                                                      lam)), state)
        _timed(timers, "smoother ghost-cells",
               jax.jit(lambda s: solver._fill_ghost_lvl(s, dmaps, top,
                                                        IPHI)), state)
        _timed(timers, "update-coarse",
               jax.jit(lambda s: solver._update_coarse(s, dmaps, top,
                                                       lam)), state)
        _timed(timers, "correct",
               jax.jit(lambda s: solver._correct_children(s, dmaps,
                                                          top - 1)),
               state)
        _timed(timers, "coarse-solve",
               jax.jit(lambda s: solver._coarse_solve(s, dmaps, lam)),
               state)
    else:                                        # dense solver
        _timed(timers, "smoother(+gc) [1 cycle]",
               jax.jit(lambda s: solver._smooth(s, top, 1, lam)), state)
        timers.add("smoother ghost-cells", 0.0)  # fused into the pair
        _timed(timers, "update-coarse",
               jax.jit(lambda s: solver._update_coarse(s, top, lam)),
               state)
        _timed(timers, "correct",
               jax.jit(lambda s: solver._correct_children(s, top - 1,
                                                          lam)), state)
        _timed(timers, "coarse-solve",
               jax.jit(lambda s: solver._coarse_solve(s, lam)), state)

    _timed(timers, "total FMG cycle",
           lambda s: solver.fas_fmg(s, have_guess=True)[0], state)
    # constant probe overhead (state-wide one-element gathers + sync):
    # subtract this floor from every row above when reading the table
    _timed(timers, "probe floor (no-op)", lambda s: s, state)
    if show:
        timers.show()
    return timers
