"""Runtime utilities: named timers, conservation audits, walltime guard.

Equivalents of the reference tool layer (reference: source/tools/timer.h:27-61
``class timers``/global ``clk``; sim_control.cpp:401-450 conservation checks;
sim_control_MPI.cpp:425-440 max-walltime graceful stop).
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

from .config import SimConfig
from .constants import PG, RO, VX, VY, VZ
from .grid import Geometry
from .ops.eqns import prim_to_cons


class Timers:
    """Named wall-clock timers with start/pause/stop semantics
    (reference: tools/timer.h — used e.g. to split RT waiting vs working)."""

    def __init__(self):
        self._acc: Dict[str, float] = {}
        self._started: Dict[str, float] = {}

    def start(self, name: str):
        self._started[name] = time.perf_counter()

    def pause(self, name: str) -> float:
        t0 = self._started.pop(name, None)
        if t0 is not None:
            self._acc[name] = self._acc.get(name, 0.0) + time.perf_counter() - t0
        return self._acc.get(name, 0.0)

    def stop(self, name: str) -> float:
        total = self.pause(name)
        return total

    def read(self, name: str) -> float:
        run = 0.0
        if name in self._started:
            run = time.perf_counter() - self._started[name]
        return self._acc.get(name, 0.0) + run

    def report(self) -> Dict[str, float]:
        return {k: self.read(k) for k in
                set(self._acc) | set(self._started)}


# global instance like the reference's `clk`
clk = Timers()


def conservation_totals(P, cfg: SimConfig, geom: Geometry) -> Dict[str, float]:
    """Volume-integrated mass/energy/momentum (reference:
    sim_control.cpp:401-450 initial/final energy audit)."""
    U = np.asarray(prim_to_cons(P, cfg))
    vol = np.asarray(geom.cell_volume)
    out = {
        "mass": float((U[RO] * vol).sum()),
        "energy": float((U[PG] * vol).sum()),
        "mom_x": float((U[VX] * vol).sum()),
    }
    if cfg.ndim > 1:
        out["mom_y"] = float((U[VY] * vol).sum())
    if cfg.ndim > 2:
        out["mom_z"] = float((U[VZ] * vol).sum())
    return out


class WalltimeGuard:
    """Callback for Simulation.run: stop cleanly before a walltime limit
    (reference: sim_control_MPI.cpp:425-440 allreduced walltime check)."""

    def __init__(self, max_seconds: float, margin: float = 0.05):
        self.deadline = time.time() + max_seconds * (1.0 - margin)
        self.triggered = False

    def __call__(self, sim):
        if time.time() >= self.deadline:
            self.triggered = True
            # force the run loop to end by exhausting its budget
            sim._tmax = sim.t


class StepLogger:
    """Per-step status line for the run loop (reference:
    sim_control.cpp:240-270 prints dt/simtime/walltime each step, plus the
    TESTING finite-ness checks of time_integrator.cpp:745-750).  ``freq=0``
    disables logging; at log cadence a cheap device reduce flags a
    non-finite state instead of silently running to the end."""

    def __init__(self, freq: int = 0):
        self.freq = int(freq)
        self.t0 = time.time()

    def log(self, step: int, t: float, dt: float, P=None):
        if not self.freq or step % self.freq:
            return
        line = (f"New time: {t:.6e}   dt: {dt:.6e}   steps: {step}"
                f"   walltime: {time.time() - self.t0:.1f}s")
        if P is not None:
            import jax.numpy as jnp

            if not bool(jnp.all(jnp.isfinite(P))):
                line += "   *** NON-FINITE STATE ***"
        print(line, flush=True)

def ensure_precision(cfg):
    """Enable jax x64 when the config asks for float64.

    Without this a ``dtype=float64`` run silently executes in float32
    (JAX's default), which both loses the reference's double precision and
    overflows cgs quantities (cylindrical cell volumes ~1e52).  The flip is
    one-way and process-global: construct float64 sims FIRST — arrays made
    before the flip are already truncated, and later float32 sims in the
    same process run with x64 promotion rules.  A warning fires when the
    flag flips after JAX has already been used.
    """
    import jax

    if getattr(cfg, "dtype", None) == "float64" and not jax.config.jax_enable_x64:
        import jax._src.core as _core

        if getattr(_core, "trace_state_clean", lambda: True)() is False or \
                jax.live_arrays():
            import warnings

            warnings.warn(
                "enabling jax_enable_x64 after JAX arrays exist: arrays "
                "created before this Simulation are already float32-"
                "truncated; construct float64 sims first",
                RuntimeWarning, stacklevel=3)
        jax.config.update("jax_enable_x64", True)
