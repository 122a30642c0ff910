"""Host-side simulation driver: the Time_Int loop.

Equivalent of the reference main loop (reference:
source/sim_control/sim_control.cpp:202-290 Time_Int; dt policy in
source/sim_control/calc_timestep.cpp:68-260).  The per-step compiled work is
one call into :func:`pion_tpu.stepper.advance`; everything here (dt clamps,
output cadence, walltime checks) is cheap host logic.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .boundaries import BoundaryData, make_fixed_strips
from .config import SimConfig
from .grid import Geometry, make_geometry
from .stepper import make_step_fns


@dataclasses.dataclass
class Simulation:
    cfg: SimConfig
    P: jnp.ndarray
    t: float = 0.0
    step_count: int = 0
    last_dt: float = 0.0

    def __post_init__(self):
        self.geom: Geometry = make_geometry(self.cfg)
        self.bdata: BoundaryData = make_fixed_strips(np.asarray(self.P), self.cfg)
        self.fns = make_step_fns(self.cfg, self.geom, self.bdata)

    # -- dt policy (reference: calc_timestep.cpp:219-260) ------------------
    def compute_dt(self) -> float:
        dt = float(self.fns.calc_dt(self.P))
        if self.last_dt > 0.0:
            dt = min(dt, self.cfg.max_dt_growth * self.last_dt)
        dt = min(dt, self.cfg.tmax - self.t)
        if dt < self.cfg.min_timestep:
            raise RuntimeError(f"timestep too small: {dt}")
        return dt

    def step(self) -> float:
        dt = self.compute_dt()
        self.P = self.fns.advance(self.P, dt)
        self.t += dt
        self.last_dt = dt
        self.step_count += 1
        return dt

    def run(self, tmax: Optional[float] = None, max_steps: int = 10**9,
            callback: Optional[Callable] = None):
        tmax = self.cfg.tmax if tmax is None else tmax
        while self.t < tmax * (1.0 - 1e-12) and self.step_count < max_steps:
            self.step()
            if callback is not None:
                callback(self)
        self.P.block_until_ready()
        return self
