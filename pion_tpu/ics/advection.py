"""Advection test: a density pulse carried by uniform flow.

Reference: test_problems/advection — top-hat/gaussian overdensity advected
periodically; the solution must return to its origin unchanged.
"""
from __future__ import annotations

import numpy as np

from ..config import SimConfig
from ..constants import PG, RO, VX


def advection_pulse(
    cfg: SimConfig,
    rho0: float = 1.0,
    rho_peak: float = 10.0,
    p0: float = 1.0,
    v=(1.0, 0.0, 0.0),
    width: float = 0.1,
) -> np.ndarray:
    coords = [cfg.cell_centers(ax) for ax in range(cfg.ndim)]
    grids = np.meshgrid(*coords, indexing="ij")
    center = [0.5 * (cfg.xmin[i] + cfg.xmax[i]) for i in range(cfg.ndim)]
    r2 = sum((g - c) ** 2 for g, c in zip(grids, center))
    P = np.zeros((cfg.nvar,) + cfg.shape)
    P[RO] = rho0 + (rho_peak - rho0) * np.exp(-r2 / (2 * width * width))
    P[PG] = p0
    for k in range(3):
        P[VX + k] = v[k]  # physical (x, y, z) components
    # tracer: mark the pulse
    for t in range(cfg.eqn.nbase, cfg.nvar):
        P[t] = (P[RO] > 2.0 * rho0).astype(float)
    return P
