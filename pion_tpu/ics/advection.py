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


def advect_sine_wave(
    cfg: SimConfig,
    rho0: float = 1.0,
    amplitude: float = 0.1,
    p0: float = 1.0,
    v=(1.0, 0.0, 0.0),
    nwave: int = 1,
) -> np.ndarray:
    """Smooth sine-wave density advection (reference: icgen
    'AdvectSineWave', icgen_base.cpp:47) — the standard smooth-profile
    convergence-order test: after one period the wave must return to its
    starting phase with error ~ dx^OOA."""
    x = cfg.cell_centers(cfg.ndim - 1)  # physical x = last array axis
    L = cfg.xmax[0] - cfg.xmin[0]
    wave = np.sin(2.0 * np.pi * nwave * (x - cfg.xmin[0]) / L)
    shape = (1,) * (cfg.ndim - 1) + (-1,)
    P = np.zeros((cfg.nvar,) + cfg.shape)
    P[RO] = rho0 * (1.0 + amplitude * wave.reshape(shape))
    P[PG] = p0
    for k in range(3):
        P[VX + k] = v[k]
    return P
