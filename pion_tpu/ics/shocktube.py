"""1D shock-tube initial conditions.

Reference: source/ics/shocktube.cpp (Toro's predefined tests 1-5, Brio-Wu).
"""
from __future__ import annotations

import numpy as np

from ..config import SimConfig
from ..constants import BX, BY, BZ, PG, RO, SI, VX, VY, VZ, Eqn

# Toro (1999) table 4.1 / reference shocktube.cpp predefined left/right
# states: (rho_l, v_l, p_l, rho_r, v_r, p_r), gamma=1.4, x0=0.5 (0.3 for t1).
TORO = {
    1: ((1.0, 0.75, 1.0), (0.125, 0.0, 0.1), 0.3),
    2: ((1.0, -2.0, 0.4), (1.0, 2.0, 0.4), 0.5),
    3: ((1.0, 0.0, 1000.0), (1.0, 0.0, 0.01), 0.5),
    4: ((5.99924, 19.5975, 460.894), (5.99242, -6.19633, 46.0950), 0.4),
    5: ((1.0, -19.59745, 1000.0), (1.0, -19.59745, 0.01), 0.8),
}


def shocktube(cfg: SimConfig, left, right, x0: float) -> np.ndarray:
    """Generic Riemann-problem IC: full primitive vectors left/right of x0."""
    x = cfg.cell_centers(cfg.ndim - 1)
    P = np.zeros((cfg.nvar, cfg.shape[-1]))
    left = np.asarray(left, dtype=float)
    right = np.asarray(right, dtype=float)
    mask = x < x0
    P[:, mask] = left[: cfg.nvar, None]
    P[:, ~mask] = right[: cfg.nvar, None]
    return P


def toro_tests(cfg: SimConfig, n: int) -> np.ndarray:
    (rl, vl, pl), (rr, vr, pr), x0 = TORO[n]
    L = np.zeros(cfg.nvar)
    R = np.zeros(cfg.nvar)
    L[RO], L[PG], L[VX] = rl, pl, vl
    R[RO], R[PG], R[VX] = rr, pr, vr
    return shocktube(cfg, L, R, x0)


def brio_wu(cfg: SimConfig) -> np.ndarray:
    """Brio & Wu (1988) MHD shock tube: gamma=2, Bx=0.75, By=+-1."""
    assert cfg.eqn is not Eqn.EULER
    L = np.zeros(cfg.nvar)
    R = np.zeros(cfg.nvar)
    L[RO], L[PG], L[BX], L[BY] = 1.0, 1.0, 0.75, 1.0
    R[RO], R[PG], R[BX], R[BY] = 0.125, 0.1, 0.75, -1.0
    return shocktube(cfg, L, R, 0.5)
