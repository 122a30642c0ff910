"""2D MHD test problems: Orszag-Tang vortex and field-loop advection.

Reference: source/ics/basic_tests.cpp (OrszagTang, FieldLoop generators).
"""
from __future__ import annotations

import numpy as np

from ..config import SimConfig
from ..constants import BX, BY, BZ, PG, RO, VX, VY


def orszag_tang(cfg: SimConfig) -> np.ndarray:
    """Orszag-Tang vortex on [0,1]^2 periodic: standard normalization
    rho=25/(36pi), p=5/(12pi), v=(-sin 2πy, sin 2πx), B=(-sin 2πy, sin 4πx)/√(4π)."""
    assert cfg.ndim == 2 and cfg.eqn.is_mhd
    y = cfg.cell_centers(0)  # array axis 0 = physical y
    x = cfg.cell_centers(1)
    Y, X = np.meshgrid(y, x, indexing="ij")
    P = np.zeros((cfg.nvar,) + cfg.shape)
    P[RO] = 25.0 / (36.0 * np.pi)
    P[PG] = 5.0 / (12.0 * np.pi)
    P[VX] = -np.sin(2.0 * np.pi * Y)
    P[VY] = np.sin(2.0 * np.pi * X)
    b0 = 1.0 / np.sqrt(4.0 * np.pi)
    P[BX] = -b0 * np.sin(2.0 * np.pi * Y)
    P[BY] = b0 * np.sin(4.0 * np.pi * X)
    return P


def field_loop(cfg: SimConfig, A0: float = 1.0e-3, r0: float = 0.3,
               v=(1.0, 0.5), vz: float = 0.0) -> np.ndarray:
    """Weak magnetic field loop advected diagonally (Gardiner & Stone 2005).

    B = curl(A z_hat) with A = A0*(r0 - r) inside radius r0, so
    B = A0 * (-y/r, x/r) inside the loop; p and rho uniform.
    ``v=(0,0)`` gives the reference's FieldLoopStatic, ``vz!=0`` its
    FieldLoopVz out-of-plane advection variant (icgen_base.cpp:47-50).
    """
    assert cfg.ndim == 2 and cfg.eqn.is_mhd
    y = cfg.cell_centers(0)
    x = cfg.cell_centers(1)
    Y, X = np.meshgrid(y, x, indexing="ij")
    cy = 0.5 * (cfg.xmin[0] + cfg.xmax[0])
    cx = 0.5 * (cfg.xmin[1] + cfg.xmax[1])
    dx_, dy_ = X - cx, Y - cy
    r = np.sqrt(dx_ * dx_ + dy_ * dy_)
    rs = np.where(r > 1e-12, r, 1e-12)
    inside = r < r0
    P = np.zeros((cfg.nvar,) + cfg.shape)
    P[RO] = 1.0
    P[PG] = 1.0
    P[VX] = v[0]
    P[VY] = v[1]
    P[VX + 2] = vz
    P[BX] = np.where(inside, -A0 * dy_ / rs, 0.0)
    P[BY] = np.where(inside, A0 * dx_ / rs, 0.0)
    return P
