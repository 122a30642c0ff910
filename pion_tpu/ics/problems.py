"""Additional problem generators from the icgen menu.

Reference: source/ics/icgen_base.cpp:36-130 dispatch; individual generators
in source/ics/ (basic_tests.cpp, jet.cpp, shock_cloud.cpp, clump tests,
double_Mach_reflection via DMR BCs, Liska & Wendroff implosion).
"""
from __future__ import annotations

import numpy as np

from ..config import SimConfig
from ..constants import BX, BY, BZ, PG, RO, VX, VY, VZ


def _mesh(cfg: SimConfig):
    coords = [cfg.cell_centers(ax) for ax in range(cfg.ndim)]
    return np.meshgrid(*coords, indexing="ij")


def kelvin_helmholtz(cfg: SimConfig, rho1=1.0, rho2=2.0, v1=0.5, v2=-0.5,
                     p0=2.5, amp=0.01, seed=7) -> np.ndarray:
    """2D KH instability: shear layer at |y-0.5|=0.25 with velocity
    perturbation (reference: icgen KelvinHelmholz setups)."""
    assert cfg.ndim == 2
    Y, X = _mesh(cfg)
    P = np.zeros((cfg.nvar,) + cfg.shape)
    inner = np.abs(Y - 0.5) < 0.25
    P[RO] = np.where(inner, rho2, rho1)
    P[VX] = np.where(inner, v2, v1)
    P[PG] = p0
    P[VY] = amp * np.sin(4.0 * np.pi * X)
    for tr in range(cfg.eqn.nbase, cfg.nvar):
        P[tr] = inner.astype(float)
    return P


def liska_wendroff_implosion(cfg: SimConfig) -> np.ndarray:
    """Liska & Wendroff (2003) implosion: diagonal discontinuity in the
    unit box, reflecting walls; the solution must remain symmetric about
    the diagonal (reference test_problems LWimplosion)."""
    assert cfg.ndim == 2
    Y, X = _mesh(cfg)
    P = np.zeros((cfg.nvar,) + cfg.shape)
    inside = (X + Y) < 0.15
    P[RO] = np.where(inside, 0.125, 1.0)
    P[PG] = np.where(inside, 0.14, 1.0)
    return P


def double_mach_reflection(cfg: SimConfig) -> np.ndarray:
    """Woodward & Colella (1984) double Mach reflection IC: Mach-10 shock
    inclined 60 degrees, crossing the bottom wall at x=1/6
    (reference: double_Mach_ref_boundaries.cpp states; gamma=1.4)."""
    assert cfg.ndim == 2
    from ..boundaries import DMR_POST, DMR_PRE

    Y, X = _mesh(cfg)
    P = np.zeros((cfg.nvar,) + cfg.shape)
    bpos = 1.0 / 6.0 + Y / np.tan(np.pi / 3.0)
    post = X <= bpos
    for v in range(5):
        P[v] = np.where(post, DMR_POST[v], DMR_PRE[v])
    for tr in range(cfg.eqn.nbase, cfg.nvar):
        P[tr] = np.where(post, 1.0, -1.0)
    return P


def jet_ambient(cfg: SimConfig, rho_amb=1.0, p_amb=1.0) -> np.ndarray:
    """Uniform ambient medium for jet simulations; the jet enters through
    a BC.JET face (reference: ics/jet.cpp + jet_boundaries.cpp)."""
    P = np.zeros((cfg.nvar,) + cfg.shape)
    P[RO] = rho_amb
    P[PG] = p_amb
    return P


def jet_state(cfg: SimConfig, rho_jet=0.1, p_jet=1.0, v_jet=10.0,
              tracer=1.0) -> np.ndarray:
    """Jet inflow primitive vector for BoundaryData.jet."""
    s = np.zeros(cfg.nvar)
    s[RO] = rho_jet
    s[PG] = p_jet
    s[VX] = v_jet
    for tr in range(cfg.eqn.nbase, cfg.nvar):
        s[tr] = tracer
    return s


def shock_cloud(cfg: SimConfig, mach=10.0, rho_amb=1.0, p_amb=1.0,
                rho_cloud=10.0, r_cloud=0.15, x_shock=0.3,
                cloud_center=None, gamma=None) -> np.ndarray:
    """Planar shock hitting a dense spherical cloud
    (reference: ics/shock_cloud.cpp)."""
    g = gamma or cfg.gamma
    grids = _mesh(cfg)
    P = np.zeros((cfg.nvar,) + cfg.shape)
    x = grids[-1]
    if cloud_center is None:
        cloud_center = [0.5 * (cfg.xmin[i] + cfg.xmax[i])
                        for i in range(cfg.ndim)]
        cloud_center[-1] = x_shock + 2.0 * r_cloud
    r2 = sum((grids[i] - cloud_center[i]) ** 2 for i in range(cfg.ndim))
    cloud = r2 < r_cloud * r_cloud

    # Rankine-Hugoniot post-shock state for a Mach `mach` shock moving in +x
    m2 = mach * mach
    rho_ratio = (g + 1.0) * m2 / ((g - 1.0) * m2 + 2.0)
    p_ratio = (2.0 * g * m2 - (g - 1.0)) / (g + 1.0)
    cs = np.sqrt(g * p_amb / rho_amb)
    v_post = mach * cs * (1.0 - 1.0 / rho_ratio)

    pre = x >= x_shock
    P[RO] = np.where(pre, rho_amb, rho_amb * rho_ratio)
    P[PG] = np.where(pre, p_amb, p_amb * p_ratio)
    P[VX] = np.where(pre, 0.0, v_post)
    P[RO] = np.where(cloud, rho_cloud, P[RO])
    for tr in range(cfg.eqn.nbase, cfg.nvar):
        P[tr] = cloud.astype(float)
    return P


def spherical_clump(cfg: SimConfig, rho_amb=1.0, p_amb=1.0, rho_max=100.0,
                    r_core=0.1, center=None, profile="gaussian") -> np.ndarray:
    """Dense clump in a uniform medium: Gaussian or top-hat profile
    (reference: ics/clump tests, photoevaporating clump setups)."""
    grids = _mesh(cfg)
    if center is None:
        center = [0.5 * (cfg.xmin[i] + cfg.xmax[i]) for i in range(cfg.ndim)]
    r2 = sum((grids[i] - center[i]) ** 2 for i in range(cfg.ndim))
    P = np.zeros((cfg.nvar,) + cfg.shape)
    if profile == "gaussian":
        P[RO] = rho_amb + (rho_max - rho_amb) * np.exp(-r2 / (2 * r_core**2))
    else:
        P[RO] = np.where(r2 < r_core**2, rho_max, rho_amb)
    P[PG] = p_amb
    for tr in range(cfg.eqn.nbase, cfg.nvar):
        P[tr] = np.clip((P[RO] - rho_amb) / (rho_max - rho_amb), 0, 1)
    return P


def random_clumps(cfg: SimConfig, n_clumps=10, rho_amb=1.0, p_amb=1.0,
                  rho_max=50.0, r_core=0.05, seed=42) -> np.ndarray:
    """Multiple randomly-placed Gaussian clumps
    (reference: ics/photevap_multi_clumps.cpp RandomClumps)."""
    rng = np.random.default_rng(seed)
    grids = _mesh(cfg)
    P = np.zeros((cfg.nvar,) + cfg.shape)
    P[RO] = rho_amb
    P[PG] = p_amb
    for _ in range(n_clumps):
        center = [rng.uniform(cfg.xmin[i] + 0.1 * (cfg.xmax[i] - cfg.xmin[i]),
                              cfg.xmax[i] - 0.1 * (cfg.xmax[i] - cfg.xmin[i]))
                  for i in range(cfg.ndim)]
        r2 = sum((grids[i] - center[i]) ** 2 for i in range(cfg.ndim))
        P[RO] += (rho_max - rho_amb) * np.exp(-r2 / (2 * r_core**2))
    for tr in range(cfg.eqn.nbase, cfg.nvar):
        P[tr] = np.clip((P[RO] - rho_amb) / (rho_max - rho_amb), 0, 1)
    return P


def add_noise(P: np.ndarray, cfg: SimConfig, amplitude: float,
              seed: int = 0, kind: str = "pressure") -> np.ndarray:
    """Random perturbations like icgen's AddNoise2Data
    (reference: ics/icgen.cpp:257 noise options)."""
    rng = np.random.default_rng(seed)
    out = P.copy()
    noise = 1.0 + amplitude * (rng.random(P[0].shape) - 0.5)
    if kind == "pressure":
        out[PG] *= noise
    elif kind == "density":
        out[RO] *= noise
    return out
