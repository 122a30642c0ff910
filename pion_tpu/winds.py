"""Stellar-wind internal boundary regions.

TPU-native re-derivation of the reference wind machinery
(reference: source/grid/stellar_wind_BC.cpp: add_source/add_cell carve a
sphere of radius R around each source and every step overwrite the cells
inside with the free-wind state; stellar_wind_evolution interpolates
time-dependent wind parameters from stellar-evolution tables,
stellar_wind_BC.cpp:1240-1400).

Here the carved region is a static boolean mask plus precomputed geometry
(distance, direction cosines), and the overwrite is a single ``jnp.where``
applied after every partial update — the vectorized equivalent of
``BC_update_STWIND`` (reference: boundaries/stellar_wind_boundaries.cpp).

Round-1 scope: constant and table-evolving isotropic (optionally rotating,
magnetized) winds; latitude-dependent winds (stellar_wind_angle.cpp) and
orbiting sources are TODO(parity).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .config import SimConfig
from .constants import BX, BY, BZ, K_B, M_P, PG, RO, VX, VY, VZ, Coord, Eqn
from .grid import Geometry


@dataclasses.dataclass(frozen=True)
class WindEvolution:
    """Time-interpolated wind parameters (reference:
    stellar_wind_evolution::update_source, stellar_wind_BC.h:391,501).
    Columns are linear-interpolated in time; times in seconds."""

    time: np.ndarray
    mdot: np.ndarray        # g/s
    vinf: np.ndarray        # cm/s
    t_wind: np.ndarray      # K
    rstar: np.ndarray       # cm

    def at(self, t) -> Dict:
        # jnp.interp so a traced simulation time works under jit
        return {
            "mdot": jnp.interp(t, jnp.asarray(self.time), jnp.asarray(self.mdot)),
            "vinf": jnp.interp(t, jnp.asarray(self.time), jnp.asarray(self.vinf)),
            "t_wind": jnp.interp(t, jnp.asarray(self.time), jnp.asarray(self.t_wind)),
            "rstar": jnp.interp(t, jnp.asarray(self.time), jnp.asarray(self.rstar)),
        }


@dataclasses.dataclass(frozen=True)
class WindSource:
    """One wind source (reference: stellarwind_params, sim_params.h:129-157)."""

    position: Tuple[float, ...]       # array-order coordinates
    radius: float                     # boundary-region radius [cm]
    mdot: float                       # mass-loss rate [g/s]
    vinf: float                       # terminal velocity [cm/s]
    t_wind: float = 1.0e4             # wind temperature at the stellar surface
    rstar: float = 7.0e10             # stellar radius [cm]
    v_rot: float = 0.0                # equatorial rotation speed [cm/s]
    b_star: float = 0.0               # surface split-monopole field [G]
    tracers: Tuple[float, ...] = ()   # tracer values of the wind material
    evolution: Optional[WindEvolution] = None


class WindBC:
    """Precomputed wind-region geometry + the per-step overwrite."""

    def __init__(self, cfg: SimConfig, geom: Geometry, src: WindSource):
        self.cfg = cfg
        self.src = src
        nd = cfg.ndim
        ng = cfg.ng
        centers = [g.pos[ng:-ng] for g in geom.axes]
        grids = np.meshgrid(*centers, indexing="ij")
        # offsets from source, array order -> physical (x = last axis)
        d_arr = [g - p for g, p in zip(grids, src.position)]
        dist = np.sqrt(sum(dd * dd for dd in d_arr))
        dist = np.maximum(dist, 0.1 * geom.dx)
        self.mask = jnp.asarray(dist <= src.radius)
        self.inner = jnp.asarray((dist < 0.75 * src.radius) & (nd > 1))
        self.dist = jnp.asarray(dist)
        # physical-axis components: x = offset along the LAST array axis
        phys = [d_arr[nd - 1 - k] if k < nd else np.zeros_like(dist)
                for k in range(3)]
        self.nx = jnp.asarray(phys[0] / dist)
        self.ny = jnp.asarray(phys[1] / dist)
        self.nz = jnp.asarray(phys[2] / dist)

    def wind_state(self, P, t: float):
        """Free-wind primitive state on the full grid (values only used
        under the mask) — reference: set_wind_cell_reference_state
        (stellar_wind_BC.cpp:375-600)."""
        cfg = self.cfg
        s = self.src
        par = dict(mdot=s.mdot, vinf=s.vinf, t_wind=s.t_wind, rstar=s.rstar)
        if s.evolution is not None:
            par.update(s.evolution.at(t))
        g = cfg.gamma
        d = self.dist
        rho = par["mdot"] / (par["vinf"] * 4.0 * np.pi) / (d * d)
        # adiabatic wind: T=Tw at the stellar surface
        pg = (K_B * par["t_wind"] / M_P
              * (4.0 * np.pi * par["rstar"] ** 2 * par["vinf"]
                 / par["mdot"]) ** (g - 1.0) * rho**g)
        vx = par["vinf"] * self.nx
        vy = par["vinf"] * self.ny
        vz = par["vinf"] * self.nz
        if cfg.ndim == 2:
            # axisymmetric: VZ carries the rotational (phi) component
            # (reference: :446 p[VZ] = v_rot*Rstar*y/d^2)
            vz = s.v_rot * par["rstar"] * self.ny / d
        elif cfg.ndim == 3 and s.v_rot != 0.0:
            vx = vx - s.v_rot * par["rstar"] * self.ny / d
            vy = vy + s.v_rot * par["rstar"] * self.nx / d
        out = [rho, pg, vx, vy, vz]
        if cfg.eqn.is_mhd:
            # split monopole (reference: :590-640)
            b_s = s.b_star / np.sqrt(4.0 * np.pi)
            d2 = (par["rstar"] / d) ** 2
            bx = b_s * d2 * self.nx
            by = b_s * d2 * self.ny
            bz = b_s * d2 * self.nz
            out += [bx, by, bz]
            if cfg.eqn is Eqn.GLM:
                out += [jnp.zeros_like(rho)]
        for tv in s.tracers:
            out.append(jnp.full_like(rho, tv))
        while len(out) < cfg.nvar:
            out.append(jnp.zeros_like(rho))
        W = jnp.stack(out[: cfg.nvar])
        # deep interior: rho and p kept inert (reference: :382-388 sets only
        # RO/PG to 1e-31 when dist < 0.75*radius in multi-D)
        W = W.at[RO].set(jnp.where(self.inner, 1.0e-31, W[RO]))
        W = W.at[PG].set(jnp.where(self.inner, 1.0e-31, W[PG]))
        return W

    def apply(self, P, t: float):
        W = self.wind_state(P, t)
        return jnp.where(self.mask, W, P)


def make_wind_bcs(cfg: SimConfig, geom: Geometry, sources):
    return [WindBC(cfg, geom, s) for s in sources]
