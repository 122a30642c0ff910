"""Synthetic observations: line-of-sight projections of emissivities.

TPU-native equivalent of the reference projection tools
(reference: analysis/projection/project2D.cpp:87,286-342 — Halpha, [NII]
6584, emission measure and X-ray maps from 2D axisymmetric snapshots;
analysis/projection3D/ for 3D volumes; emissivity functions from
analysis/xray/xray_emission.cpp:263-295).

The axisymmetric projection is an Abel-type integral: for impact parameter
b, I(z,b) = sum over annuli R>=b of j(R,z) * chord(R,b).  The chord-length
weights form a static (n_b x n_R) matrix, so projecting a whole snapshot is
one matmul per emissivity — it rides the MXU.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from ..config import SimConfig
from ..constants import K_B, M_P, PG, RO

PARSEC = 3.0856775807e18


def _gas_quantities(P, cfg: SimConfig, mp=None):
    """(n_e, n_Hp, n_H, T) from a snapshot; uses the chemistry module when
    available, else assumes fully-ionized solar-ish gas."""
    if mp is not None:
        nH = mp.n_H(P[RO])
        x = P[mp.mpc.tracer_slot]
        ne = getattr(mp.mpc, "n_elec", 1.0) * x * nH
        n_hp = x * nH
        T = mp.temperature(P, cfg)
    else:
        nH = P[RO] / (M_P / 0.715)
        ne = 1.1 * nH
        n_hp = nH
        T = P[PG] / (2.2 * nH * K_B)
    return ne, n_hp, nH, T


def halpha_emissivity(ne, n_hp, T):
    """j(Ha) = 2.63e-33 n_e n_p T^-0.9 [erg/cm^3/s/arcsec^2]
    (reference: xray_emission.cpp:265-274, from Osterbrock)."""
    return 2.63e-33 * ne * n_hp * T ** (-0.9)


def nii6584_emissivity(ne, n_hp, T, frac_n=1.0):
    """[NII] 6584A emissivity (Dopita 1973 fit; reference:
    xray_emission.cpp:283-295), solar N abundance scaling via frac_n."""
    return (1.27563e-29 * frac_n * ne * n_hp
            * jnp.exp(-2.1855e4 / T - T * T / 1.0e10) / jnp.sqrt(T))


def emission_measure(ne, n_hp):
    """EM integrand n_e n_p [cm^-6]; projected EM usually quoted in
    cm^-6 pc (divide the integral by one parsec)."""
    return ne * n_hp


def xray_emissivity(ne, nH, T, e_min_kev: float = 0.1):
    """Soft X-ray emissivity above e_min_kev [erg cm^3/s] per (n_e n_H).

    Approximate thermal bremsstrahlung + metal-line form (the reference
    interpolates a CHIANTI-derived table, analysis/projection/xray-table.txt;
    here an analytic approximation: Lambda_X ~ 1.4e-27 sqrt(T) exp(-E0/kT)
    with a metal-line boost near 10^6.5 K).  TODO(parity): tabulated
    emissivities."""
    kT_kev = T * K_B / 1.602e-9
    brems = 2.4e-27 * jnp.sqrt(T) * jnp.exp(-e_min_kev / jnp.maximum(kT_kev, 1e-10))
    lines = 8.0e-23 * jnp.exp(-((jnp.log10(jnp.maximum(T, 1.0)) - 6.6) ** 2)
                              / 0.8) * jnp.exp(-e_min_kev / jnp.maximum(kT_kev, 1e-10))
    return (brems + lines) * ne * nH


def abel_weights(R: np.ndarray, dR: float) -> np.ndarray:
    """Chord-length matrix W[b,R]: path length through the annulus
    [R-dR/2, R+dR/2] for a sight line at impact parameter b=R_b
    (reference: perp_projection.cpp geometry)."""
    nr = len(R)
    Rp = R + 0.5 * dR
    Rm = np.maximum(R - 0.5 * dR, 0.0)
    W = np.zeros((nr, nr))
    for ib in range(nr):
        b = R[ib]
        for ir in range(ib, nr):
            if Rp[ir] <= b:
                continue
            hi = np.sqrt(max(Rp[ir] ** 2 - b * b, 0.0))
            lo = np.sqrt(max(Rm[ir] ** 2 - b * b, 0.0))
            W[ib, ir] = 2.0 * (hi - lo)
    return W


def project_axisymmetric(P, cfg: SimConfig, mp=None,
                         quantities=("em", "halpha", "nii"),
                         e_min_kev: float = 0.1) -> Dict[str, jnp.ndarray]:
    """Project a 2D axisymmetric snapshot perpendicular to the symmetry
    axis.  Returns images of shape (n_b, n_z) keyed by quantity."""
    from ..constants import Coord

    assert cfg.ndim == 2 and cfg.coords is Coord.CYLINDRICAL
    ng = cfg.ng
    R = cfg.cell_centers(0)
    W = jnp.asarray(abel_weights(R, cfg.dx))
    ne, n_hp, nH, T = _gas_quantities(P, cfg, mp)
    out = {}
    for q in quantities:
        if q == "em":
            j = emission_measure(ne, n_hp) / PARSEC
        elif q == "halpha":
            j = halpha_emissivity(ne, n_hp, T)
        elif q == "nii":
            j = nii6584_emissivity(ne, n_hp, T)
        elif q == "xray":
            j = xray_emissivity(ne, nH, T, e_min_kev)
        else:
            raise ValueError(f"unknown projection quantity {q}")
        out[q] = W @ j  # (n_b, n_R) @ (n_R, n_z) -> (n_b, n_z)
    return out


def project_3d(P, cfg: SimConfig, axis: int = 0, mp=None,
               quantities=("em", "halpha")) -> Dict[str, jnp.ndarray]:
    """Project a 3D snapshot along a grid axis (reference:
    analysis/projection3D)."""
    assert cfg.ndim == 3
    ne, n_hp, nH, T = _gas_quantities(P, cfg, mp)
    out = {}
    for q in quantities:
        if q == "em":
            j = emission_measure(ne, n_hp) / PARSEC
        elif q == "halpha":
            j = halpha_emissivity(ne, n_hp, T)
        elif q == "nii":
            j = nii6584_emissivity(ne, n_hp, T)
        elif q == "xray":
            j = xray_emissivity(ne, nH, T)
        else:
            raise ValueError(f"unknown projection quantity {q}")
        out[q] = jnp.sum(j, axis=axis) * cfg.dx
    return out
