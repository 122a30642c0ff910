"""Directionally-unsplit finite-volume flux sweeps.

This is the TPU-native replacement for the reference's per-column pointer walk
(reference: source/sim_control/time_integrator.cpp:498-860
``calc_dynamics_dU`` -> ``dynamics_dU_column``, and
source/spatial_solvers/solver_eqn_base.cpp:152-204 ``InterCellFlux``):
instead of marching cell-by-cell down columns, every axis is processed as one
whole-array shifted-slice computation — slopes, edge states, Riemann fluxes
and source terms are all dense vector ops that XLA fuses and tiles onto the
VPU, with the fast (lane) dimension riding the innermost grid axis.

``dynamics_dU`` returns the *accumulated conserved increment* dt*(-div F + S)
for interior cells, plus the per-axis face fluxes (for Berger-Colella 1989
flux correction between refinement levels).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from ..config import SimConfig
from ..constants import BX, BY, BZ, PG, RO, SI, VX, VY, VZ, AV, Eqn, Solver
from ..grid import Geometry
from . import riemann_hydro as rh
from . import riemann_mhd as rm
from .eqns import (
    cfast_components,
    cons_to_prim,
    inverse_perm,
    maxspeed,
    sweep_perm,
)
from .recon import edge_states, limited_slopes


def _move_axis_last(A: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Move spatial ``axis`` (0-based, array order) to the last position.
    Variable index stays at axis 0."""
    return jnp.moveaxis(A, 1 + axis, -1)


def _restore_axis(A: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.moveaxis(A, -1, 1 + axis)


def _interior(A: jnp.ndarray, cfg: SimConfig, skip_axis: Optional[int] = None):
    """Slice ghost zones off every spatial axis (except ``skip_axis``)."""
    ng = cfg.ng
    sl = [slice(None)]  # variable axis
    for ax in range(cfg.ndim):
        sl.append(slice(None) if ax == skip_axis else slice(ng, -ng))
    return A[tuple(sl)]


def _reconstruct(Pm, cfg: SimConfig, geom: Geometry, axis: int, order: int):
    """Slopes + edge states along the (last-moved) sweep axis.

    Returns (Pl, Pr, slope_c): the left/right states at the N+1 interfaces
    bounding the N interior cells, and the slope of each interior cell
    (needed by the geometric source terms).
    """
    g = geom.axes[axis]
    ng = cfg.ng
    n = cfg.shape[axis]
    if order == 1:
        # Piecewise-constant (reference: VectorOps.cpp:587-589 with OA1)
        Pl = Pm[..., ng - 1 : ng + n]
        Pr = Pm[..., ng : ng + n + 1]
        slope_c = jnp.zeros_like(Pm[..., ng : ng + n])
        return Pl, Pr, slope_c
    com = jnp.asarray(g.com)
    slopes = limited_slopes(Pm, com)          # cells [1 .. Npad-1)
    cells = Pm[..., 1:-1]
    lo, hi = edge_states(
        cells, slopes, jnp.asarray(g.del_n[1:-1]), jnp.asarray(g.del_p[1:-1])
    )
    # interface i+1/2 between padded cells (c, c+1):
    #   left state = hi-face state of c, right = lo-face state of c+1
    Pl = hi[..., ng - 2 : ng + n - 1]
    Pr = lo[..., ng - 1 : ng + n]
    slope_c = slopes[..., ng - 1 : ng + n - 1]
    return Pl, Pr, slope_c


def _riemann(Pl_r, Pr_r, cfg: SimConfig, dx_over_dt, hc_eta):
    """Dispatch on the configured flux solver (sweep frame).

    Mirrors reference solver dispatch (solver_eqn_hydro_adi.cpp:94-201,
    solver_eqn_mhd_adi.cpp:102-200).  Returns (flux, pstar).
    """
    s = cfg.solver
    if cfg.eqn is Eqn.EULER:
        if s is Solver.LF:
            return rh.lax_friedrichs(Pl_r, Pr_r, cfg, dx_over_dt)
        if s is Solver.HLL:
            return rh.hll(Pl_r, Pr_r, cfg)
        if s is Solver.RCV:
            return rh.roe_cv(Pl_r, Pr_r, cfg, hc_eta)
        if s is Solver.RPV:
            return rh.linear_pv(Pl_r, Pr_r, cfg)
        if s is Solver.LINEAR:
            return rh.linear_pv(Pl_r, Pr_r, cfg)
        if s is Solver.EXACT:
            return rh.exact(Pl_r, Pr_r, cfg)
        if s is Solver.HYBRID:
            return rh.hybrid(Pl_r, Pr_r, cfg)
        if s is Solver.FVS:
            return rh.fvs(Pl_r, Pr_r, cfg)
        raise ValueError(f"unsupported hydro solver {s}")
    # MHD / GLM
    if s is Solver.LF:
        return rm_to_pstar(rm_lf(Pl_r, Pr_r, cfg, dx_over_dt), cfg)
    if s is Solver.HLL:
        return rm_to_pstar(rm.hll(Pl_r, Pr_r, cfg), cfg)
    if s is Solver.HLLD:
        return rm_to_pstar(rm.hlld(Pl_r, Pr_r, cfg), cfg)
    if s is Solver.RCV:
        return rm_to_pstar(rm.roe_cv(Pl_r, Pr_r, cfg, hc_eta), cfg)
    if s in (Solver.LINEAR, Solver.EXACT, Solver.HYBRID, Solver.RPV):
        return rm_to_pstar(rm.linear(Pl_r, Pr_r, cfg), cfg)
    raise ValueError(f"unsupported MHD solver {s}")


def rm_lf(Pl, Pr, cfg, dx_over_dt):
    f, p = rh.lax_friedrichs(Pl, Pr, cfg, dx_over_dt)
    from .eqns import prim_to_cons

    return f, prim_to_cons(p, cfg)


def rm_to_pstar(fu, cfg):
    f, ustar = fu
    return f, cons_to_prim(ustar, cfg)


def _av_falle(flux, Pl, Pr, pstar, cfg: SimConfig):
    """FKJ98 viscous flux correction (reference:
    solver_eqn_hydro_adi.cpp:283-330, solver_eqn_mhd_adi.cpp:209-286)."""
    if cfg.eqn is Eqn.EULER:
        pref = maxspeed(pstar, cfg) * cfg.etav * pstar[RO]
    else:
        pref = (
            cfast_components(
                0.5 * (Pl[RO] + Pr[RO]),
                0.5 * (Pl[PG] + Pr[PG]),
                0.5 * (Pl[BX] + Pr[BX]),
                0.5 * (Pl[BY] + Pr[BY]),
                0.5 * (Pl[BZ] + Pr[BZ]),
                cfg.gamma,
            )
            * cfg.etav
            * pstar[RO]
        )
    erg = jnp.zeros_like(pref)
    for v in (VX, VY, VZ):
        mv = pref * (Pr[v] - Pl[v])
        flux = flux.at[v].add(-mv)
        erg = erg + mv * pstar[v]
    if cfg.eqn.is_mhd:
        prefb = pref / pstar[RO]  # etaB == etav (reference :277)
        for b in (BY, BZ):
            mv = prefb * (Pr[b] - Pl[b])
            flux = flux.at[b].add(-mv)
            erg = erg + mv * pstar[b]
    return flux.at[PG].add(-erg)


def calc_hcorr_eta(Ph_pad, cfg: SimConfig, geom: Geometry, order: int):
    """Per-cell, per-axis H-correction eta at each cell's positive face
    (Sanders, Morano & Druguet 1998 eq. 10; reference:
    solver_eqn_base.cpp:423-599).  Returns a list of padded arrays."""
    etas = []
    for axis in range(cfg.ndim):
        Pm = _move_axis_last(Ph_pad, axis)
        perm = sweep_perm(cfg, axis)
        n_all = Pm.shape[-1] - 1  # interfaces in the padded column
        g = geom.axes[axis]
        if order == 1:
            el = Pm[..., :-1]
            er = Pm[..., 1:]
        else:
            com = jnp.asarray(g.com)
            slopes = limited_slopes(Pm, com)
            z = jnp.zeros_like(Pm[..., :1])
            slopes_full = jnp.concatenate([z, slopes, z], axis=-1)
            cells = Pm
            lo, hi = edge_states(
                cells, slopes_full, jnp.asarray(g.del_n), jnp.asarray(g.del_p)
            )
            el = hi[..., :-1]
            er = lo[..., 1:]
        el_r = el[perm]
        er_r = er[perm]
        eta = 0.5 * (
            jnp.abs(er_r[VX] - el_r[VX])
            + jnp.abs(maxspeed(er_r, cfg) - maxspeed(el_r, cfg))
        )
        # store at the cell owning the positive face; pad the last cell
        pad = jnp.zeros_like(eta[..., :1])
        eta_cells = jnp.concatenate([eta, pad], axis=-1)  # no variable axis
        etas.append(jnp.moveaxis(eta_cells, -1, axis))
    return etas


def _select_hcorr_eta(etas, cfg: SimConfig, axis: int, n: int):
    """Max eta over the H-stencil of each interface along ``axis``
    (reference: solver_eqn_base.cpp:608-678, Sanders et al. 1998 fig. 9):
    the interface's own eta plus, on every transverse axis, the etas of the
    two adjacent cells and of their negative-side neighbours.  Returns an
    interface array (interior transverse dims, n+1 along the sweep axis)."""
    ng = cfg.ng

    def sweep_iface(cells):
        """padded cell array (no var axis) -> sweep axis last, transverse
        axes sliced to the interior."""
        m = jnp.moveaxis(cells, axis, -1)
        if cfg.ndim > 1:
            m = m[(slice(ng, -ng),) * (cfg.ndim - 1) + (slice(None),)]
        return m

    eta_ax = sweep_iface(etas[axis])
    eta = eta_ax[..., ng - 1 : ng + n]  # eta stored at the cell's + face
    for p in range(cfg.ndim):
        if p == axis:
            continue
        ep = etas[p]
        # include each cell's own transverse eta and its negative-neighbour's
        ep_nm = jnp.concatenate(
            [ep.take(jnp.array([0]), axis=p), ep[
                tuple(slice(None) if a != p else slice(0, -1) for a in range(cfg.ndim))
            ]],
            axis=p,
        )
        m = jnp.maximum(ep, ep_nm)
        mm = sweep_iface(m)
        eta = jnp.maximum(eta, mm[..., ng - 1 : ng + n])  # cell cl
        eta = jnp.maximum(eta, mm[..., ng : ng + n + 1])  # cell cr
    return eta


def dynamics_dU(
    Ph_pad: jnp.ndarray,
    cfg: SimConfig,
    geom: Geometry,
    dt,
    order: int,
    ch=None,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """dt * (-div F + geometric/Powell/GLM sources) for all interior cells.

    ``Ph_pad`` is the primitive state padded with ``ng`` ghost cells on every
    axis (boundary conditions already applied).  ``order`` is the spatial
    order for this partial step (1 on the predictor half-step, cfg.ooa on the
    corrector — reference: time_integrator.cpp:151-243).

    Returns ``(dU, face_fluxes)`` where face_fluxes[axis] has the N+1
    interface fluxes along that axis (interior transverse extent), used by
    the nested-grid BC89 flux correction.
    """
    ng = cfg.ng
    dx = geom.dx
    glm = cfg.eqn is Eqn.GLM
    if glm and ch is None:
        # hyperbolic cleaning speed c_h = cfl*dx/t_dyn; the driver passes the
        # full-step value (reference: solver_eqn_mhd_adi.cpp:906-922 via
        # calc_timestep.cpp:112-139) so the half-step reuses it.
        ch = cfg.cfl * dx / dt

    etas = None
    if cfg.av in (AV.HCORR, AV.HCORR_FALLE):
        etas = calc_hcorr_eta(Ph_pad, cfg, geom, order)

    dU = None
    face_fluxes: List[jnp.ndarray] = []
    for axis in range(cfg.ndim):
        n = cfg.shape[axis]
        # interior on transverse axes only, then sweep axis last
        Pt = _interior(Ph_pad, cfg, skip_axis=axis)
        Pm = _move_axis_last(Pt, axis)
        Pl, Pr, slope_c = _reconstruct(Pm, cfg, geom, axis, order)

        perm = sweep_perm(cfg, axis)
        inv = inverse_perm(perm)
        Pl_r = Pl[perm]
        Pr_r = Pr[perm]

        hc_eta = None
        if etas is not None:
            hc_eta = _select_hcorr_eta(etas, cfg, axis, n)

        psistar = bxstar = None
        if glm:
            # Dedner 2x2 Riemann problem for (Bx, psi)
            # (reference: solver_eqn_mhd_adi.cpp:724-738)
            psistar = 0.5 * (Pl_r[SI] + Pr_r[SI] - (Pr_r[BX] - Pl_r[BX]))
            bxstar = 0.5 * (Pl_r[BX] + Pr_r[BX] - (Pr_r[SI] - Pl_r[SI]))
            Pl_r = Pl_r.at[SI].set(0.0).at[BX].set(bxstar)
            Pr_r = Pr_r.at[SI].set(0.0).at[BX].set(bxstar)

        flux_r, pstar = _riemann(Pl_r, Pr_r, cfg, dx / dt, hc_eta)

        if glm:
            # Mackey & Lim (2011) energy correction + Dedner fluxes
            # (reference: solver_eqn_mhd_adi.cpp:760-762)
            flux_r = flux_r.at[PG].add(ch * bxstar * psistar)
            flux_r = flux_r.at[BX].set(ch * psistar)
            flux_r = flux_r.at[SI].set(ch * bxstar)

        if cfg.av in (AV.FALLE, AV.HCORR_FALLE):
            flux_r = _av_falle(flux_r, Pl_r, Pr_r, pstar, cfg)

        # Tracer advection: upwind on the mass flux
        # (reference: solver_eqn_base.cpp:281-342)
        if cfg.ntracer:
            fm = flux_r[RO]
            tr = cfg.tracer_slice
            f_tr = jnp.where(fm > 0.0, Pl_r[tr] * fm, Pr_r[tr] * fm)
            f_tr = jnp.where(fm == 0.0, 0.0, f_tr)
            flux_r = flux_r.at[tr].set(f_tr)

        flux = flux_r[inv]
        face_fluxes.append(flux)

        # -div(F): per-axis divergence with metric coefficients
        # (reference: VectorOps.cpp:624-644, :1215-1244, VectorOps_spherical.cpp:449-484)
        g = geom.axes[axis]
        cn = jnp.asarray(g.div_cn)
        cp = jnp.asarray(g.div_cp)
        dudt = cn * flux[..., :-1] - cp * flux[..., 1:]

        Pc = Pm[..., ng : ng + n]  # interior cells, sweep axis last

        # Geometric source on the radial axis
        # (reference: solver_eqn_hydro_adi.cpp:560-707)
        if g.is_radial:
            k_norm = VX + (cfg.ndim - 1 - axis)
            pos_c = jnp.asarray(g.pos[ng : ng + n])
            com_c = jnp.asarray(g.com[ng : ng + n])
            from ..constants import Coord

            if cfg.coords is Coord.CYLINDRICAL:
                if order == 1:
                    src = Pc[PG] / pos_c
                else:
                    src = (Pc[PG] + (pos_c - com_c) * slope_c[PG]) / pos_c
            else:  # spherical; R3 = r + dr^2/(12 r)
                r3 = pos_c + dx * dx / 12.0 / pos_c
                if order == 1:
                    src = 2.0 * Pc[PG] / r3
                else:
                    src = 2.0 * ((Pc[PG] - slope_c[PG] * com_c) / r3 + slope_c[PG])
            dudt = dudt.at[k_norm].add(src)

        # Powell 8-wave source terms (MHD; reference:
        # solver_eqn_mhd_adi.cpp:396-443): dU_i -= (d<Bn>/dx) * S_i
        if cfg.eqn.is_mhd:
            k = cfg.ndim - 1 - axis
            bn = Pm[BX + k]  # sweep-normal B at cells, padded along sweep axis
            bm = 0.5 * (bn[..., ng - 1 : ng + n] + bn[..., ng : ng + n + 1])
            dbm = (bm[..., :-1] - bm[..., 1:]) / dx  # (bm_lo - bm_hi)/dx
            udotb = (
                Pc[VX] * Pc[BX] + Pc[VY] * Pc[BY] + Pc[VZ] * Pc[BZ]
            )
            dudt = dudt.at[VX].add(dbm * Pc[BX])
            dudt = dudt.at[VY].add(dbm * Pc[BY])
            dudt = dudt.at[VZ].add(dbm * Pc[BZ])
            dudt = dudt.at[PG].add(dbm * udotb)
            dudt = dudt.at[BX].add(dbm * Pc[VX])
            dudt = dudt.at[BY].add(dbm * Pc[VY])
            dudt = dudt.at[BZ].add(dbm * Pc[VZ])
            if glm:
                # GLM advective psi source (reference:
                # solver_eqn_mhd_adi.cpp:782-813)
                psi = Pm[SI]
                sm = 0.5 * (psi[..., ng - 1 : ng + n] + psi[..., ng : ng + n + 1])
                dsm = (sm[..., :-1] - sm[..., 1:]) / dx
                vn = Pc[VX + k]
                dudt = dudt.at[PG].add(dsm * vn * Pc[SI])
                dudt = dudt.at[SI].add(dsm * vn)

        contrib = _restore_axis(dt * dudt, axis)
        dU = contrib if dU is None else dU + contrib

    return dU, face_fluxes
