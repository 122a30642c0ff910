"""Fused Pallas sweep kernels (Cartesian + 2D cylindrical).

The XLA-level sweep (ops/sweep.py) materializes every pipeline stage —
slopes, edge states, the ~40 HLLD intermediates, fluxes — as full-grid HBM
arrays, so the step is HBM-bandwidth-bound far below roofline.  Here the
whole per-axis pipeline (MUSCL reconstruction -> sweep-frame rotation ->
GLM interface solve -> Riemann flux -> Falle AV -> tracer upwinding ->
flux divergence + Powell/GLM sources) runs per VMEM tile inside one
``pl.pallas_call``: one read of the state tile, one write of the dU tile,
nothing else touches HBM.

The tile math REUSES the same pure-jnp Riemann/eqns functions as the XLA
path (they trace into the kernel unchanged), so both paths are numerically
identical — verified by tests in interpret mode.

Scope: Cartesian grids and 2D cylindrical (axisymmetric; the radial axis
gets a geometry-pack input — com-spaced slopes, metric divergence and the
radial geometric sources), no H-correction (it needs cross-axis
stencils).  Everything else falls back to ops/sweep.py.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from ..constants import BX, PG, RO, SI, VX, AV, Coord, Eqn, Solver
from ..grid import Geometry
from .eqns import inverse_perm, sweep_perm
from .recon import van_albada

NG = 2  # ghost depth, matches SimConfig.ng
NSEG = 16  # sweep-axis segment length inside chunked kernels (VMEM knob;
            # 16 measured fastest at 128^3 on v5e, 128 OOMs scoped vmem)


def supports(cfg: SimConfig) -> bool:
    """Pallas fast-path eligibility (everything else -> XLA sweep)."""
    return (
        (cfg.coords is Coord.CARTESIAN
         or (cfg.coords is Coord.CYLINDRICAL and cfg.ndim == 2))
        and cfg.ndim >= 2
        and cfg.av in (AV.NONE, AV.FALLE)
        and cfg.solver in (Solver.HLL, Solver.HLLD, Solver.LINEAR,
                           Solver.RCV, Solver.RPV)
    )


def _radial_geo(cfg: SimConfig, geom: Geometry):
    """(6, npad) radial-axis geometry pack for the cylindrical kernel:
    rows = com, del_n, del_p, pos (padded) and div_cn, div_cp (interior,
    rows padded with 1/dx).  Passed as a kernel input (Pallas forbids
    captured constants)."""
    g = geom.axes[0]
    n = cfg.shape[0]
    npad = n + 2 * NG
    out = np.full((6, npad), 1.0 / geom.dx, dtype=cfg.np_dtype)
    out[0] = g.com
    out[1] = g.del_n
    out[2] = g.del_p
    out[3] = g.pos
    out[4, :n] = g.div_cn
    out[5, :n] = g.div_cp
    return jnp.asarray(out)


def _upd(A, updates):
    """Rebuild a channel-stacked array with some channels replaced.

    ``A.at[i].set`` / fancy channel gathers lower to scatters/gathers whose
    index arrays Pallas would have to capture as constants; a static stack
    of per-channel slices keeps the kernel free of captured arrays."""
    return jnp.stack([updates.get(i, A[i]) for i in range(A.shape[0])])


def _permute(A, perm):
    return jnp.stack([A[int(p)] for p in perm])


def _av_falle_tile(flux, Pl, Pr, pstar, cfg: SimConfig):
    """Falle AV with static channel updates (mirrors sweep._av_falle)."""
    from ..constants import BY, BZ, VY, VZ
    from .eqns import cfast_components, maxspeed

    if cfg.eqn is Eqn.EULER:
        pref = maxspeed(pstar, cfg) * cfg.etav * pstar[RO]
    else:
        pref = (cfast_components(
            0.5 * (Pl[RO] + Pr[RO]), 0.5 * (Pl[PG] + Pr[PG]),
            0.5 * (Pl[BX] + Pr[BX]), 0.5 * (Pl[BY] + Pr[BY]),
            0.5 * (Pl[BZ] + Pr[BZ]), cfg.gamma) * cfg.etav * pstar[RO])
    upd = {}
    erg = jnp.zeros_like(pref)
    for v in (VX, VY, VZ):
        mv = pref * (Pr[v] - Pl[v])
        upd[v] = flux[v] - mv
        erg = erg + mv * pstar[v]
    if cfg.eqn.is_mhd:
        prefb = pref / pstar[RO]
        for b in (BY, BZ):
            mv = prefb * (Pr[b] - Pl[b])
            upd[b] = flux[b] - mv
            erg = erg + mv * pstar[b]
    upd[PG] = flux[PG] - erg
    return _upd(flux, upd)


def _axis_tile_math(Pt, cfg: SimConfig, axis: int, order: int, dt, ch,
                    dx: float, cell_mask=None, spos: int = -2,
                    scma: bool = False, geo=None):
    """Per-tile sweep math with the sweep axis at position ``spos``.

    ``spos=-2``: ``Pt`` is (nvar, N+2*NG, L) — sweep axis in sublanes, a
    128-aligned transverse lane chunk last.  Keeping the padded sweep axis
    (length n+4 / n+1, never 128-aligned) out of the lane dimension roughly
    doubles VPU lane utilization vs a sweep-minor layout.

    ``spos=-3``: ``Pt`` is (nvar, N+2*NG, R, L) — sweep axis in the
    untiled third-from-last position, a full (sublane, lane) tile behind
    it; shifted slices along the sweep axis are then free (whole-tile row
    selects, no in-tile relayout).

    Returns the dU contribution (nvar, N, ...) = dt * (-dF/dx +
    Powell/GLM sources).  Identical formulas to ops/sweep.py's per-axis
    body.  ``geo`` (cylindrical radial sweep only, spos=-2): the
    (6, npad) geometry pack from ``_radial_geo`` — com-spaced slopes,
    metric divergence coefficients and the radial geometric sources
    (reference: cyl_FV_solver_*::geometric_source,
    solver_eqn_mhd_adi.cpp:1001-1215).
    """
    from .sweep import _riemann

    if spos == -2:
        def _s2(A, lo, hi):
            return A[..., lo:hi, :]
    else:
        def _s2(A, lo, hi):
            return A[..., lo:hi, :, :]

    nd = cfg.ndim
    n = Pt.shape[spos] - 2 * NG
    glm = cfg.eqn is Eqn.GLM

    hll_mask = None
    if cell_mask is not None:
        # interface uses HLL when either adjacent cell is flagged; deriving
        # it here from the cell mask (sliced exactly like Pl/Pr) avoids
        # three XLA interface-mask passes per partial update
        ml = _s2(cell_mask, NG - 1, NG + n)
        mr = _s2(cell_mask, NG, NG + n + 1)
        hll_mask = jnp.maximum(ml, mr) > 0.5

    slope_c = None
    if geo is not None:
        com = geo[0][:, None]
        deln = geo[1][:, None]
        delp = geo[2][:, None]
        pos = geo[3][:, None]
        cn = geo[4][:n][:, None]
        cp = geo[5][:n][:, None]
    if order == 1:
        Pl = _s2(Pt, NG - 1, NG + n)
        Pr = _s2(Pt, NG, NG + n + 1)
        if geo is not None:
            slope_c = jnp.zeros_like(_s2(Pt, NG, NG + n))
    elif geo is not None:
        # slopes on centre-of-volume spacing, edge states at face-offsets
        # from the com (reference: VectorOps.h:414-419; sweep._reconstruct)
        d = _s2(Pt, 1, None) - _s2(Pt, 0, -1)
        h = com[1:] - com[:-1]
        one_sided = d / h
        slopes = van_albada(_s2(one_sided, 0, -1), _s2(one_sided, 1, None))
        cells = _s2(Pt, 1, -1)
        lo = cells + slopes * deln[1:-1]
        hi = cells + slopes * delp[1:-1]
        Pl = _s2(hi, NG - 2, NG + n - 1)
        Pr = _s2(lo, NG - 1, NG + n)
        slope_c = _s2(slopes, NG - 1, NG + n - 1)
    else:
        d = (_s2(Pt, 1, None) - _s2(Pt, 0, -1)) / dx
        slopes = van_albada(_s2(d, 0, -1), _s2(d, 1, None))
        cells = _s2(Pt, 1, -1)
        lo = cells - slopes * (0.5 * dx)
        hi = cells + slopes * (0.5 * dx)
        Pl = _s2(hi, NG - 2, NG + n - 1)
        Pr = _s2(lo, NG - 1, NG + n)

    perm = sweep_perm(cfg, axis)
    inv = inverse_perm(perm)
    Pl_r = _permute(Pl, perm)
    Pr_r = _permute(Pr, perm)

    psistar = bxstar = None
    if glm:
        psistar = 0.5 * (Pl_r[SI] + Pr_r[SI] - (Pr_r[BX] - Pl_r[BX]))
        bxstar = 0.5 * (Pl_r[BX] + Pr_r[BX] - (Pr_r[SI] - Pl_r[SI]))
        zero = jnp.zeros_like(bxstar)
        Pl_r = _upd(Pl_r, {SI: zero, BX: bxstar})
        Pr_r = _upd(Pr_r, {SI: zero, BX: bxstar})

    if cfg.eqn.is_mhd:
        # Slim star state: Falle AV for MHD reads only rho, v, B_t of the
        # interface state (never its pressure), so skip the full
        # cons_to_prim of ustar that _riemann does — the energy->pressure
        # conversion plus floor recovery is ~10% of the kernel's VPU work.
        from . import riemann_mhd as rm
        from ..constants import VY, VZ

        if cfg.solver is Solver.HLLD:
            flux_r, ustar = rm.hlld_with_hll_fallback(
                Pl_r, Pr_r, cfg, hll_mask)
        elif cfg.solver is Solver.HLL:
            flux_r, ustar = rm.hll(Pl_r, Pr_r, cfg)
        elif cfg.solver is Solver.RCV:
            flux_r, ustar = rm.roe_cv(Pl_r, Pr_r, cfg, None)
        else:
            flux_r, ustar = rm.linear(Pl_r, Pr_r, cfg)
        if cfg.av is AV.FALLE:
            # floor the mid-state density like cons_to_prim does on the XLA
            # path (near-vacuum f32 states otherwise give inf velocities)
            from .eqns import BASE_RHO

            rho_s = jnp.where(ustar[RO] > 0.0, ustar[RO],
                              BASE_RHO * cfg.rho_ref)
            inv_rho = 1.0 / rho_s
            pstar = _upd(ustar, {RO: rho_s,
                                 VX: ustar[VX] * inv_rho,
                                 VY: ustar[VY] * inv_rho,
                                 VZ: ustar[VZ] * inv_rho})
        else:
            pstar = None
    else:
        flux_r, pstar = _riemann(Pl_r, Pr_r, cfg, dx / dt, None,
                                 hll_mask=hll_mask)

    if glm:
        flux_r = _upd(flux_r, {
            PG: flux_r[PG] + ch * bxstar * psistar,
            BX: ch * psistar,
            SI: ch * bxstar,
        })

    if cfg.av is AV.FALLE:
        flux_r = _av_falle_tile(flux_r, Pl_r, Pr_r, pstar, cfg)

    if cfg.ntracer:
        fm = flux_r[RO]
        upd = {}
        el = tuple(scma) if isinstance(scma, (tuple, list)) else ()
        fac_l = fac_r = None
        if el:
            sl = sr = None
            for e in el:
                vl = jnp.clip(Pl_r[e], 0.0, 1.0)
                vr = jnp.clip(Pr_r[e], 0.0, 1.0)
                sl = vl if sl is None else sl + vl
                sr = vr if sr is None else sr + vr
            fac_l = 1.0 / jnp.maximum(sl, 1.0e-30)
            fac_r = 1.0 / jnp.maximum(sr, 1.0e-30)
        for v in range(cfg.eqn.nbase, cfg.nvar):
            pl_t, pr_t = Pl_r[v], Pr_r[v]
            if scma:
                # sCMA corrector: advected tracer clamped to <=1 when a
                # microphysics module owns the tracers (see sweep.py);
                # declared element tracers additionally renormalized to
                # sum to 1 (microphysics_base.cpp:96-118)
                pl_t = jnp.minimum(pl_t, 1.0)
                pr_t = jnp.minimum(pr_t, 1.0)
                if v in el:
                    pl_t = pl_t * fac_l
                    pr_t = pr_t * fac_r
            f_tr = jnp.where(fm > 0.0, pl_t * fm, pr_t * fm)
            upd[v] = jnp.where(fm == 0.0, 0.0, f_tr)
        flux_r = _upd(flux_r, upd)

    flux = _permute(flux_r, inv)
    if geo is not None:
        dudt = cn * _s2(flux, 0, -1) - cp * _s2(flux, 1, None)
    else:
        dudt = (_s2(flux, 0, -1) - _s2(flux, 1, None)) / dx

    Pc = _s2(Pt, NG, NG + n)
    if geo is not None:
        # radial geometric sources (2D cylindrical, axis 0 -> normal
        # velocity/B indices VY/BY; reference:
        # solver_eqn_hydro_adi.cpp:560-707, solver_eqn_mhd_adi.cpp:
        # 1001-1030,1180-1215)
        from ..constants import BY, BZ, VY, VZ

        pos_c = pos[NG:NG + n]
        com_c = com[NG:NG + n]
        k_norm = VX + (nd - 1 - axis)
        if cfg.eqn.is_mhd:
            pm = 0.5 * (Pc[BX] ** 2 + Pc[BY] ** 2 + Pc[BZ] ** 2)
            if order == 1:
                src = (Pc[PG] + pm) / pos_c
            else:
                corr = (slope_c[PG] + Pc[BX] * slope_c[BX]
                        + Pc[BY] * slope_c[BY] + Pc[BZ] * slope_c[BZ])
                src = (Pc[PG] + pm + (pos_c - com_c) * corr) / pos_c
        elif order == 1:
            src = Pc[PG] / pos_c
        else:
            src = (Pc[PG] + (pos_c - com_c) * slope_c[PG]) / pos_c
        dudt = _upd(dudt, {k_norm: dudt[k_norm] + src})
        if glm:
            kb = BX + (nd - 1 - axis)
            if order == 1:
                sb = ch * Pc[SI] / pos_c
            else:
                sb = ch * (Pc[SI] + (pos_c - com_c) * slope_c[SI]) / pos_c
            dudt = _upd(dudt, {kb: dudt[kb] + sb})
    if cfg.eqn.is_mhd:
        from ..constants import BY, BZ, VY, VZ

        k = nd - 1 - axis
        bn = Pt[BX + k]
        bm = 0.5 * (_s2(bn, NG - 1, NG + n) + _s2(bn, NG, NG + n + 1))
        if geo is not None:
            # cylindrical radial divergence factors (reference:
            # cyl_FV_solver_mhd_ideal_adi::MHDsource Rcyl branch,
            # solver_eqn_mhd_adi.cpp:1092-1103)
            dbm = cn * _s2(bm, 0, -1) - cp * _s2(bm, 1, None)
        else:
            dbm = (_s2(bm, 0, -1) - _s2(bm, 1, None)) / dx
        udotb = Pc[VX] * Pc[BX] + Pc[VY] * Pc[BY] + Pc[VZ] * Pc[BZ]
        upd = {
            VX: dudt[VX] + dbm * Pc[BX],
            VY: dudt[VY] + dbm * Pc[BY],
            VZ: dudt[VZ] + dbm * Pc[BZ],
            BX: dudt[BX] + dbm * Pc[VX],
            BY: dudt[BY] + dbm * Pc[VY],
            BZ: dudt[BZ] + dbm * Pc[VZ],
        }
        pg_new = dudt[PG] + dbm * udotb
        if glm:
            psi = Pt[SI]
            sm = 0.5 * (_s2(psi, NG - 1, NG + n) + _s2(psi, NG, NG + n + 1))
            dsm = (_s2(sm, 0, -1) - _s2(sm, 1, None)) / dx
            vn = Pc[VX + k]
            pg_new = pg_new + dsm * vn * Pc[SI]
            upd[SI] = dudt[SI] + dsm * vn
        upd[PG] = pg_new
        dudt = _upd(dudt, upd)

    return dt * dudt


def _pick_rows(n: int) -> int:
    for b in (8, 4, 2, 1):
        if n % b == 0:
            return b
    return 1


def _pick_lanes(n: int) -> int:
    for b in (256, 128, 64, 32):
        if n % b == 0:
            return b
    return n


def _sweep_axis_pallas(Pt, cfg: SimConfig, axis: int, order: int, dt, ch,
                       dx: float, interpret: bool, mask=None,
                       scma: bool = False, geo_arr=None):
    """Launch the fused kernel for one axis.  ``Pt`` is padded along the
    sweep axis only (interior on transverse axes).  ``mask`` (optional,
    HLLD->HLL fallback) is the per-CELL strong-compression flag as float,
    laid out exactly like ``Pt`` with a leading singleton channel dim; the
    interface mask is derived in-kernel.

    Every tile is brought to the (nvar, npad, lanes) layout — sweep axis in
    sublanes, a 128-aligned transverse chunk in lanes.  Only the minor-axis
    (x) sweep needs an in-tile transpose for that; y/z sweeps slice it
    directly from the natural layout.
    """
    nvar = cfg.nvar
    nd = cfg.ndim
    n = cfg.shape[axis]
    npad = n + 2 * NG
    dt = jnp.asarray(dt, Pt.dtype)
    ch_v = jnp.asarray(0.0 if ch is None else ch, Pt.dtype)
    has_mask = mask is not None

    has_geo = geo_arr is not None

    def kernel(*refs, transpose: bool, chunked: bool = False):
        refs = list(refs)
        dt_ref = refs.pop(0)
        ch_ref = refs.pop(0)
        p_ref = refs.pop(0)
        m_ref = refs.pop(0) if has_mask else None
        g_ref = refs.pop(0) if has_geo else None
        o_ref = refs.pop(0)
        geo_k = g_ref[...] if g_ref is not None else None
        dt_k = dt_ref[0]
        ch_k = ch_ref[0]
        if chunked:
            # 3D z sweep: block (nvar, npad, by, bx) — sweep axis at the
            # untiled -3 position (free shifted slices), batched over a
            # full (by, bx) tile.  Segment the sweep axis so only one
            # segment's Riemann intermediates are live in VMEM; segments
            # overlap by the 3-cell interface stencil.
            npad_k = p_ref.shape[1]
            nseg = NSEG
            n_int = npad_k - 2 * NG
            for s0 in range(0, n_int, nseg):
                s1 = min(s0 + nseg, n_int)
                sub = p_ref[:, s0 : s1 + 2 * NG, :, :]
                m = None
                if m_ref is not None:
                    m = m_ref[0, s0 : s1 + 2 * NG, :, :]
                out = _axis_tile_math(sub, cfg, axis, order, dt_k, ch_k,
                                      dx, cell_mask=m, spos=-3, scma=scma)
                o_ref[:, s0:s1, :, :] = out
            return
        # squeeze any singleton block dims -> (nvar, a, b)
        sub = p_ref[...].reshape((nvar,) + tuple(
            s for s in p_ref.shape[1:] if s != 1))
        m = None
        if m_ref is not None:
            m = m_ref[...].reshape(tuple(
                s for s in m_ref.shape[1:] if s != 1))
        if transpose:
            sub = jnp.swapaxes(sub, -1, -2)            # (nvar, npad, bl)
            if m is not None:
                m = jnp.swapaxes(m, -1, -2)
        out = _axis_tile_math(sub, cfg, axis, order, dt_k, ch_k, dx,
                              cell_mask=m, scma=scma, geo=geo_k)
        if transpose:
            out = jnp.swapaxes(out, -1, -2)            # (nvar, bl, n)
        o_ref[...] = out.reshape(o_ref.shape)

    ni = n + 1
    if nd == 2:
        ny, nx = cfg.shape
        if axis == 1:  # x sweep: Pt (nvar, ny, nx+4); lanes = y chunk
            bl = _pick_lanes(ny)
            grid = (ny // bl,)
            in_spec = pl.BlockSpec((nvar, bl, npad), lambda i: (0, i, 0))
            m_spec = pl.BlockSpec((1, bl, npad), lambda i: (0, i, 0))
            out_spec = pl.BlockSpec((nvar, bl, n), lambda i: (0, i, 0))
            out_shape = jax.ShapeDtypeStruct((nvar, ny, n), Pt.dtype)
            kfn = partial(kernel, transpose=True)
        else:          # y sweep: Pt (nvar, ny+4, nx)
            bx = _pick_lanes(nx)
            grid = (nx // bx,)
            in_spec = pl.BlockSpec((nvar, npad, bx), lambda i: (0, 0, i))
            m_spec = pl.BlockSpec((1, npad, bx), lambda i: (0, 0, i))
            out_spec = pl.BlockSpec((nvar, n, bx), lambda i: (0, 0, i))
            out_shape = jax.ShapeDtypeStruct((nvar, n, nx), Pt.dtype)
            kfn = partial(kernel, transpose=False)
    else:
        nz, ny, nx = cfg.shape
        if axis == 2:  # x sweep: Pt (nvar, nz, ny, nx+4); lanes = y chunk
            bl = _pick_lanes(ny)
            grid = (nz, ny // bl)
            in_spec = pl.BlockSpec((nvar, 1, bl, npad),
                                   lambda i, j: (0, i, j, 0))
            m_spec = pl.BlockSpec((1, 1, bl, npad), lambda i, j: (0, i, j, 0))
            out_spec = pl.BlockSpec((nvar, 1, bl, n),
                                    lambda i, j: (0, i, j, 0))
            out_shape = jax.ShapeDtypeStruct((nvar, nz, ny, n), Pt.dtype)
            kfn = partial(kernel, transpose=True)
        elif axis == 1:  # y sweep: Pt (nvar, nz, ny+4, nx)
            bx = _pick_lanes(nx)
            grid = (nz, nx // bx)
            in_spec = pl.BlockSpec((nvar, 1, npad, bx),
                                   lambda i, j: (0, i, 0, j))
            m_spec = pl.BlockSpec((1, 1, npad, bx), lambda i, j: (0, i, 0, j))
            out_spec = pl.BlockSpec((nvar, 1, n, bx),
                                    lambda i, j: (0, i, 0, j))
            out_shape = jax.ShapeDtypeStruct((nvar, nz, n, nx), Pt.dtype)
            kfn = partial(kernel, transpose=False)
        else:          # z sweep: Pt (nvar, nz+4, ny, nx)
            bx = _pick_lanes(nx)
            by = _pick_rows(ny)  # second-to-last block dim must be 8-aligned
            grid = (ny // by, nx // bx)
            in_spec = pl.BlockSpec((nvar, npad, by, bx),
                                   lambda i, j: (0, 0, i, j))
            m_spec = pl.BlockSpec((1, npad, by, bx), lambda i, j: (0, 0, i, j))
            out_spec = pl.BlockSpec((nvar, n, by, bx),
                                    lambda i, j: (0, 0, i, j))
            out_shape = jax.ShapeDtypeStruct((nvar, n, ny, nx), Pt.dtype)
            kfn = partial(kernel, transpose=False, chunked=True)

    dt_a = dt.reshape(1)
    ch_a = ch_v.reshape(1)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    kwargs = {}
    if not interpret:
        # the HLLD pipeline keeps ~25 live interface arrays per tile; raise
        # the scoped-VMEM budget above the 16 MiB default (v5e has 128 MiB)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    specs = [smem, smem, in_spec] + ([m_spec] if has_mask else [])
    args = [dt_a, ch_a, Pt] + ([mask] if has_mask else [])
    if geo_arr is not None:
        ngr = len(grid)
        specs.append(pl.BlockSpec(geo_arr.shape,
                                  (lambda i: (0, 0)) if ngr == 1
                                  else (lambda i, j: (0, 0))))
        args.append(geo_arr)
    return pl.pallas_call(
        kfn,
        grid=grid,
        in_specs=specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(*args)


def _final_axis_pallas(Pt, cfg: SimConfig, order: int, dt, ch, dx: float,
                       interpret: bool, P_int, contribs, mask=None,
                       geo_arr=None):
    """Fused final sweep for axis 0: computes this axis's dU per segment,
    adds the other axes' contributions and the base state's conserved
    vector, applies the floors of ``cons_to_prim`` and the GLM parabolic
    psi damping, and writes the advanced primitive state — one kernel
    instead of (sweep + two dU adds + cell_advance + psi damp) XLA passes
    (reference: time_integrator.cpp:881-940 grid_update_state_vector +
    eqns_mhd_adiabatic.cpp:651-660 GLMsource).

    ``P_int``: base state P (interior shape).  ``contribs``: list of dU
    arrays (interior shape) from the other axes.  Returns P-new (interior).
    """
    from .eqns import cons_to_prim, prim_to_cons

    nvar = cfg.nvar
    nd = cfg.ndim
    axis = 0
    n = cfg.shape[axis]
    npad = n + 2 * NG
    dt = jnp.asarray(dt, Pt.dtype)
    ch_v = jnp.asarray(0.0 if ch is None else ch, Pt.dtype)
    has_mask = mask is not None
    glm = cfg.eqn is Eqn.GLM
    cr = cfg.glm_cr_factor / dx
    nc = len(contribs)

    has_geo = geo_arr is not None

    def kernel(*refs, chunked: bool):
        dt_ref, ch_ref = refs[0], refs[1]
        p_ref = refs[2]
        k = 3
        m_ref = None
        if has_mask:
            m_ref = refs[k]
            k += 1
        g_ref = None
        if has_geo:
            g_ref = refs[k]
            k += 1
        geo_k = g_ref[...] if g_ref is not None else None
        pint_ref = refs[k]
        c_refs = refs[k + 1 : k + 1 + nc]
        o_ref = refs[-1]
        dt_k = dt_ref[0]
        ch_k = ch_ref[0]
        damp = jnp.exp(-dt_k * ch_k * jnp.asarray(cr, Pt.dtype))

        def finish(s0, s1, dU_seg, sl):
            U = prim_to_cons(pint_ref[sl], cfg) + dU_seg
            for c in c_refs:
                U = U + c[sl]
            Pn = cons_to_prim(U, cfg)
            if glm:
                Pn = _upd(Pn, {SI: Pn[SI] * damp})
            o_ref[sl] = Pn

        if chunked:
            nseg = NSEG
            for s0 in range(0, n, nseg):
                s1 = min(s0 + nseg, n)
                sub = p_ref[:, s0 : s1 + 2 * NG, :, :]
                m = None
                if m_ref is not None:
                    m = m_ref[0, s0 : s1 + 2 * NG, :, :]
                dU_seg = _axis_tile_math(sub, cfg, axis, order, dt_k, ch_k,
                                         dx, cell_mask=m, spos=-3)
                finish(s0, s1, dU_seg, (slice(None), slice(s0, s1)))
        else:
            sub = p_ref[...].reshape((nvar,) + tuple(
                s for s in p_ref.shape[1:] if s != 1))
            m = None
            if m_ref is not None:
                m = m_ref[...].reshape(tuple(
                    s for s in m_ref.shape[1:] if s != 1))
            dU = _axis_tile_math(sub, cfg, axis, order, dt_k, ch_k, dx,
                                 cell_mask=m, geo=geo_k)
            finish(0, n, dU, (slice(None), slice(None)))

    if nd == 2:
        ny, nx = cfg.shape
        bx = _pick_lanes(nx)
        grid = (nx // bx,)
        in_spec = pl.BlockSpec((nvar, npad, bx), lambda i: (0, 0, i))
        m_spec = pl.BlockSpec((1, npad, bx), lambda i: (0, 0, i))
        int_spec = pl.BlockSpec((nvar, n, bx), lambda i: (0, 0, i))
        out_shape = jax.ShapeDtypeStruct((nvar, n, nx), Pt.dtype)
        kfn = partial(kernel, chunked=False)
    else:
        nz, ny, nx = cfg.shape
        bx = _pick_lanes(nx)
        by = _pick_rows(ny)
        grid = (ny // by, nx // bx)
        in_spec = pl.BlockSpec((nvar, npad, by, bx), lambda i, j: (0, 0, i, j))
        m_spec = pl.BlockSpec((1, npad, by, bx), lambda i, j: (0, 0, i, j))
        int_spec = pl.BlockSpec((nvar, n, by, bx), lambda i, j: (0, 0, i, j))
        out_shape = jax.ShapeDtypeStruct((nvar, n, ny, nx), Pt.dtype)
        kfn = partial(kernel, chunked=True)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    geo_specs = []
    geo_args = []
    if geo_arr is not None:
        ngr = len(grid)
        geo_specs = [pl.BlockSpec(geo_arr.shape,
                                  (lambda i: (0, 0)) if ngr == 1
                                  else (lambda i, j: (0, 0)))]
        geo_args = [geo_arr]
    specs = [smem, smem, in_spec] + ([m_spec] if has_mask else []) \
        + geo_specs + [int_spec] * (1 + nc)
    args = [dt.reshape(1), ch_v.reshape(1), Pt] \
        + ([mask] if has_mask else []) + geo_args + [P_int] + list(contribs)
    return pl.pallas_call(
        kfn,
        grid=grid,
        in_specs=specs,
        out_specs=int_spec,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(*args)


def advance_dynamics_pallas(
    P: jnp.ndarray,
    Ph_pad: jnp.ndarray,
    cfg: SimConfig,
    geom: Geometry,
    dt,
    order: int,
    ch=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused pure-dynamics partial update: P + dt*dU[Ph] -> P-new.

    Transverse-axis contributions run as the usual sweep kernels; the
    axis-0 kernel also applies the conserved update, floors and GLM psi
    damping (see ``_final_axis_pallas``).  Only valid when no microphysics
    or conduction term joins the update (the stepper falls back to the
    composed path otherwise)."""
    from .sweep import _interior, _slab, hlld_fallback_cells

    assert supports(cfg)
    dx = geom.dx
    nd = cfg.ndim
    ng = NG
    if cfg.eqn is Eqn.GLM and ch is None:
        ch = cfg.cfl * dx / dt

    strong = None
    if (cfg.solver is Solver.HLLD and cfg.eqn.is_mhd
            and cfg.hlld_fallback):
        strong = hlld_fallback_cells(Ph_pad, cfg, dx).astype(Ph_pad.dtype)

    def axis_mask(axis):
        # per-cell flag, sliced like the state tile (interface max taken
        # in-kernel)
        if strong is None:
            return None
        return _interior(strong[None], cfg, skip_axis=axis)

    geo0 = (_radial_geo(cfg, geom)
            if cfg.coords is Coord.CYLINDRICAL else None)
    contribs = []
    for axis in range(1, nd):
        Pt = _interior(Ph_pad, cfg, skip_axis=axis)
        contribs.append(_sweep_axis_pallas(
            Pt, cfg, axis, order, dt, ch, dx, interpret,
            mask=axis_mask(axis)))
    Pt0 = _interior(Ph_pad, cfg, skip_axis=0)
    return _final_axis_pallas(Pt0, cfg, order, dt, ch, dx, interpret,
                              P, contribs, mask=axis_mask(0), geo_arr=geo0)


def dynamics_dU_pallas(
    Ph_pad: jnp.ndarray,
    cfg: SimConfig,
    geom: Geometry,
    dt,
    order: int,
    ch=None,
    interpret: bool = False,
    scma: bool = False,
) -> jnp.ndarray:
    """Fused-path dU (no face-flux output; NG hierarchies use the XLA path)."""
    from .sweep import _interior, _slab, hlld_fallback_cells

    assert supports(cfg)
    dx = geom.dx
    nd = cfg.ndim
    ng = NG
    if cfg.eqn is Eqn.GLM and ch is None:
        ch = cfg.cfl * dx / dt

    strong = None
    if (cfg.solver is Solver.HLLD and cfg.eqn.is_mhd
            and cfg.hlld_fallback):
        strong = hlld_fallback_cells(Ph_pad, cfg, dx).astype(Ph_pad.dtype)

    dU = None
    for axis in range(nd):
        Pt = _interior(Ph_pad, cfg, skip_axis=axis)
        mask = None
        if strong is not None:
            mask = _interior(strong[None], cfg, skip_axis=axis)
        geo_a = (_radial_geo(cfg, geom)
                 if cfg.coords is Coord.CYLINDRICAL and axis == 0 else None)
        contrib = _sweep_axis_pallas(Pt, cfg, axis, order, dt, ch, dx,
                                     interpret, mask=mask, scma=scma,
                                     geo_arr=geo_a)
        dU = contrib if dU is None else dU + contrib
    return dU
