"""Fused Pallas MPv3 update kernel: ydot + Euler/backward-Euler ladder.

The XLA-level MPv3 path (mpv3.py) materializes a (Ncell, n_table) one-hot
matrix in HBM for every table lookup (~1.6 GB of traffic per ydot eval at
128^3) and compacts stiff cells through a ``jnp.nonzero`` gather whose
indices force replication under GSPMD.  Here the whole per-cell update —
rate-table interpolation, the ydot right-hand side, the forward-Euler step
and the backward-Euler Newton ladder — runs per VMEM tile inside one
``pl.pallas_call``:

  - Table interpolation is a hat-basis matmul on the MXU: the linear
    interpolation  (1-w)*tab[i] + w*tab[i+1]  is exactly  tab^T @ phi  with
    phi the piecewise-linear hat functions evaluated at the query point, so
    one (K, NT) x (NT, 128) matmul per sublane slice fetches every curve
    with no gather and no HBM one-hot (measured 0.04 ms for 2M cells x 10
    curves on v5e vs ~4 ms for the XLA one-hot).
  - The stiff ladder is PER TILE: each (8, 128)-cell tile derives its own
    substep count from its own max stiffness and iterates Newton to its own
    convergence, so quiescent tiles cost one ydot eval while I-front tiles
    pay the full ladder — the dense-grid equivalent of the reference's
    per-cell Euler-vs-CVODE branch (reference: MPv3.cpp:1146-1235), with
    no compaction gather at all (and therefore nothing that forces an
    all-gather when the grid is sharded: every tile is shard-local).
  - The Newton Jacobian uses ``jax.linearize`` on the in-kernel ydot —
    the same exact 2x2 Jacobian as the XLA path.

The kernel reuses the exact same rate tables and term assembly as
MPv3.ydot (reference: MPv3.cpp:1619-1936); both paths agree to float32
rounding (verified in interpret mode by tests/test_pallas_mpv3.py).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import K_B

TILE = 8          # sublane rows per tile (8 x 128 = 1024 cells)
LANES = 128


def supports(mp, rt: Dict, dtype) -> bool:
    """Kernel eligibility: f32 and a known rate model.  Multiple ionizing
    sources are handled by stacking per-source column planes (K static)."""
    if dtype != jnp.float32:
        return False
    return mp.mpc.ion_src in (None, "mono", "mfion")


def _hat_curves_T(Tc, tabT, invTr, g):
    """All 1D temperature curves for one (TILE, 128) block.

    Exact linear-in-T interpolation on the log-uniform grid
    T_r = exp(lnT0 + r*dlnT) (identical to the reference's table scheme,
    MPv3.cpp:1655-1676): per sublane slice s, build the hat matrix
    phi[r, l] = max(0, min((T/T_{r-1}-..), (T_{r+1}-T)/..)) and fetch all
    curves with one MXU matmul tabT @ phi.  ``invTr``: the (nt, 1)
    precomputed 1/T_r node column (a kernel input — recomputing the exps
    per tile dominated the eval cost)."""
    inv_gm1 = 1.0 / (g - 1.0)
    outs = []
    for s in range(TILE):
        u = Tc[s:s + 1, :] * invTr                      # (nt, 128) = T/T_r
        left = (u * g - 1.0) * inv_gm1
        right = (g - u) * inv_gm1
        phi = jnp.maximum(jnp.minimum(left, right), 0.0)
        outs.append(jnp.dot(tabT, phi, preferred_element_type=Tc.dtype))
    ncurve = tabT.shape[0]
    return [jnp.concatenate([o[k:k + 1, :] for o in outs], axis=0)
            for k in range(ncurve)]


def _hat_curves_f(f, tabT, ntau):
    """Curves interpolated linear-in-f on a uniform grid (the tau tables):
    phi[r] = max(0, 1 - |f - r|), exactly lo + clip(w,0,1)*(hi-lo) for
    f in range (f is pre-clipped by the log10(clip(tau)) mapping)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (ntau, LANES), 0).astype(f.dtype)
    outs = []
    for s in range(TILE):
        phi = jnp.maximum(1.0 - jnp.abs(f[s:s + 1, :] - r), 0.0)
        outs.append(jnp.dot(tabT, phi, preferred_element_type=f.dtype))
    ncurve = tabT.shape[0]
    return [jnp.concatenate([o[k:k + 1, :] for o in outs], axis=0)
            for k in range(ncurve)]


def _make_ydot_tile(mp, ion_mode: str, has_uv: bool):
    """Build the per-tile ydot closure (pure jnp on (TILE, 128) values).

    Mirrors MPv3.ydot term by term (reference: MPv3.cpp:1619-1936); the
    table data arrives as kernel refs read once per call."""
    from . import tables as TB
    from .mpv3 import E_EXCESS, E_MONO, MIN_NEUTRAL, SIGMA0

    c = mp.mpc
    nt = c.n_table
    lnT = float(np.log(c.min_temperature))
    dlnT = float(np.log(c.max_temperature / c.min_temperature) / (nt - 1))
    mono_frac = float(TB.hi_xsection_fractional(E_MONO))
    Z = c.metallicity
    LOGTEN = float(np.log(10.0))

    g = float(np.exp(dlnT))

    def rows(tau, tauT):
        """Photoion rate/heat/low-tau-slope curves at tau (4 rows)."""
        tmin, tmax = mp.tau_bounds
        lt = jnp.log10(jnp.clip(tau, tmin, tmax))
        f = (lt - mp._ltau0) * mp._inv_dltau
        vs = _hat_curves_f(f, tauT, mp._n_tau)
        return [jnp.exp(LOGTEN * v) for v in vs]

    def ydot(omx_in, Eint, nH, tau0, ds, nvsv, g0uv, g0ir, t1T, tauT,
             invTr, r0=None):
        # tau0/ds/nvsv: (K, tile...) per-source stacks; tauT: (K, 4, NTAU)
        omx = jnp.maximum(omx_in, MIN_NEUTRAL)
        x = 1.0 - omx
        T = (c.gamma - 1.0) * Eint / (
            K_B * (c.n_ion + c.n_elec * x) * nH)
        Tc = jnp.clip(T, c.min_temperature, c.max_temperature)
        expnh = jnp.exp(-nH / 1.0e4)
        ne = c.n_elec * x * nH + nH * 1.5e-4 * Z * expnh

        (cirh, C_cih0, rrhp, C_rrh, C_ffhe, C_cxh0, C_fbdn, C_cie,
         C_cxch, C_cxo) = _hat_curves_T(Tc, t1T, invTr, g)

        lnTc = jnp.log(Tc)
        sqT = jnp.sqrt(Tc)
        H_pah = 1.083e-25 * Z / (1.0 + 9.77e-3 * (sqT / ne) ** 0.73)
        C_pah = 3.02e-30 * Z * jnp.exp(
            0.94 * lnTc + 0.74 * Tc ** (-0.068) * jnp.log(3.4 * sqT / ne)
        ) * ne
        C_cxce = (1.4e-23 * Z * jnp.exp(-0.5 * lnTc - 92.0 / Tc)
                  * ne / (1.0 + 0.05 * ne * (Tc / 2000.0) ** (-0.37)))

        omx_dot = -cirh * ne * omx
        Edot = -C_cih0 * ne * omx

        nsrc = tau0.shape[0] if ion_mode in ("mono", "mfion") else 0
        for k in range(nsrc):
            tau0k, dsk, nvk = tau0[k], ds[k], nvsv[k]
            if ion_mode == "mono":
                dtau = nH * dsk * omx * SIGMA0 * mono_frac
                rate = nvk * jnp.exp(-tau0k * mono_frac)
                rate = rate * jnp.where(
                    dtau < 1.0e-4, dtau, 1.0 - jnp.exp(-dtau)) / nH
                omx_dot -= rate
                Edot += rate * E_EXCESS
            else:  # mfion
                dtau_cur = nH * dsk * omx * SIGMA0
                r0k = r0[k] if r0 is not None else rows(tau0k, tauT[k])
                r1 = rows(tau0k + dtau_cur, tauT[k])
                big = r0k[0] - r1[0]
                small = r0k[2] * dtau_cur / (SIGMA0 * nH)
                pir = jnp.where(dtau_cur < 0.01, small, big) * nvk / nH
                bigh = r0k[1] - r1[1]
                smallh = r0k[3] * dtau_cur / (SIGMA0 * nH)
                pih = jnp.where(dtau_cur < 0.01, smallh, bigh) * nvk / nH
                omx_dot -= pir
                Edot += pih

        omx_dot += rrhp * x * ne
        Edot -= C_rrh * x * ne
        Edot -= C_ffhe * x * ne
        Edot -= C_cxh0 * omx * ne

        if has_uv:
            Edot += 1.9e-26 * Z * g0uv / (1.0 + 6.4 * (g0uv / nH))
            Edot += 7.7e-32 * Z * g0ir / (1.0 + 3.0e4 / nH) ** 2

        Edot += 5.0e-28 * omx
        omx_dot -= 1.8e-17 * omx
        Edot += omx * H_pah

        fbdn = C_fbdn * x * ne
        cie = C_cie * x * x * nH + C_cxce
        Edot -= jnp.maximum(fbdn, cie)

        Edot -= C_cxch * nH * omx * expnh
        Edot -= C_cxo * nH * omx
        Edot -= C_pah

        Edot = Edot * nH
        Tmin = c.min_temperature
        cold = (Edot < 0.0) & (T < 2.0 * Tmin)
        Edot = jnp.where(
            cold, jnp.minimum(0.0, Edot * (T - Tmin) / Tmin), Edot)
        return omx_dot, Edot

    return ydot, rows


def _flatten_pad(a, n_pad, fill):
    f = a.ravel()
    n = f.shape[0]
    if n_pad > n:
        f = jnp.concatenate(
            [f, jnp.full((n_pad - n,), fill, dtype=f.dtype)])
    return f.reshape(n_pad // LANES, LANES)


def _rt_planes(mp, rt: Dict, shape, dtype, n_pad):
    """Extract the per-source rt fields as K-stacked padded planes + the
    K-stacked tau tables (reference: per-source Tau slots,
    rad_src_data.h:27-76).  Scalars are broadcast; padding uses benign
    values (tau=1e6, ds=0 -> zero photo rates in the pad lanes)."""
    c = mp.mpc
    z = jnp.zeros(shape, dtype=dtype)
    entries = rt.get("ion") if rt is not None else None
    if not entries:
        entries = (rt,) if rt is not None else ({},)

    def as_plane(v, fill):
        arr = jnp.asarray(v, dtype=dtype)
        if arr.ndim == 0:
            arr = jnp.broadcast_to(arr, shape)
        return _flatten_pad(arr, n_pad, fill)

    tau0s, dss, nvsvs, stacks = [], [], [], []
    for e in entries:
        tau0s.append(as_plane(e.get("tau0", z + 1.0e6), 1.0e6))
        dss.append(as_plane(e.get("ds", z), 0.0))
        if c.ion_src == "mono":
            nv = e.get("nv", None)
            if nv is None:
                nv = e["n_idot"] / e["vshell"]
            nvsvs.append(as_plane(nv, 0.0))
            stacks.append(jnp.zeros((4, 8), dtype=dtype))
        elif c.ion_src == "mfion":
            sv = e.get("sv", None)
            if sv is None:
                sv = jnp.exp(float(np.log(10.0)) * mp.rate_scale_log) \
                    / e["vshell"]
            nvsvs.append(as_plane(sv, 0.0))
            stack = e.get("tau_stack")
            if stack is None:
                stack = mp.tab["tau_stack"]
            stacks.append(jnp.asarray(stack, dtype=dtype).T)  # (4, NTAU)
        else:
            nvsvs.append(as_plane(z, 0.0))
            stacks.append(jnp.zeros((4, 8), dtype=dtype))
    tau0 = jnp.stack(tau0s)
    ds = jnp.stack(dss)
    nvsv = jnp.stack(nvsvs)
    taustack = jnp.stack(stacks)          # (K, 4, NTAU)
    g0uv = as_plane(rt.get("g0_uv", z) if rt else z, 0.0)
    g0ir = as_plane(rt.get("g0_ir", z) if rt else z, 0.0)
    return tau0, ds, nvsv, g0uv, g0ir, taustack


def _t1_tabT(mp, dtype):
    """(10, NT) transposed 1D-curve table (drop the T-grid column: the hat
    matmul interpolates directly)."""
    return jnp.asarray(np.asarray(mp.tab["t1_stack"]).T[1:], dtype=dtype)



def _invTr_col(mp, dtype):
    """(NT, 1) precomputed 1/T_r node column for the T-space hat build."""
    c = mp.mpc
    nt = c.n_table
    lnT = np.log(c.min_temperature)
    dlnT = np.log(c.max_temperature / c.min_temperature) / (nt - 1)
    return jnp.asarray(
        np.exp(-(lnT + np.arange(nt) * dlnT))[:, None], dtype=dtype)


# ---------------------------------------------------------------------------
# plain ydot (timescales + external callers)
# ---------------------------------------------------------------------------

def ydot_pallas(mp, omx, Eint, nH, rt: Dict, interpret: bool = False):
    """Full-grid ydot through the fused kernel; same signature semantics
    as MPv3.ydot (single-entry rt)."""
    c = mp.mpc
    shape = omx.shape
    dtype = omx.dtype
    n = int(np.prod(shape))
    n_pad = -(-n // (TILE * LANES)) * (TILE * LANES)
    ion_mode = c.ion_src or "none"
    has_uv = bool(c.n_diff_srcs)
    ydot_tile, _rows = _make_ydot_tile(mp, ion_mode, has_uv)

    o2 = _flatten_pad(omx, n_pad, 0.5)
    e2 = _flatten_pad(Eint, n_pad, 1.0)
    h2 = _flatten_pad(nH, n_pad, 1.0)
    tau0, ds, nvsv, g0uv, g0ir, taustack = _rt_planes(
        mp, rt, shape, dtype, n_pad)
    t1T = _t1_tabT(mp, dtype)
    invTr = _invTr_col(mp, dtype)

    def kernel(t1_ref, tau_ref, it_ref, o_ref, e_ref, h_ref, tau0_ref,
               ds_ref, nv_ref, guv_ref, gir_ref, do_ref, de_ref):
        f0, f1 = ydot_tile(o_ref[:], e_ref[:], h_ref[:], tau0_ref[:],
                           ds_ref[:], nv_ref[:], guv_ref[:], gir_ref[:],
                           t1_ref[:], tau_ref[:], it_ref[:])
        do_ref[:] = f0
        de_ref[:] = f1

    rows = n_pad // LANES
    grid = (rows // TILE,)
    K = tau0.shape[0]
    tile_spec = pl.BlockSpec((TILE, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    ktile_spec = pl.BlockSpec((K, TILE, LANES), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    full = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((rows, LANES), dtype),
                   jax.ShapeDtypeStruct((rows, LANES), dtype)),
        grid=grid,
        in_specs=[full(t1T.shape, lambda i: (0, 0)),
                  full(taustack.shape, lambda i: (0, 0, 0)),
                  full(invTr.shape, lambda i: (0, 0))]
        + [tile_spec] * 3 + [ktile_spec] * 3 + [tile_spec] * 2,
        out_specs=(tile_spec, tile_spec),
        interpret=interpret,
    )(t1T, taustack, invTr, o2, e2, h2, tau0, ds, nvsv, g0uv, g0ir)
    d_omx = out[0].ravel()[:n].reshape(shape)
    d_E = out[1].ravel()[:n].reshape(shape)
    return d_omx, d_E


# ---------------------------------------------------------------------------
# fused update: Euler + per-tile stiff BE-Newton ladder
# ---------------------------------------------------------------------------

def update_pallas(mp, omx0, Eint0, nH, dt, rt: Dict,
                  n_sub: int = 32, n_newton: int = 8,
                  interpret: bool = False, f0=None):
    """Advance (1-x, E) of every cell by dt: forward Euler below the
    EULER_CUTOFF, per-tile backward-Euler Newton ladder above it
    (reference: MPv3.cpp:1146-1235 + cvode_integrator.cpp).  Returns
    (omx1, E1).  The per-tile adaptive substep count mirrors the XLA
    path's stiffness heuristic but is evaluated per tile, which is closer
    to CVODE's per-cell adaptivity than the XLA path's global count."""
    from .mpv3 import EULER_CUTOFF, MIN_NEUTRAL

    c = mp.mpc
    shape = omx0.shape
    dtype = omx0.dtype
    n = int(np.prod(shape))
    n_pad = -(-n // (TILE * LANES)) * (TILE * LANES)
    ion_mode = c.ion_src or "none"
    has_uv = bool(c.n_diff_srcs)
    ydot_tile, rows_fn = _make_ydot_tile(mp, ion_mode, has_uv)
    tol = 1.0e-11 if dtype == jnp.float64 else 1.0e-6

    o2 = _flatten_pad(omx0, n_pad, 0.5)
    e2 = _flatten_pad(Eint0, n_pad, 1.0)
    h2 = _flatten_pad(nH, n_pad, 1.0)
    tau0, ds, nvsv, g0uv, g0ir, taustack = _rt_planes(
        mp, rt, shape, dtype, n_pad)
    t1T = _t1_tabT(mp, dtype)
    invTr = _invTr_col(mp, dtype)
    dt_arr = jnp.asarray([[dt]], dtype=dtype)
    have_f0 = f0 is not None
    if have_f0:
        f0o2 = _flatten_pad(f0[0].astype(dtype), n_pad, 0.0)
        f0e2 = _flatten_pad(f0[1].astype(dtype), n_pad, 0.0)

    def kernel(dt_ref, t1_ref, tau_ref, it_ref, o_ref, e_ref, h_ref,
               tau0_ref, ds_ref, nv_ref, guv_ref, gir_ref, *rest):
        if have_f0:
            f0o_ref, f0e_ref, oo_ref, eo_ref = rest
        else:
            oo_ref, eo_ref = rest
        dt_v = dt_ref[0, 0]
        omx = o_ref[:]
        E = e_ref[:]
        nHv = h_ref[:]
        tau0v = tau0_ref[:]
        dsv = ds_ref[:]
        nvv = nv_ref[:]
        guv = guv_ref[:]
        gir = gir_ref[:]
        t1 = t1_ref[:]
        taus = tau_ref[:]
        itr = it_ref[:]
        # tau0 is constant through the whole ladder: its 4-curve lookup is
        # hoisted out of every Newton/linearize evaluation (per source)
        r0 = ([rows_fn(tau0v[k], taus[k])
               for k in range(tau0v.shape[0])]
              if ion_mode == "mfion" else None)

        def rhs(o, e):
            return ydot_tile(o, e, nHv, tau0v, dsv, nvv, guv, gir, t1,
                             taus, itr, r0=r0)

        if have_f0:
            # first evaluation seeded by the caller (the dt-limit ydot on
            # the identical state/columns)
            f0v, f1v = f0o_ref[:], f0e_ref[:]
        else:
            f0v, f1v = rhs(omx, E)
        maxdelta = jnp.maximum(jnp.abs(f0v * dt_v / omx),
                               jnp.abs(f1v * dt_v / E))
        omx_eul = omx + dt_v * f0v
        E_eul = E + dt_v * f1v
        use_euler = maxdelta < EULER_CUTOFF
        stiffness = jnp.max(jnp.where(use_euler, 0.0, maxdelta))

        def newton_step(y, y_prev, h):
            o, e = y
            (g0f, g1f), lin = jax.linearize(rhs, o, e)
            one = jnp.ones_like(o)
            zero = jnp.zeros_like(o)
            (j00, j10) = lin(one, zero)
            (j01, j11) = lin(zero, one)
            g0 = o - y_prev[0] - h * g0f
            g1 = e - y_prev[1] - h * g1f
            a = 1.0 - h * j00
            b = -h * j01
            cc = -h * j10
            d = 1.0 - h * j11
            det = a * d - b * cc
            det = jnp.where(jnp.abs(det) > 1e-300, det, 1.0)
            d_o = (d * g0 - b * g1) / det
            d_e = (a * g1 - cc * g0) / det
            d_o = jnp.clip(d_o, -0.3, 0.3)
            d_e = jnp.clip(d_e, -0.6 * e, 0.6 * e)
            o_n = jnp.clip(o - d_o, MIN_NEUTRAL, 1.0 - MIN_NEUTRAL)
            e_n = jnp.maximum(e - d_e, 1.0e-10 * y_prev[1])
            return (o_n, e_n)

        def newton_converged(y, h):
            y_prev = y

            def cond(st):
                _y, i, err = st
                return (i < n_newton) & (err > tol)

            def body(st):
                y_c, i, _err = st
                y_n = newton_step(y_c, y_prev, h)
                err = jnp.maximum(
                    jnp.max(jnp.abs(y_n[0] - y_c[0])),
                    jnp.max(jnp.abs((y_n[1] - y_c[1])
                                    / jnp.maximum(y_c[1], 1e-300))))
                return (y_n, i + 1, err)

            y_out, _, _ = jax.lax.while_loop(
                cond, body,
                (y, jnp.int32(0), jnp.asarray(jnp.inf, dtype=dtype)))
            return y_out

        def run_ladder(_):
            n_eff = jnp.clip(jnp.ceil(4.0 * stiffness).astype(jnp.int32),
                             2, n_sub)
            h = dt_v / n_eff.astype(dtype)

            def substep(st):
                o, e, k = st
                o_n, e_n = newton_converged((o, e), h)
                return (o_n, e_n, k + 1)

            o1, e1, _ = jax.lax.while_loop(
                lambda st: st[2] < n_eff, substep,
                (omx, E, jnp.int32(0)))
            return o1, e1

        omx_st, E_st = jax.lax.cond(
            stiffness > 0.0, run_ladder, lambda _: (omx, E), 0)
        oo_ref[:] = jnp.where(use_euler, omx_eul, omx_st)
        eo_ref[:] = jnp.where(use_euler, E_eul, E_st)

    rows = n_pad // LANES
    grid = (rows // TILE,)
    tile_spec = pl.BlockSpec((TILE, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    full = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    args = [dt_arr, t1T, taustack, invTr, o2, e2, h2, tau0, ds, nvsv,
            g0uv, g0ir]
    K = tau0.shape[0]
    ktile_spec = pl.BlockSpec((K, TILE, LANES), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    post_specs = [tile_spec] * 2
    if have_f0:
        args += [f0o2, f0e2]
        post_specs += [tile_spec] * 2
    out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((rows, LANES), dtype),
                   jax.ShapeDtypeStruct((rows, LANES), dtype)),
        grid=grid,
        in_specs=[smem,
                  full(t1T.shape, lambda i: (0, 0)),
                  full(taustack.shape, lambda i: (0, 0, 0)),
                  full(invTr.shape, lambda i: (0, 0))]
        + [tile_spec] * 3 + [ktile_spec] * 3 + post_specs,
        out_specs=(tile_spec, tile_spec),
        interpret=interpret,
    )(*args)
    omx1 = out[0].ravel()[:n].reshape(shape)
    E1 = out[1].ravel()[:n].reshape(shape)
    return omx1, E1
