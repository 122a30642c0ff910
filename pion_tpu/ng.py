"""Static nested-grid (NG) refinement with Berger-Colella flux correction.

TPU-native re-derivation of the reference NG machinery
(reference: source/sim_control/sim_control_NG.cpp:564-810 recursive
advance_step_OA1/OA2; source/boundaries/NG_coarse_to_fine_boundaries.cpp
slope-limited prolongation; NG_fine_to_coarse_boundaries.cpp:185-320
volume-weighted conserved restriction; NG_BC89flux.cpp Berger & Colella
1989 flux summation).

Structure: a stack of co-centred levels, each 2x finer with the SAME cell
count, advanced depth-first with two fine steps per coarse step.  Each level
is a dense array + per-level geometry; C2F ghost filling is a static-index
gather + limited-slope prolongation, F2C is a conservative 2^ndim average,
and BC89 replaces the coarse flux at fine-boundary faces with the
time-averaged sum of fine fluxes.  The level recursion is a host-side Python
loop over per-level jitted update functions (the 2:1 ratio makes the
schedule static — SURVEY.md §7).

Round-1 scope: Cartesian co-centred levels (the common production layout,
e.g. Ostar3D); curvilinear NG and per-level raytracing are TODO(parity).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .boundaries import BoundaryData, apply_bcs, make_fixed_strips
from .config import SimConfig
from .constants import Eqn
from .grid import Geometry, make_geometry
from .ops.eqns import cons_to_prim, prim_to_cons
from .ops.recon import van_albada
from .ops.sweep import dynamics_dU
from .ops.timestep import dynamics_dt
from .stepper import cell_advance, glm_psi_damp


def make_level_cfg(cfg0: SimConfig, level: int) -> SimConfig:
    """Level-l config: same shape, domain shrunk 2^l about the grid center
    (reference: sim_params.h:173-190 'class level' extents)."""
    if level == 0:
        return cfg0
    center = [0.5 * (lo + hi) for lo, hi in zip(cfg0.xmin, cfg0.xmax)]
    half = [(hi - lo) / 2.0 ** (level + 1)
            for lo, hi in zip(cfg0.xmin, cfg0.xmax)]
    xmin = tuple(c - h for c, h in zip(center, half))
    xmax = tuple(c + h for c, h in zip(center, half))
    # interior faces are filled from the parent (C2F); reuse the domain BC
    # types but they are overridden by prolongation in _pad_level
    return cfg0.with_(xmin=xmin, xmax=xmax)


class NGHierarchy:
    """Holds per-level state and advances the stack recursively."""

    def __init__(self, cfg0: SimConfig, n_levels: int,
                 states: Optional[List[jnp.ndarray]] = None,
                 physics=None):
        assert all(n % 4 == 0 for n in cfg0.shape), \
            "NG co-centred nesting needs cell counts divisible by 4"
        self.n_levels = n_levels
        self.cfgs = [make_level_cfg(cfg0, l) for l in range(n_levels)]
        self.geoms = [make_geometry(c) for c in self.cfgs]
        self.physics = physics
        if physics is not None:
            # one Physics clone per level: same chemistry/sources, per-level
            # tracer geometry + wind masks (reference: sim_control_NG.cpp:138
            # setup_raytracing per level; RT_all_sources_levels :945-1011)
            self.phys = [physics.for_level(self.cfgs[l], self.geoms[l])
                         for l in range(n_levels)]
            for p in (physics.sources or []):
                if not p.at_infinity:
                    fine = self.cfgs[-1]
                    inside = all(fine.xmin[a] <= p.position[a] <= fine.xmax[a]
                                 for a in range(fine.ndim))
                    assert inside, (
                        "point radiation sources must lie inside the finest "
                        "level (reference production configs do; off-grid "
                        "point-source tracing is do_offgrid_raytracing, "
                        "disabled upstream too: sim_control_NG.cpp:959-969)")
        else:
            self.phys = [None] * n_levels
        if states is not None:
            self.P = list(states)
        else:
            self.P = [None] * n_levels
        self.bdata = None
        self.t = 0.0
        self.step_count = 0
        self.last_dt = 0.0
        self._jit_cache = {}

    def set_states(self, states):
        self.P = list(states)
        self.bdata = make_fixed_strips(np.asarray(self.P[0]), self.cfgs[0])
        for l in range(self.n_levels):
            if self.phys[l] is not None and self.phys[l].winds:
                self.P[l] = self.phys[l].apply_internal_bcs(self.P[l], self.t)

    # -- C2F prolongation --------------------------------------------------
    def _prolong_padded(self, Pc, level: int):
        """Fill the fine level's padded array from the parent: each fine
        cell (incl. ghosts) takes parent value + limited slope * offset
        (reference: NG_coarse_to_fine_boundaries.cpp:406-578
        interpolate_coarse2fine with AvgFalle slopes)."""
        cfg_f = self.cfgs[level]
        nd = cfg_f.ndim
        ng = cfg_f.ng
        # parent index of each fine padded cell per axis: fine domain covers
        # parent cells [n/4, 3n/4); fine cell i_f -> parent n/4 + i_f//2
        idxs = []
        offs = []
        for ax in range(nd):
            n = cfg_f.shape[ax]
            q = n // 4
            i_f = np.arange(-ng, n + ng)
            ip = q + np.floor_divide(i_f, 2)
            off = np.where(i_f % 2 == 0, -0.25, +0.25)  # units of parent dx
            idxs.append(jnp.asarray(np.clip(ip, 0, n - 1)))
            offs.append(jnp.asarray(off))

        # gather the parent values over all axes, then add limited-slope
        # offsets per axis (edge cells get one-sided zero slope via padding)
        val = Pc
        for ax in range(nd):
            val = jnp.take(val, idxs[ax], axis=1 + ax)
        total = val
        for ax in range(nd):
            a = 1 + ax
            lo = jnp.take(Pc, jnp.asarray([0]), axis=a)
            hi = jnp.take(Pc, jnp.asarray([Pc.shape[a] - 1]), axis=a)
            ppad = jnp.concatenate([lo, Pc, hi], axis=a)
            d = jnp.diff(ppad, axis=a)
            sl = van_albada(
                jax.lax.slice_in_dim(d, 0, d.shape[a] - 1, axis=a),
                jax.lax.slice_in_dim(d, 1, d.shape[a], axis=a),
            )
            for bx in range(nd):
                sl = jnp.take(sl, idxs[bx], axis=1 + bx)
            shape = [1] * (nd + 1)
            shape[a] = len(offs[ax])
            total = total + sl * offs[ax].reshape(shape)
        return total

    def _pad_level(self, level: int, Ph, parent_state):
        """Padded state for level: domain BCs at level 0, C2F ghosts from
        the parent otherwise (interior cells keep the fine values)."""
        cfg = self.cfgs[level]
        if level == 0:
            return apply_bcs(Ph, cfg, self.bdata)
        padded = self._prolong_padded(parent_state, level)
        ng = cfg.ng
        sl = (slice(None),) + tuple(slice(ng, -ng) for _ in range(cfg.ndim))
        return padded.at[sl].set(Ph)

    # -- F2C restriction ---------------------------------------------------
    def _restrict(self, Pc, Pf, level_f: int):
        """Replace covered coarse cells with the conserved-variable average
        of their 2^ndim children (reference:
        NG_fine_to_coarse_boundaries.cpp:255-320 average_cells)."""
        cfg_f = self.cfgs[level_f]
        cfg_c = self.cfgs[level_f - 1]
        nd = cfg_f.ndim
        Uf = prim_to_cons(Pf, cfg_f)
        for ax in range(nd):
            a = 1 + ax
            n = Uf.shape[a]
            u = jnp.moveaxis(Uf, a, -1)
            u = u.reshape(u.shape[:-1] + (n // 2, 2)).mean(axis=-1)
            Uf = jnp.moveaxis(u, -1, a)
        Uc = prim_to_cons(Pc, cfg_c)
        sl = (slice(None),) + tuple(
            slice(cfg_c.shape[ax] // 4, 3 * cfg_c.shape[ax] // 4)
            for ax in range(nd))
        Uc = Uc.at[sl].set(Uf)
        return cons_to_prim(Uc, cfg_c)

    # -- BC89 flux correction ----------------------------------------------
    def _bc89_correct(self, dU, coarse_faces, fine_face_sums, level: int, dt):
        """Adjust the dU of coarse cells just outside the fine grid so the
        interface flux equals the time-averaged fine flux (Berger & Colella
        1989; reference: NG_BC89flux.cpp recv_BC89_fluxes_F2C)."""
        cfg = self.cfgs[level]
        nd = cfg.ndim
        for ax in range(nd):
            q = cfg.shape[ax] // 4
            F = coarse_faces[ax]   # (nvar, *spatial) with n+1 along axis ax
            Ff_lo, Ff_hi = fine_face_sums[ax]   # restricted fine fluxes
            g = self.geoms[level].axes[ax]
            cn = jnp.asarray(g.div_cn)
            cp = jnp.asarray(g.div_cp)

            # full-rank index helper: transverse window covered by the fine
            # grid ([n/4,3n/4) on every transverse axis), position i on ax
            def widx(i):
                sl = [slice(None)]
                for bx in range(nd):
                    if bx == ax:
                        sl.append(i)
                    else:
                        sl.append(slice(cfg.shape[bx] // 4,
                                        3 * cfg.shape[bx] // 4))
                return tuple(sl)

            # coarse interface q is the fine grid's low boundary; the coarse
            # cell OUTSIDE is q-1 (this is its HIGH face, coefficient cp):
            # dudt = cn*f_lo - cp*f_hi, so swapping the coarse flux for the
            # fine one adds cp*(F_coarse - F_fine).  At the high boundary
            # (interface 3q) the outside cell is 3q and its LOW face gets
            # the opposite sign.
            corr_lo = F[widx(q)] - Ff_lo
            corr_hi = F[widx(3 * q)] - Ff_hi
            dU = dU.at[widx(q - 1)].add(dt * cp[q - 1] * corr_lo)
            dU = dU.at[widx(3 * q)].add(-dt * cn[3 * q] * corr_hi)
        return dU

    def _restrict_face_flux(self, Ff, ax, cfg_f):
        """Average the fine boundary-plane flux onto coarse faces: mean over
        2^(nd-1) fine faces per coarse face (equal areas, Cartesian)."""
        nd = cfg_f.ndim
        out = Ff
        # Ff: (nvar, ...transverse..., ) with sweep axis removed (one plane)
        k = 0
        for bx in range(nd):
            if bx == ax:
                continue
            a = 1 + k
            n = out.shape[a]
            u = jnp.moveaxis(out, a, -1)
            u = u.reshape(u.shape[:-1] + (n // 2, 2)).mean(axis=-1)
            out = jnp.moveaxis(u, -1, a)
            k += 1
        return out

    # -- per-level radiation columns ----------------------------------------
    def _child_tau_offsets(self, level: int, Ph, tau_in):
        """Entry-column offsets for level+1's sources-at-infinity: this
        level's tau field sliced at the child's upstream boundary plane,
        windowed to the child's transverse footprint and prolonged 2x
        (the TPU equivalent of the reference's C2F boundary Tau data,
        NG_coarse_to_fine_boundaries.cpp + cell extra_data columns).
        Point sources need no offset: co-centred levels all contain them."""
        phys = self.phys[level]
        if phys is None or not phys.sources:
            return None
        inf_idx = [i for i, s in enumerate(phys.sources) if s.at_infinity]
        if not inf_idx:
            return None
        taus = phys.trace_taus(Ph, tau_in)
        cfg = self.cfgs[level]
        nd = cfg.ndim
        out = {}
        for i in inf_idx:
            s = phys.sources[i]
            ax = s.axis
            q = cfg.shape[ax] // 4
            idx = q if s.sign > 0 else 3 * q - 1
            plane = jnp.take(taus[i], idx, axis=ax)  # (transverse parent)
            # window to the child's footprint then prolong 2x per axis
            k = 0
            for bx in range(nd):
                if bx == ax:
                    continue
                qb = cfg.shape[bx] // 4
                plane = jax.lax.slice_in_dim(plane, qb, 3 * qb, axis=k)
                plane = jnp.repeat(plane, 2, axis=k)
                k += 1
            out[i] = jnp.expand_dims(plane, ax)  # broadcasts along the ray
        return out

    # -- time stepping -----------------------------------------------------
    def compute_dt(self) -> float:
        """Coarse dt = 2^l * finest-level dt (reference:
        sim_control_NG.cpp:288-341 per-level sync; chemistry limit as in
        calc_timestep.cpp:342 calc_microphysics_dt)."""
        dt0 = None
        for l in range(self.n_levels):
            d = float(dynamics_dt(self.P[l], self.cfgs[l], self.geoms[l]))
            phys = self.phys[l]
            if phys is not None and phys.dt_limit and phys.mp is not None:
                d = min(d, float(phys.timescale(self.P[l], self.cfgs[l])))
            d_scaled = d * (2 ** l)
            dt0 = d_scaled if dt0 is None else min(dt0, d_scaled)
        if self.last_dt > 0.0:
            dt0 = min(dt0, self.cfgs[0].max_dt_growth * self.last_dt)
        return dt0

    def _advance_level(self, level: int, dt, parent_state=None,
                       tau_in=None, t0=None, states=None):
        """One OA2 step of `level` with two recursive substeps of level+1.
        Returns the time-summed restricted boundary-plane fluxes for the
        parent's BC89 correction (reference: sim_control_NG.cpp:679-810).
        ``tau_in``: per-source upstream column offsets handed down by the
        parent (sources at infinity only).  ``states``: mutable list the
        recursion reads/writes (traced values under jit); defaults to
        ``self.P`` for the eager path."""
        if states is None:
            states = self.P
        cfg = self.cfgs[level]
        geom = self.geoms[level]
        phys = self.phys[level]
        P = states[level]
        glm = cfg.eqn is Eqn.GLM
        ch = cfg.cfl * geom.dx / dt if glm else None
        if t0 is None:
            t0 = self.t

        # predictor half-step (1st-order space)
        Ppad = self._pad_level(level, P, parent_state)
        dU_h, _ = dynamics_dU(Ppad, cfg, geom, 0.5 * dt, 1, ch=ch)
        if phys is not None and phys.mp is not None:
            dU_h = dU_h + phys.mp_delta_U(P, P, 0.5 * dt, cfg, tau_in)
        Ph = cell_advance(P, dU_h, cfg)
        if glm:
            Ph = glm_psi_damp(Ph, 0.5 * dt, ch, cfg, geom)
        if phys is not None and phys.winds:
            Ph = phys.apply_internal_bcs(Ph, t0 + 0.5 * dt)

        # columns handed to the child (lagged by a half step, like the
        # reference's boundary-data Tau: RT runs before the C2F send,
        # sim_control_NG.cpp:653-656)
        tau_child = (self._child_tau_offsets(level, Ph, tau_in)
                     if level + 1 < self.n_levels else None)

        # first fine substep (C2F ghosts frozen at this level's Ph)
        fine_sums_1 = None
        if level + 1 < self.n_levels:
            fine_sums_1 = self._advance_level(level + 1, 0.5 * dt, Ph,
                                              tau_child, t0, states)

        # corrector (2nd-order space), keep face fluxes
        Ppad = self._pad_level(level, Ph, parent_state)
        dU_f, faces = dynamics_dU(Ppad, cfg, geom, dt, 2, ch=ch)
        if phys is not None and phys.mp is not None:
            dU_f = dU_f + phys.mp_delta_U(P, Ph, dt, cfg, tau_in)

        # second fine substep
        fine_sums_2 = None
        if level + 1 < self.n_levels:
            fine_sums_2 = self._advance_level(level + 1, 0.5 * dt, Ph,
                                              tau_child, t0 + 0.5 * dt,
                                              states)

        # BC89: correct this level's dU with the fine fluxes
        if level + 1 < self.n_levels:
            sums = []
            for ax in range(cfg.ndim):
                lo = 0.5 * (fine_sums_1[ax][0] + fine_sums_2[ax][0])
                hi = 0.5 * (fine_sums_1[ax][1] + fine_sums_2[ax][1])
                sums.append((lo, hi))
            dU_f = self._bc89_correct(dU_f, faces, sums, level, dt)

        P_new = cell_advance(P, dU_f, cfg)
        if glm:
            P_new = glm_psi_damp(P_new, dt, ch, cfg, geom)
        if phys is not None and phys.mp is not None:
            # temperature ceiling (reference: grid_update_state_vector
            # clamps, time_integrator.cpp:881-940)
            T = phys.mp.temperature(P_new, cfg)
            P_new = jnp.where(T > cfg.max_temperature,
                              phys.mp.set_temp(P_new, cfg.max_temperature,
                                               cfg), P_new)
        if phys is not None and phys.winds:
            P_new = phys.apply_internal_bcs(P_new, t0 + dt)

        # F2C restriction
        if level + 1 < self.n_levels:
            P_new = self._restrict(P_new, states[level + 1], level + 1)
        states[level] = P_new

        # boundary-plane fluxes of this level, restricted to parent faces
        if level == 0:
            return None
        out = []
        for ax in range(cfg.ndim):
            F = faces[ax]  # n+1 interfaces along array axis 1+ax
            lo = self._restrict_face_flux(
                jnp.take(F, 0, axis=1 + ax), ax, cfg)
            hi = self._restrict_face_flux(
                jnp.take(F, F.shape[1 + ax] - 1, axis=1 + ax), ax, cfg)
            out.append((lo, hi))
        return out

    def _step_fn(self):
        """The whole level recursion jitted as ONE pure function
        (states, dt, t) -> states: the fixed 2:1 subcycling unrolls at trace
        time, so XLA sees a single static program per step (SURVEY.md §7:
        'unroll the level recursion over per-level jitted steps' — fusing
        the full recursion beats per-level jit by removing every host
        round-trip between substeps)."""
        if "step" not in self._jit_cache:
            def whole(states, dt, t):
                st = list(states)
                self._advance_level(0, dt, t0=t, states=st)
                return tuple(st)

            self._jit_cache["step"] = jax.jit(whole)
        return self._jit_cache["step"]

    def step(self, dt: float = None) -> float:
        if dt is None:
            dt = self.compute_dt()
        self.P = list(self._step_fn()(tuple(self.P), dt, self.t))
        self.t += dt
        self.last_dt = dt
        self.step_count += 1
        return dt

    def run(self, tmax: float, max_steps: int = 10**9):
        while self.t < tmax * (1 - 1e-12) and self.step_count < max_steps:
            dt = min(self.compute_dt(), tmax - self.t)
            self.step(dt)
        return self
