"""Host-side simulation driver: the Time_Int loop.

Equivalent of the reference main loop (reference:
source/sim_control/sim_control.cpp:202-290 Time_Int; dt policy in
source/sim_control/calc_timestep.cpp:68-260).  The per-step compiled work is
one call into :func:`pion_tpu.stepper.advance`; everything here (dt clamps,
output cadence, walltime checks) is cheap host logic.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .boundaries import BoundaryData, make_fixed_strips
from .config import SimConfig
from .grid import Geometry, make_geometry
from .utils import ensure_precision
from .stepper import make_step_fns


@dataclasses.dataclass
class Simulation:
    cfg: SimConfig
    P: jnp.ndarray
    t: float = 0.0
    step_count: int = 0
    last_dt: float = 0.0
    # output/checkpoint policy (reference: sim_init.cpp:671-760 output_data,
    # :681-700 rolling checkpoints alternating two files)
    outfile: Optional[str] = None
    opfreq: int = 0              # snapshot every N steps (0 = only final)
    opfreq_time: float = 0.0     # snapshot every dt_sim (OutputCriterion 1,
    #                              reference: sim_init.cpp:695-760 OPfreqTime)
    checkpoint_freq: int = 0     # rolling checkpoint every N steps
    physics: Optional[object] = None   # pion_tpu.physics.Physics
    # (radius_cm, state_vector) for a BC.JET face
    # (reference: JP.jetradius/jetstate, sim_params.h:336-337)
    jet: Optional[tuple] = None
    # raw parameter dict persisted into snapshot headers so a restart can
    # rebuild chemistry/RT/winds (reference: the RT_*/WIND_*/EP_* registry
    # in every header, dataIO/parameter_defs.h:56 + sim_init.cpp:173-321)
    params: Optional[dict] = None
    log_freq: int = 0                  # per-step status line cadence

    def __post_init__(self):
        ensure_precision(self.cfg)
        expect = (self.cfg.nvar,) + self.cfg.shape
        if tuple(self.P.shape) != expect:
            raise ValueError(
                f"state shape {tuple(self.P.shape)} != {expect} expected "
                f"from the config (nvar, *shape)")
        # normalize the state to the config dtype: a jnp array created
        # before ensure_precision flipped x64 is float32 and would mix
        # dtypes inside while_loop carries (pass numpy arrays to preserve
        # full float64 ICs through this cast)
        self.P = jnp.asarray(self.P, dtype=self.cfg.np_dtype)
        self.geom: Geometry = make_geometry(self.cfg)
        self.bdata: BoundaryData = make_fixed_strips(np.asarray(self.P), self.cfg)
        if self.jet is not None:
            self.bdata = dataclasses.replace(
                self.bdata, jet=(float(self.jet[0]), np.asarray(self.jet[1])))
        if self.physics is not None:
            self.physics.setup(self.cfg, self.geom)
            # carve wind regions into the initial state (reference:
            # assign_boundary_data for STWIND at setup)
            if self.physics.winds:
                self.P = self.physics.apply_internal_bcs(self.P, self.t)
        if self.cfg.halo == "explicit":
            self.fns = self._make_explicit_halo_fns()
        else:
            # multi-device GSPMD: shard the state over all visible devices;
            # the jitted step follows the input sharding (the MPI-binary
            # parallel entry point equivalent, main_NG_MPI.cpp:40-60)
            from .parallel.mesh import mesh_requested

            if mesh_requested(self.cfg):
                from .parallel.mesh import make_mesh, shard_state

                self.mesh = make_mesh(self.cfg)
                self.P = shard_state(self.P, self.mesh, self.cfg)
            self.fns = make_step_fns(self.cfg, self.geom, self.bdata,
                                     physics=self.physics)
        self._ckpt_flip = 0
        self._writer = None  # lazy AsyncSnapshotWriter
        self._next_optime = self.t + self.opfreq_time

    def _make_explicit_halo_fns(self):
        """Production wiring of the hand-scheduled shard_map halo path
        (parallel/halo.py — the MCMD_boundaries equivalent): explicit
        ppermute ghost exchange + pmin dt instead of GSPMD-inferred
        collectives.  Cartesian pure-dynamics scope; the step is the same
        fused dt+advance contract as the GSPMD path."""
        import jax

        from .parallel.halo import make_sharded_step, supports
        from .parallel.mesh import make_mesh, shard_state
        from .stepper import StepFns

        if self.physics is not None:
            raise NotImplementedError(
                "halo='explicit' supports pure dynamics only "
                "(chemistry/RT/winds ride the GSPMD path)")
        if not supports(self.cfg):
            raise NotImplementedError(
                "halo='explicit' requires local-data BCs "
                "(periodic/outflow/oneway/reflecting/jetreflect/axisym)")
        mesh = make_mesh(self.cfg)
        self.mesh = mesh
        self.P = shard_state(self.P, mesh, self.cfg)
        adv, calc_dt = make_sharded_step(self.cfg, self.geom, mesh,
                                         self.bdata)

        @jax.jit
        def _step(P, t, last_dt, dt_cap, sp=None):
            dt_raw = calc_dt(P)
            dt = jnp.where(last_dt > 0.0,
                           jnp.minimum(dt_raw,
                                       self.cfg.max_dt_growth * last_dt),
                           dt_raw)
            dt = jnp.minimum(dt, dt_cap)
            return adv(P, dt, t), dt, dt_raw

        return StepFns(advance=adv, calc_dt=calc_dt, step=_step)

    @classmethod
    def restart(cls, path: str, **kw) -> "Simulation":
        """Resume from any snapshot (reference: main.cpp:99-112 restart
        detection; every snapshot is a full restart file).  When the header
        carries the original parameter section and the caller does not
        supply ``physics``, the full Physics (chemistry/RT/winds) and jet
        boundary are rebuilt from it (reference: sim_init.cpp:173-321
        rebuilds MP/RT/winds from the header registry)."""
        from .io.snapshot import load_snapshot_raw

        cfg, P, t, step, extra = load_snapshot_raw(path)
        params = (extra or {}).get("params")
        if params:
            kw.setdefault("params", params)
            if "physics" not in kw:
                from .cli import jet_from_params, physics_from_params

                kw["physics"] = physics_from_params(cfg, params)
                kw.setdefault("jet", jet_from_params(cfg, params))
        sim = cls(cfg, jnp.asarray(P), t=t, step_count=step, **kw)
        return sim

    def save(self, path: Optional[str] = None, wait: bool = True) -> str:
        """Write a snapshot; with ``wait=False`` it is queued on the
        background writer thread and the step loop continues immediately
        (the PMPIO-overlap equivalent)."""
        if path is None:
            assert self.outfile, "set Simulation.outfile or pass a path"
            path = f"{self.outfile}.{self.step_count:08d}"
        extra = {"params": self.params} if self.params else None
        if wait:
            from .io import save_snapshot

            self.flush_io()
            return save_snapshot(path, np.asarray(self.P), self.cfg,
                                 self.t, self.step_count, extra=extra)
        if self._writer is None:
            from .io.snapshot import AsyncSnapshotWriter

            self._writer = AsyncSnapshotWriter()
        self._writer.submit(path, self.P, self.cfg, self.t, self.step_count,
                            extra)
        return path

    def flush_io(self):
        """Block until queued async snapshots are on disk."""
        if self._writer is not None:
            self._writer.wait()

    def _maybe_output(self):
        if self.outfile is None:
            return
        if self.opfreq and self.step_count % self.opfreq == 0:
            self.save(wait=False)
        # tolerance catches exact-landing steps that round a ulp short
        tol = 1.0e-12 * max(abs(self._next_optime), self.opfreq_time)
        if self.opfreq_time > 0.0 and self.t >= self._next_optime - tol:
            while self._next_optime - tol <= self.t:
                self._next_optime += self.opfreq_time
            self.save(wait=False)
        if self.checkpoint_freq and self.step_count % self.checkpoint_freq == 0:
            # alternate two files like the reference's .999999/.999998
            suffix = 999999 - self._ckpt_flip
            self._ckpt_flip ^= 1
            self.save(f"{self.outfile}.{suffix}", wait=False)

    # -- dt policy (reference: calc_timestep.cpp:219-260) ------------------
    def _dt_cap(self) -> float:
        """Host-side dt ceiling: end time and the next timed-output instant
        (reference: timestep_checking_and_limiting clamps dt to
        next_optime-simtime then finishtime-simtime, calc_timestep.cpp:243-252
        — so opfreq_time snapshots land exactly on cadence)."""
        tmax = getattr(self, "_tmax", None) or self.cfg.tmax
        cap = tmax - self.t
        # first-step wind-speed ceiling (reference: calc_dynamics_dt caps
        # dt <= 0.1 CFL dx / Vinf on timestep 0, since wind cells are
        # excluded from the CFL reduction)
        if (self.step_count == 0 and self.physics is not None
                and self.physics.wind_sources):
            cap = min(cap, self.physics.wind_dt_cap(self.cfg, self.geom))
        if self.opfreq_time > 0.0 and self.outfile is not None:
            to_next = self._next_optime - self.t
            # fp guard: if we are within rounding of the output instant,
            # aim for the one after rather than taking a ~0 step
            tol = 1.0e-12 * max(abs(self._next_optime), self.opfreq_time)
            if to_next <= tol:
                to_next += self.opfreq_time
            cap = min(cap, to_next)
        return cap

    def compute_dt(self) -> float:
        dt = float(self.fns.calc_dt(self.P))
        if self.last_dt > 0.0:
            dt = min(dt, self.cfg.max_dt_growth * self.last_dt)
        dt = min(dt, self._dt_cap())
        if dt < self.cfg.min_timestep:
            raise RuntimeError(f"timestep too small: {dt}")
        return dt

    def step(self) -> float:
        sp = (self.physics.update_sources(self.t)
              if self.physics is not None and self.physics.sources else None)
        Pn, dt, dt_raw = self.fns.step(self.P, self.t, self.last_dt,
                                       self._dt_cap(), sp)
        dt = float(dt)
        if float(dt_raw) < self.cfg.min_timestep:
            raise RuntimeError(f"timestep too small: {float(dt_raw)}")
        self.P = Pn
        self.t += dt
        self.last_dt = dt
        self.step_count += 1
        return dt

    def run(self, tmax: Optional[float] = None, max_steps: int = 10**9,
            callback: Optional[Callable] = None, chunk: int = 1):
        """Advance to ``tmax``.  ``chunk`` > 1 batches that many fused
        steps into ONE compiled dispatch (lax.scan) — removes per-step
        launch latency, which dominates small grids.  Chunking engages
        only when nothing must run on the host between steps (no timed
        outputs, callbacks, or per-step logging finer than the chunk)."""
        from .utils import StepLogger

        tmax = self.cfg.tmax if tmax is None else tmax
        self._tmax = tmax
        logger = StepLogger(self.log_freq)
        # output cadences must align with the chunk so snapshots are not
        # skipped (each distinct K compiles its own program: keep K fixed)
        can_chunk = (chunk > 1 and self.fns.multi_step is not None
                     and self.opfreq_time == 0.0 and callback is None
                     and self.opfreq % chunk == 0
                     and self.checkpoint_freq % chunk == 0
                     and (self.log_freq == 0 or self.log_freq % chunk == 0))
        while self.t < tmax * (1.0 - 1e-12) and self.step_count < max_steps:
            if (can_chunk and self.step_count + chunk <= max_steps
                    and not (self.step_count == 0
                             and self.physics is not None
                             and self.physics.wind_sources)):
                # (the very first step takes the per-step path so the
                # reference's timestep-0 wind-speed dt cap applies)
                K = chunk
                sp = (self.physics.update_sources(self.t)
                      if self.physics is not None and self.physics.sources
                      else None)
                Pn, dts, dt_raws = self.fns.multi_step(
                    self.P, self.t, self.last_dt, tmax, sp, K=K)
                dts = np.asarray(dts)
                if float(np.asarray(dt_raws).min()) < self.cfg.min_timestep:
                    raise RuntimeError(
                        f"timestep too small: {float(np.min(dt_raws))}")
                live = int((dts > 0).sum())
                if live == 0:
                    break
                self.P = Pn
                self.t += float(dts.sum())
                self.last_dt = float(dts[live - 1])
                self.step_count += live
                dt = float(dts[live - 1])
            else:
                dt = self.step()
            self._maybe_output()
            logger.log(self.step_count, self.t, dt, self.P)
            if callback is not None:
                callback(self)
        self.P.block_until_ready()
        if self.outfile is not None:
            self.save()
        self.flush_io()
        return self
