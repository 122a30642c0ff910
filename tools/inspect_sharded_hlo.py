"""Dump the collective-op census of the sharded (GSPMD) step programs.

Answers "what does XLA actually emit for the halo pattern?" without N real
chips: compiles the fused step over an 8-virtual-device CPU mesh and counts
collectives in the optimized HLO (VERDICT r3 item 9 evidence).

Findings (2026-08-21 round 5, 2x2x2 mesh, 32^3, f32, cfg.mesh='on'
so the sharded-run gates engage exactly as a real multi-chip run):
- dynamics-only GLM+HLLD step: 234 collective-permutes (the ghost-strip
  halo pattern — equivalent to the reference's MCMD_boundaries exchange),
  ZERO all-gathers, 33 small all-reduces (dt/c_h scalars).
- coupled MPv3+RT+wind step: **ZERO all-gathers** (78 permutes, 102
  all-reduces).  The two r4 all-gather sources are both eliminated:
  stiff compaction -> masked dense ladder when sharded (elementwise,
  shard-local), and the RT trace -> the shard_map causal-pipeline
  schedule (pallas_trace.sharded_octant_trace: per-shard octant kernels
  + one source-plane ppermute per axis — the raytracer_SC_pllel.cpp:
  156-221 recv-trace-send wavefront) for the centered-source 2x2x2
  decomposition; other source/mesh layouts take the GSPMD plane sweep.
Single-device fast paths (the Pallas octant sweep / fused MPv3 kernel /
fused dynamics sweeps) are opaque full-shape ops that would each force an
all-gather under GSPMD, so sharded runs disable them and take the XLA
paths; wrapping them in shard_map is the planned multi-chip fast path.
The hand-scheduled alternative for pure dynamics is wired as
cfg.halo='explicit' (parallel/halo.py via Simulation).
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

COLLECTIVES = ("collective-permute", "all-gather", "all-reduce",
               "all-to-all", "reduce-scatter")


def census(label, lowered):
    hlo = lowered.compile().as_text()
    print(f"{label}:")
    for name in COLLECTIVES:
        print(f"  {name:20s} {len(re.findall(re.escape(name), hlo))}")


def main():
    from pion_tpu import SimConfig
    from pion_tpu.constants import K_B, MSUN, PG, RO, YEAR
    from pion_tpu.ics import blast_wave
    from pion_tpu.microphysics import MPv3, MPv3Config
    from pion_tpu.parallel.mesh import make_mesh, shard_state
    from pion_tpu.physics import Physics
    from pion_tpu.raytracing import Source
    from pion_tpu.sim import Simulation
    from pion_tpu.winds import WindSource

    n = 32
    cfg = SimConfig(ndim=3, eqn="glm", solver="hlld", ntracer=1,
                    shape=(n,) * 3, xmin=(0.0,) * 3, xmax=(1.0,) * 3,
                    bcs=tuple([("outflow", "outflow")] * 3), cfl=0.3,
                    ooa=2, av="falle", etav=0.1, dtype="float32",
                    mesh="on")  # engage the sharded-run gates (dense
    # chemistry ladder, XLA RT sweep) exactly as a real multi-chip run
    mesh = make_mesh(cfg)
    P0 = jnp.asarray(blast_wave(cfg, B0=(0.1, 0.05, 0.0)).astype(np.float32))
    sim = Simulation(cfg, shard_state(P0, mesh, cfg))
    census("dynamics-only sharded step (GLM+HLLD)",
           sim.fns.step.lower(sim.P, 0.0, 0.0, 1e12, None))

    L = 3.0e18
    cfg_c = cfg.with_(eqn="euler", solver="hll", xmin=(0.0,) * 3,
                      xmax=(L,) * 3, min_temperature=50.0, tmax=1e16)
    mpc = MPv3Config(tracer_slot=cfg_c.eqn.nbase, ion_src="mono",
                     n_idot=1e48, min_temperature=50.0)
    ctr = (0.5 * L,) * 3
    phys = Physics(
        mp=MPv3(mpc),
        sources=[Source(position=ctr, strength=1e48, effect="mono")],
        wind_sources=[WindSource(position=ctr, radius=2.5 * cfg_c.dx,
                                 mdot=1e-7 * MSUN / YEAR, vinf=2e8,
                                 t_wind=3e4, tracers=(1.0,))],
        dt_limit=True)
    Pc = np.zeros((cfg_c.nvar,) + cfg_c.shape, np.float32)
    Pc[RO] = 10 * mpc.mean_mass_per_h
    Pc[PG] = 11 * K_B * 100.0
    Pc[cfg_c.eqn.nbase] = 1e-6
    simc = Simulation(cfg_c, shard_state(jnp.asarray(Pc), mesh, cfg_c),
                      physics=phys)
    census("coupled MPv3+RT+wind sharded step",
           simc.fns.step.lower(simc.P, 0.0, 0.0, 1e12, None))


if __name__ == "__main__":
    main()
