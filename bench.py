"""Benchmark: 3D GLM-MHD grid-cell updates per second per chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md); we
normalize against 1.0e6 cell-updates/s/core, a standard figure for explicit
second-order finite-volume MHD in optimized C++ on one x86 core (the
reference's Ostar2D walltime — 256^2 x ~1e4 steps in 15 min on 32 cores —
implies ~0.7-2e6 including raytracing+chemistry, consistent with this).
``vs_baseline`` is therefore the speedup of one TPU chip over one CPU core
of the reference.
"""
import json
import os
import time

import jax

# persistent compilation cache: the fused HLLD kernels take minutes to
# compile cold; cache hits make repeat runs start in seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def main():
    from pion_tpu import SimConfig
    from pion_tpu.boundaries import BoundaryData
    from pion_tpu.grid import make_geometry
    from pion_tpu.ics import blast_wave
    from pion_tpu.stepper import advance

    on_tpu = jax.default_backend() in ("tpu", "axon")
    shape = (128, 128, 128) if on_tpu else (64, 64, 64)
    cfg = SimConfig(
        ndim=3, eqn="glm", solver="hlld", ntracer=1,
        shape=shape, xmin=(0.0, 0.0, 0.0), xmax=(1.0, 1.0, 1.0),
        bcs=tuple([("outflow", "outflow")] * 3),
        cfl=0.3, ooa=2, av="falle", etav=0.1, dtype="float32",
    )
    geom = make_geometry(cfg)
    bdata = BoundaryData()

    @jax.jit
    def step(P, dt):
        return advance(P, dt, cfg, geom, bdata)

    P = jnp.asarray(blast_wave(cfg, B0=(0.1, 0.05, 0.0)).astype(cfg.np_dtype))
    dt = jnp.asarray(1.0e-4, dtype=cfg.np_dtype)

    def readback(out):
        # scalar readback defeats async dispatch (block_until_ready is not
        # reliable through the axon relay)
        return float(out[0].sum())

    # warmup/compile: both the step and the readback program
    out = step(step(P, dt), dt)
    readback(out)

    n_iter = 20 if on_tpu else 3
    t0 = time.perf_counter()
    out = P
    for _ in range(n_iter):
        out = step(out, dt)
    readback(out)
    elapsed = time.perf_counter() - t0

    ncell = 1
    for s in shape:
        ncell *= s
    ups = ncell * n_iter / elapsed

    coupled = coupled_bench(on_tpu, readback)

    out = {
        "metric": "3D GLM-MHD (HLLD, OA2) cell updates/s/chip",
        "value": round(ups),
        "unit": "cell-updates/s",
        "vs_baseline": round(ups / 1.0e6, 2),
    }
    out.update(coupled)
    out["profile"] = (
        "Dynamics: OA2 = 2 partials; each: BC pad + HLLD->HLL mask pass + "
        "3 fused Pallas axis sweeps (~1.3-1.9 ms each at 128^3 f32, "
        "VPU-op-bound; final kernel applies dU+floors+GLM damping). "
        "Coupled NG step (fused dt+advance, one program): per level-step "
        "2 Pallas partials + 1 raytrace (in-VMEM 8-octant Pallas sweep, "
        "~0.1 ms at 128^3 vs 27 ms for the XLA plane sweep) + 2 MPv3 "
        "updates (fused Pallas kernel: hat-basis MXU table interpolation "
        "+ per-tile BE-Newton ladder, no compaction gather); BC89 faces "
        "from 4-cell slab recomputation; columns traced once per level "
        "and shared dt-limit/predictor.")
    print(json.dumps(out))


def coupled_bench(on_tpu, readback):
    """Flagship Ostar3D-class coupled step: 3D GLM-MHD (HLLD) on a 2-level
    nested grid + MPv3 multifrequency photoionization from a point source +
    a magnetized stellar wind — the full production composition
    (reference: test_problems/Ostar3D/run.sh:10-23 scale, RCW120 physics).
    Cell updates are counted over all levels (level l advances 2^l times
    per hierarchy step).  Reported as extra keys on the bench JSON line."""
    import numpy as np

    from pion_tpu import SimConfig
    from pion_tpu.constants import K_B, MSUN, PG, RO, RSUN, YEAR
    from pion_tpu.microphysics import MPv3, MPv3Config
    from pion_tpu.ng import NGHierarchy
    from pion_tpu.physics import Physics
    from pion_tpu.raytracing import Source
    from pion_tpu.winds import WindSource

    n = 128 if on_tpu else 24
    nlev = 2
    L = 6.0e18
    cfg = SimConfig(
        ndim=3, eqn="glm", solver="hlld", ntracer=1,
        shape=(n, n, n), xmin=(0.0,) * 3, xmax=(L,) * 3,
        bcs=tuple([("outflow", "outflow")] * 3), nlevels=nlev,
        cfl=0.3, ooa=2, av="falle", etav=0.1, dtype="float32",
        min_temperature=50.0, max_temperature=1.0e9, tmax=1.0e16,
    )
    mpc = MPv3Config(tracer_slot=cfg.eqn.nbase, ion_src="mfion",
                     n_idot=1.0e48, tstar=3.75e4, rstar_cm=10.0 * RSUN,
                     min_temperature=50.0)
    ctr = (0.5 * L,) * 3
    fine_dx = cfg.dx / 2 ** (nlev - 1)
    phys = Physics(
        mp=MPv3(mpc),
        sources=[Source(position=ctr, strength=1.0e48, effect="mfion")],
        wind_sources=[WindSource(position=ctr, radius=6.0 * fine_dx,
                                 mdot=1.0e-6 * MSUN / YEAR, vinf=2.0e8,
                                 t_wind=3.0e4, b_star=10.0,
                                 tracers=(1.0,))],
        dt_limit=True)

    nH = 100.0
    hier = NGHierarchy(cfg, nlev, physics=phys)
    states = []
    for l in range(nlev):
        P0 = np.zeros((cfg.nvar,) + cfg.shape, dtype=np.float32)
        P0[RO] = nH * mpc.mean_mass_per_h
        P0[PG] = 1.1 * nH * K_B * 300.0
        P0[cfg.eqn.nbase] = 1.0e-6
        B0 = 4.0e-6 / np.sqrt(4.0 * np.pi)   # ~Ostar3D UNIFORM_ambBX
        from pion_tpu.constants import BX
        P0[BX] = B0
        states.append(jnp.asarray(P0))
    hier.set_states(states)

    def run_steps(k):
        for _ in range(k):
            hier.step()
        readback(hier.P[0])

    run_steps(2)                 # warm/compile
    k = 6 if on_tpu else 2
    # production stepping: k fused hierarchy steps per dispatch
    # (NGHierarchy.run(chunk=k) path; bitwise-identical to per-step runs)
    mfn = hier._multi_step_fn(k)
    st, _d = mfn(tuple(hier.P), hier.t, hier.last_dt, 1.0e16, None)
    readback(st[0])
    t0 = time.perf_counter()
    st, _d = mfn(tuple(st), hier.t, hier.last_dt, 1.0e16, None)
    readback(st[0])
    t_coupled = (time.perf_counter() - t0) / k

    # pure-dynamics NG step on the identical hierarchy for the cost ratio
    hier_dyn = NGHierarchy(cfg, nlev)
    hier_dyn.set_states(states)
    for _ in range(2):
        hier_dyn.step()
    readback(hier_dyn.P[0])
    t0 = time.perf_counter()
    for _ in range(k):
        hier_dyn.step()
    readback(hier_dyn.P[0])
    t_dyn = (time.perf_counter() - t0) / k

    updates = sum(2 ** l for l in range(nlev)) * n ** 3
    ups = updates / t_coupled
    return {
        "coupled_metric": ("3D GLM+HLLD 2-level NG + MPv3 mfion point "
                           "source + wind (Ostar3D-class) cell "
                           "updates/s/chip"),
        "coupled_value": round(ups),
        "coupled_unit": "cell-updates/s",
        "coupled_over_dynamics": round(t_coupled / t_dyn, 2),
    }


if __name__ == "__main__":
    main()
