"""Multi-device coverage of nested grids and coupled physics.

The reference's serial-vs-parallel oracle applied to the NG recursion and
to an RT+chemistry step (reference:
test_problems/blastwave_crt3d/compare_ser_pll.sh:34-44 — serial and MPI
runs of the same problem must agree to roundoff).  Here: the same jitted
step on 1 device vs sharded over the 8-virtual-device CPU mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp

from pion_tpu import Eqn, SimConfig
from pion_tpu.constants import K_B, M_P, PG, RO
from pion_tpu.ics.blast import blast_wave
from pion_tpu.ng import NGHierarchy
from pion_tpu.parallel.mesh import make_mesh, shard_state


def _ng_blast(cfg0, sharded):
    hier = NGHierarchy(cfg0)
    mesh = make_mesh(cfg0) if sharded else None
    states = []
    for l in range(cfg0.nlevels):
        cfg = hier.cfgs[l]
        P = blast_wave(cfg, rho0=1.0, p0=0.1, p_in=10.0, r_in=0.12,
                       center=tuple(0.5 * (a + b)
                                    for a, b in zip(cfg.xmin, cfg.xmax)))
        if cfg0.eqn.is_mhd:
            from pion_tpu.constants import BX

            P[BX] = 0.2
        arr = jnp.asarray(P)
        if sharded:
            arr = shard_state(arr, mesh, cfg)
        states.append(arr)
    hier.set_states(states)
    return hier


def test_ng_glm_blast_sharded_invariance():
    """2-level GLM-MHD blast: 8-device sharded == single-device, to
    roundoff, through 4 full NG recursion steps."""
    assert len(jax.devices()) >= 8, "conftest forces an 8-device CPU mesh"
    cfg0 = SimConfig(ndim=2, eqn=Eqn.GLM, solver="hlld", shape=(32, 32),
                     xmin=(0.0, 0.0), xmax=(1.0, 1.0),
                     bcs=(("outflow", "outflow"),) * 2, cfl=0.3, ooa=2,
                     av="falle", etav=0.1, nlevels=2)
    h1 = _ng_blast(cfg0, sharded=False)
    h8 = _ng_blast(cfg0, sharded=True)
    for _ in range(4):
        dt = h1.compute_dt()
        h1.step(dt)
        h8.step(dt)
    for l in range(2):
        a, b = np.asarray(h1.P[l]), np.asarray(h8.P[l])
        assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
        np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-13,
                                   err_msg=f"level {l}")


def test_mpv3_point_source_sharded_invariance():
    """MPv3 chemistry + point-source raytracing (the RCW120-class coupled
    step): sharded over 8 devices == single device.  Exercises the shell
    scan's cross-shard gathers (parallel/halo.py leaves RT to GSPMD)."""
    from pion_tpu.microphysics import MPv3, MPv3Config
    from pion_tpu.physics import Physics
    from pion_tpu.raytracing import Source
    from pion_tpu.sim import Simulation

    n = 32
    nH = 100.0
    cfg = SimConfig(ndim=2, eqn=Eqn.EULER, ntracer=1, solver="hll",
                    shape=(n, n), xmin=(0.0, 0.0),
                    xmax=(3.0e18, 3.0e18),
                    bcs=(("outflow", "outflow"),) * 2, cfl=0.3, ooa=2,
                    av="falle", etav=0.1, min_temperature=50.0,
                    tmax=1.0e15)

    def build(sharded):
        mpc = MPv3Config(tracer_slot=5, ion_src="mono", n_idot=1.0e47)
        mp = MPv3(mpc)
        src = Source(position=(1.5e18, 1.5e18), strength=1.0e47,
                     effect="mono")
        phys = Physics(mp=mp, sources=[src], dt_limit=False)
        P = np.zeros((cfg.nvar,) + cfg.shape)
        P[RO] = nH * mpc.mean_mass_per_h
        P[PG] = 1.1 * nH * K_B * 500.0
        P[5] = 1.0e-6
        arr = jnp.asarray(P)
        if sharded:
            arr = shard_state(arr, make_mesh(cfg), cfg)
        return Simulation(cfg, arr, physics=phys)

    s1 = build(False)
    s8 = build(True)
    for _ in range(3):
        dt = s1.compute_dt()
        s1.P = s1.fns.advance(s1.P, dt, s1.t)
        s8.P = s8.fns.advance(s8.P, dt, s8.t)
        s1.t += dt
        s8.t += dt
    a, b = np.asarray(s1.P), np.asarray(s8.P)
    assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
    # the source must have ionized a region (the step did real RT work)
    assert a[5].max() > 0.1
    # roundoff-level agreement, scaled per variable (GSPMD reorders f64
    # reductions; observed ~5e-16 relative to field scale)
    for v in range(cfg.nvar):
        np.testing.assert_allclose(
            b[v], a[v], rtol=1e-12, atol=1e-12 * max(np.abs(a[v]).max(),
                                                     1e-300),
            err_msg=f"variable {v}")
