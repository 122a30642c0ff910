"""Explicit shard_map halo-exchange path: bitwise vs single-device."""
import numpy as np
import jax
import jax.numpy as jnp

from pion_tpu import SimConfig, Simulation
from pion_tpu.ics.blast import blast_wave
from pion_tpu.parallel.halo import make_sharded_step, supports
from pion_tpu.parallel.mesh import make_mesh, shard_state


def _cfg(bcs):
    return SimConfig(ndim=2, eqn="glm", solver="hlld", ntracer=1,
                     shape=(32, 64), xmin=(0.0, 0.0), xmax=(1.0, 2.0),
                     bcs=bcs, cfl=0.3, ooa=2, av="falle", etav=0.1,
                     tmax=0.03)


def test_sharded_step_matches_serial():
    cfg = _cfg((("outflow", "outflow"), ("periodic", "periodic")))
    assert supports(cfg)
    P0 = blast_wave(cfg, B0=(0.1, 0.05, 0.0))

    sim = Simulation(cfg, jnp.asarray(P0))
    mesh = make_mesh(cfg, n_devices=8)
    adv, calc_dt = make_sharded_step(cfg, sim.geom, mesh)

    Ps = shard_state(jnp.asarray(P0), mesh, cfg)
    t = 0.0
    last = 0.0
    for _ in range(8):
        dt = float(calc_dt(Ps))
        if last:
            dt = min(dt, cfg.max_dt_growth * last)
        Ps = adv(Ps, dt, t)
        t += dt
        last = dt
        sim.step()
    np.testing.assert_allclose(np.asarray(Ps), np.asarray(sim.P),
                               rtol=1e-12, atol=1e-13)
    assert abs(t - sim.t) < 1e-12


def test_sharded_reflecting_walls():
    cfg = _cfg((("reflecting", "reflecting"), ("reflecting", "reflecting")))
    P0 = blast_wave(cfg, B0=(0.05, 0.0, 0.0), center=(0.3, 0.5))
    sim = Simulation(cfg, jnp.asarray(P0))
    mesh = make_mesh(cfg, n_devices=8)
    adv, calc_dt = make_sharded_step(cfg, sim.geom, mesh)
    Ps = shard_state(jnp.asarray(P0), mesh, cfg)
    t = 0.0
    last = 0.0
    for _ in range(6):
        dt = float(calc_dt(Ps))
        if last:
            dt = min(dt, cfg.max_dt_growth * last)
        Ps = adv(Ps, dt, t)
        t += dt
        last = dt
        sim.step()
    np.testing.assert_allclose(np.asarray(Ps), np.asarray(sim.P),
                               rtol=1e-12, atol=1e-13)
