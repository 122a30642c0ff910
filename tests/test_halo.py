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


def test_simulation_halo_explicit_wired():
    """cfg.halo='explicit' routes Simulation through the shard_map path
    end-to-end (Simulation.run, not the raw make_sharded_step API) and
    matches the GSPMD run bitwise-tight."""
    cfg = _cfg((("outflow", "outflow"), ("periodic", "periodic")))
    P0 = blast_wave(cfg, B0=(0.1, 0.05, 0.0))

    sim_g = Simulation(cfg, jnp.asarray(P0))
    sim_e = Simulation(cfg.with_(halo="explicit"), jnp.asarray(P0))
    assert hasattr(sim_e, "mesh")
    sim_g.run(max_steps=6)
    sim_e.run(max_steps=6)
    assert sim_e.step_count == 6
    np.testing.assert_allclose(np.asarray(sim_e.P), np.asarray(sim_g.P),
                               rtol=1e-12, atol=1e-13)
    assert abs(sim_e.t - sim_g.t) < 1e-12 * max(sim_g.t, 1e-300)


def test_simulation_halo_explicit_guards():
    """Unsupported compositions raise instead of silently degrading."""
    import pytest

    from pion_tpu.physics import Physics
    from pion_tpu.winds import WindSource

    cfg = _cfg((("outflow", "outflow"), ("periodic", "periodic")))
    P0 = blast_wave(cfg, B0=(0.1, 0.05, 0.0))
    phys = Physics(wind_sources=[WindSource(position=(0.5, 0.5),
                                            radius=0.1, mdot=1e18,
                                            vinf=2e8)])
    with pytest.raises(NotImplementedError):
        Simulation(cfg.with_(halo="explicit"), jnp.asarray(P0),
                   physics=phys)


def test_cli_halo_param(tmp_path):
    """'halo explicit' in a param file reaches SimConfig."""
    from pion_tpu.io.params import config_from_params

    cfg = config_from_params({"ndim": "2", "NGridX": "32", "NGridY": "32",
                              "eqn": "euler", "halo": "explicit"})
    assert cfg.halo == "explicit"
