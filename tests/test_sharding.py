"""Distribution tests: 1-device vs N-device bitwise invariance.

The reference's oracle is silocompare between serial and MPI runs
(reference: test_problems/blastwave_crt3d/compare_ser_pll.sh:34-44); here
the same jitted step runs on a 1-device and an 8-device mesh and must agree.
"""
import numpy as np
import jax
import jax.numpy as jnp

from pion_tpu import SimConfig, Simulation
from pion_tpu.constants import RO
from pion_tpu.ics.blast import blast_wave
from pion_tpu.parallel.mesh import decompose, make_mesh, shard_state


def make_sim():
    cfg = SimConfig(
        ndim=2, eqn="glm", solver="hlld", shape=(64, 64),
        xmin=(0.0, 0.0), xmax=(1.0, 1.0),
        bcs=(("outflow", "outflow"), ("outflow", "outflow")),
        cfl=0.3, ooa=2, av="falle", etav=0.1, tmax=0.02,
    )
    P0 = blast_wave(cfg, B0=(0.1, 0.0, 0.0))
    return cfg, P0


def test_decompose():
    assert decompose(8, 3, (64, 64, 64)) == (2, 2, 2)
    assert decompose(4, 2, (64, 64)) == (2, 2)
    assert decompose(1, 1, (64,)) == (1,)
    # greedy largest-prime-first: 3 -> axis 0 (64 cells), 2 -> axis 1
    assert decompose(6, 2, (64, 32)) == (3, 2)


def test_nproc_invariance():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg, P0 = make_sim()

    sim_serial = Simulation(cfg, jnp.asarray(P0))
    sim_serial.run()

    mesh = make_mesh(cfg, n_devices=8)
    P_sharded = shard_state(jnp.asarray(P0), mesh, cfg)
    sim_par = Simulation(cfg, P_sharded)
    sim_par.run()

    a = np.asarray(sim_serial.P)
    b = np.asarray(sim_par.P)
    assert sim_serial.step_count == sim_par.step_count
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-13)
