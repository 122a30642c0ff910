"""Coupled RT + chemistry + dynamics: D-type HII-region expansion.

The classic StarBench early-phase test (Bisbas et al. 2015; the reference's
WindRT1D/RCW120-class configs): a photoionized region around a point source
expands following the Spitzer (1978) law
    R(t) = R_S (1 + (7/4) c_i t / R_S)^{4/7}.
"""
import numpy as np
import jax.numpy as jnp

from pion_tpu import Coord, Eqn, SimConfig, Simulation
from pion_tpu.constants import K_B, M_P, PG, RO
from pion_tpu.microphysics.mpv7 import MPv7, MPv7Config
from pion_tpu.physics import Physics
from pion_tpu.raytracing import Source


def test_dtype_expansion_spitzer():
    nH = 1000.0
    ndot = 1.0e48
    alpha = 2.7e-13
    t_lo, t_hi = 100.0, 1.0e4
    r_s = (3.0 * ndot / (4.0 * np.pi * alpha * nH * nH)) ** (1.0 / 3.0)

    n = 128
    rmax = 4.0 * r_s
    cfg = SimConfig(
        ndim=1, eqn=Eqn.EULER, ntracer=1, coords=Coord.SPHERICAL,
        solver="hll", shape=(n,), xmin=(0.0,), xmax=(rmax,),
        bcs=(("reflecting", "outflow"),), cfl=0.3, ooa=2,
        av="falle", etav=0.1, tmax=1.0,
    )
    mpc = MPv7Config(tracer_slot=5, ion_src="mono", n_idot=ndot,
                     recomb_rate=alpha, t_lo=t_lo, t_hi=t_hi)
    mp = MPv7(mpc)
    phys = Physics(mp=mp, sources=[Source(position=(0.0,), strength=ndot,
                                          effect="mono")],
                   dt_limit=False)

    P = np.zeros((cfg.nvar, n))
    P[RO] = nH * M_P / mpc.x_frac
    x0 = 1e-12
    ntot0 = ((1 - x0) * 1.0 + (mpc.mol + 0.25 * mpc.helium_mass_frac
                               / mpc.x_frac - mpc.mol)) * nH
    P[PG] = ntot0 * K_B * t_lo
    P[5] = x0
    sim = Simulation(cfg, jnp.asarray(P), physics=phys)

    # ionized sound speed for the Spitzer law
    rho_i = nH * M_P / mpc.x_frac
    p_i = mp.n_tot(nH, 1.0) * K_B * t_hi
    c_i = np.sqrt(cfg.gamma * p_i / rho_i)

    t_end = 0.35 * r_s / c_i * 4.0 / 7.0 * 7.0  # ~0.35 expansion times
    sim.cfg = cfg.with_(tmax=t_end)
    sim.run(tmax=t_end, max_steps=4000)

    x = np.asarray(sim.P[5])
    r = cfg.cell_centers(0)
    idx = np.argmax(x < 0.5)
    r_front = r[idx]
    tau = c_i * sim.t / r_s
    r_spitzer = r_s * (1.0 + 7.0 / 4.0 * tau) ** (4.0 / 7.0)
    rel = abs(r_front - r_spitzer) / r_spitzer
    assert np.all(np.isfinite(np.asarray(sim.P)))
    assert rel < 0.15, (
        f"front {r_front:.3e} vs Spitzer {r_spitzer:.3e} (rel {rel:.2f}), "
        f"t={sim.t:.3e}, steps={sim.step_count}")
    # the front must actually have moved well beyond R_S
    assert r_front > 1.1 * r_s
