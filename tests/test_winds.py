"""Stellar-wind internal boundary tests.

Gates modeled on the reference Wind2D/Ostar configs: the free-wind region
must maintain rho ~ r^-2 with radial v=v_inf, and the wind must sweep up
an expanding bubble.
"""
import numpy as np
import jax.numpy as jnp

from pion_tpu import Coord, Eqn, SimConfig, Simulation
from pion_tpu.constants import M_P, PG, RO, VX, VY
from pion_tpu.physics import Physics
from pion_tpu.winds import WindEvolution, WindSource

PC = 3.0856775807e18
MSUN_YR = 1.98892e33 / 3.15576e7


def wind_sim(n=64, evolution=None, mdot=1.0e-6 * MSUN_YR):
    rmax = 0.5 * PC
    cfg = SimConfig(
        ndim=2, eqn=Eqn.EULER, solver="hll", coords=Coord.CYLINDRICAL,
        shape=(n // 2, n), xmin=(0.0, -rmax), xmax=(rmax / 1.0 / 2 * 1, rmax),
        bcs=(("axisymmetric", "outflow"), ("outflow", "outflow")),
        cfl=0.3, ooa=2, av="falle", etav=0.1, tmax=1.0,
    )
    # ambient ISM
    nH = 100.0
    P0 = np.zeros((cfg.nvar,) + cfg.shape)
    P0[RO] = nH * M_P
    P0[PG] = nH * 1.380649e-16 * 100.0
    src = WindSource(position=(0.0, 0.0), radius=10.0 * rmax / n,
                     mdot=mdot, vinf=2.0e8, t_wind=1.0e4,
                     rstar=7.0e11, evolution=evolution)
    phys = Physics(wind_sources=[src])
    sim = Simulation(cfg, jnp.asarray(P0), physics=phys)
    return sim, src


def test_wind_region_profile():
    sim, src = wind_sim()
    P = np.asarray(sim.P)
    cfg = sim.cfg
    R = cfg.cell_centers(0)
    z = cfg.cell_centers(1)
    RR, ZZ = np.meshgrid(R, z, indexing="ij")
    d = np.hypot(RR, ZZ)
    sel = (d > 0.8 * src.radius) & (d <= src.radius)
    rho_expect = src.mdot / (4.0 * np.pi * src.vinf * d[sel] ** 2)
    np.testing.assert_allclose(P[RO][sel], rho_expect, rtol=1e-10)
    # velocity is radial with magnitude vinf: vx (=v_z) ~ vinf * z/d
    np.testing.assert_allclose(P[VX][sel], src.vinf * ZZ[sel] / d[sel],
                               rtol=1e-10)
    np.testing.assert_allclose(P[VY][sel], src.vinf * RR[sel] / d[sel],
                               rtol=1e-10)


def test_wind_bubble_expands():
    sim, src = wind_sim(mdot=1.0e-5 * MSUN_YR)
    # ~600 yr: the bubble shell must emerge beyond the wind boundary region
    sim.run(tmax=2.0e10, max_steps=800)
    P = np.asarray(sim.P)
    assert np.all(np.isfinite(P))
    cfg = sim.cfg
    R = cfg.cell_centers(0)
    z = cfg.cell_centers(1)
    RR, ZZ = np.meshgrid(R, z, indexing="ij")
    d = np.hypot(RR, ZZ)
    # a shocked shell (density above ambient) must exist beyond the wind region
    ambient = 100.0 * M_P
    shell = (d > src.radius) & (P[RO] > 1.5 * ambient)
    assert shell.sum() > 5, "no swept-up shell formed"
    # free wind inside maintains the r^-2 profile
    sel = (d > 0.8 * src.radius) & (d <= src.radius)
    rho_expect = src.mdot / (4.0 * np.pi * src.vinf * d[sel] ** 2)
    np.testing.assert_allclose(P[RO][sel], rho_expect, rtol=1e-10)


def test_evolving_wind():
    ev = WindEvolution(
        time=np.array([0.0, 1.0e10]),
        mdot=np.array([1.0e-6 * MSUN_YR, 2.0e-6 * MSUN_YR]),
        vinf=np.array([2.0e8, 2.0e8]),
        t_wind=np.array([1.0e4, 1.0e4]),
        rstar=np.array([7.0e11, 7.0e11]),
    )
    sim, src = wind_sim(evolution=ev)
    w = sim.physics.winds[0]
    W0 = np.asarray(w.wind_state(sim.P, 0.0))
    W1 = np.asarray(w.wind_state(sim.P, 1.0e10))
    mask = np.asarray(w.mask) & ~np.asarray(w.inner)
    ratio = W1[RO][mask] / W0[RO][mask]
    np.testing.assert_allclose(ratio, 2.0, rtol=1e-6)
