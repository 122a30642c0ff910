"""Classic 2D test problems: DMR, KH, implosion, jet, shock-cloud.

These mirror the reference's test_problems suite gates (SURVEY.md §4):
stability, symmetry and qualitative structure.
"""
import numpy as np
import jax.numpy as jnp

from pion_tpu import Eqn, SimConfig, Simulation
from pion_tpu.boundaries import BoundaryData
from pion_tpu.constants import PG, RO, VX, VY, VZ, Coord
from pion_tpu.ics import (
    double_mach_reflection,
    jet_ambient,
    jet_state,
    kelvin_helmholtz,
    liska_wendroff_implosion,
    shock_cloud,
)


def test_double_mach_reflection():
    n = 64
    cfg = SimConfig(
        ndim=2, eqn=Eqn.EULER, solver="hll", gamma=1.4,
        shape=(n // 4, n), xmin=(0.0, 0.0), xmax=(1.0, 4.0),
        bcs=(("dmach2", "dmach"), ("fixed", "outflow")),
        cfl=0.3, ooa=2, av="falle", etav=0.1, tmax=0.05,
    )
    P0 = double_mach_reflection(cfg)
    sim = Simulation(cfg, jnp.asarray(P0))
    sim.run()
    out = np.asarray(sim.P)
    assert np.all(np.isfinite(out))
    # shock has advanced: peak density above the planar post-shock value
    # (the Mach stem produces rho > 8)
    assert out[RO].max() > 10.0
    assert out[RO].min() > 1.0


def test_kelvin_helmholtz_grows():
    n = 64
    cfg = SimConfig(
        ndim=2, eqn=Eqn.EULER, solver="hll", gamma=1.4,
        shape=(n, n), xmin=(0.0, 0.0), xmax=(1.0, 1.0),
        bcs=(("periodic", "periodic"), ("periodic", "periodic")),
        cfl=0.3, ooa=2, av="falle", etav=0.1, tmax=2.0,
    )
    P0 = kelvin_helmholtz(cfg, amp=0.02)
    sim = Simulation(cfg, jnp.asarray(P0))
    sim.run()
    out = np.asarray(sim.P)
    assert np.all(np.isfinite(out))
    # transverse kinetic energy must grow from the seeded perturbation
    ke0 = 0.5 * (P0[RO] * P0[3] ** 2).mean()
    ke1 = 0.5 * (out[RO] * out[3] ** 2).mean()
    assert ke1 > 3.0 * ke0


def test_liska_wendroff_symmetry():
    n = 64
    cfg = SimConfig(
        ndim=2, eqn=Eqn.EULER, solver="exact", gamma=1.4,
        shape=(n, n), xmin=(0.0, 0.0), xmax=(0.3, 0.3),
        bcs=(("reflecting", "reflecting"), ("reflecting", "reflecting")),
        cfl=0.3, ooa=2, av="falle", etav=0.1, tmax=0.5,
    )
    P0 = liska_wendroff_implosion(cfg)
    sim = Simulation(cfg, jnp.asarray(P0))
    sim.run(max_steps=300)
    out = np.asarray(sim.P)
    assert np.all(np.isfinite(out))
    # the solution must stay symmetric under (x,y) -> (y,x):
    # rho(i,j) == rho(j,i) and vx(i,j) == vy(j,i)
    np.testing.assert_allclose(out[RO], out[RO].T, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(out[2], out[3].T, rtol=1e-8, atol=1e-11)


def test_jet_propagates():
    n = 64
    cfg = SimConfig(
        ndim=2, eqn=Eqn.EULER, solver="hll", gamma=1.4, ntracer=1,
        shape=(n // 2, n), xmin=(0.0, 0.0), xmax=(1.0, 2.0),
        bcs=(("reflecting", "outflow"), ("jet", "outflow")),
        cfl=0.3, ooa=2, av="falle", etav=0.1, tmax=0.12,
    )
    P0 = jet_ambient(cfg)
    js = jet_state(cfg, rho_jet=1.0, p_jet=1.0, v_jet=10.0)
    sim = Simulation(cfg, jnp.asarray(P0))
    # inject the jet through the BC
    sim.bdata = BoundaryData(fixed=sim.bdata.fixed, jet=(0.1, js))
    sim.fns = __import__("pion_tpu.stepper", fromlist=["make_step_fns"]).\
        make_step_fns(cfg, sim.geom, sim.bdata)
    sim.run()
    out = np.asarray(sim.P)
    assert np.all(np.isfinite(out))
    # jet tracer has propagated into the domain
    tr = out[cfg.eqn.nbase]
    x = cfg.cell_centers(1)
    jet_extent = x[np.argmax(np.max(tr, axis=0) > 0.5 * tr.max())]
    assert tr.max() > 0.5
    assert np.max(tr[:, n // 4 :]) > 0.1, "jet did not propagate"


def test_shock_cloud():
    n = 64
    cfg = SimConfig(
        ndim=2, eqn=Eqn.EULER, solver="hll", gamma=1.4, ntracer=1,
        shape=(n // 2, n), xmin=(0.0, 0.0), xmax=(0.5, 1.0),
        bcs=(("outflow", "outflow"), ("inflow", "outflow")),
        cfl=0.3, ooa=2, av="falle", etav=0.1, tmax=0.06,
    )
    P0 = shock_cloud(cfg, mach=10.0, cloud_center=(0.25, 0.5), r_cloud=0.1)
    sim = Simulation(cfg, jnp.asarray(P0))
    sim.run()
    out = np.asarray(sim.P)
    assert np.all(np.isfinite(out))
    # the cloud is being compressed: max density above both initial values
    assert out[RO].max() > 1.05 * P0[RO].max()


def test_laser_ablation_ic():
    from pion_tpu.ics.problems import laser_ablation
    cfg = SimConfig(ndim=2, eqn=Eqn.EULER, coords=Coord.CYLINDRICAL,
                    solver="hll", shape=(64, 8), xmin=(0.0, 0.0),
                    xmax=(0.08, 0.01), ntracer=1,
                    bcs=(("axisymmetric", "outflow"),
                         ("reflecting", "outflow")))
    P = laser_ablation(cfg, vel0=1.0e5, rho0=1.0, dratio=100.0,
                       p0=1.0e10, pratio=100.0)
    assert np.all(np.isfinite(P))
    # dense slab at small x, small y; dilute ambient at large y
    assert P[RO][0, 0] == 1.0
    assert abs(P[RO][-1, -1] - 0.01) < 1e-12
    # ramp is monotone in y between 0.04 and 0.06
    y = cfg.cell_centers(0)
    sel = (y >= 0.04) & (y < 0.06)
    col = P[RO][sel, 0]
    assert np.all(np.diff(col) <= 0)


def test_map_1d_to_2d_spherical_profile():
    """A 1D spherical wind profile maps onto the 2D axisymmetric grid with
    radial velocity projection (reference: read_1Dto2D.cpp)."""
    from pion_tpu.ics.problems import map_1d_to_2d
    cfg1 = SimConfig(ndim=1, coords=Coord.SPHERICAL, solver="hll",
                     shape=(256,), xmin=(0.0,), xmax=(1.0,),
                     bcs=(("reflecting", "outflow"),))
    r = np.linspace(1e-3, 1.45, 400)
    nvar = 5
    data = np.zeros((nvar, r.size))
    data[RO] = 1.0 / r**2
    data[PG] = 1.0 / r**(10.0 / 3.0)
    data[VX] = 2.0         # radial velocity
    cfg2 = SimConfig(ndim=2, coords=Coord.CYLINDRICAL, solver="hll",
                     shape=(32, 64), xmin=(0.0, -1.0), xmax=(1.0, 1.0),
                     bcs=(("axisymmetric", "outflow"),
                          ("outflow", "outflow")))
    P = map_1d_to_2d(r, data, cfg2)
    assert np.all(np.isfinite(P))
    Y, X = np.meshgrid(cfg2.cell_centers(0), cfg2.cell_centers(1),
                       indexing="ij")
    d = np.hypot(X, Y)
    sel = (d > 0.2) & (d < 0.9)
    np.testing.assert_allclose(P[RO][sel], 1.0 / d[sel] ** 2, rtol=5e-3)
    # velocity is radial with magnitude 2
    vmag = np.hypot(P[VX], P[VY])
    np.testing.assert_allclose(vmag[sel], 2.0, rtol=1e-6)
    np.testing.assert_allclose((P[VX] * Y - P[VY] * X)[sel] / d[sel], 0.0,
                               atol=1e-10)


def test_from_turbulence_cube():
    from pion_tpu.ics.problems import from_turbulence_cube
    rng = np.random.default_rng(7)
    cube = np.exp(rng.normal(size=(32, 32, 32)))
    vx = rng.normal(size=(32, 32, 32))
    vy = rng.normal(size=(32, 32, 32))
    vz = rng.normal(size=(32, 32, 32))
    cfg = SimConfig(ndim=3, solver="hll", shape=(48, 48, 48),
                    xmin=(0.0,) * 3, xmax=(1.0,) * 3,
                    bcs=(("periodic", "periodic"),) * 3)
    P = from_turbulence_cube(cfg, cube, v_cubes=[vz, vy, vx][::-1],
                             rho_mean=2.0, p0=0.5, v_rms=3.0)
    assert np.all(np.isfinite(P))
    np.testing.assert_allclose(P[RO].mean(), 2.0, rtol=1e-12)
    rms = np.sqrt((P[VX] ** 2 + P[VY] ** 2 + P[VZ] ** 2).mean())
    np.testing.assert_allclose(rms, 3.0, rtol=1e-12)
    assert P[RO].min() > 0


def test_multi_clumps_fixnum_fixmass():
    """FixNum places exactly N clumps; FixMass spends the mass budget
    (reference: photoevaporating_multiclumps.cpp:756-840)."""
    from pion_tpu.ics import multi_clumps

    cfg = SimConfig(ndim=2, eqn="euler", solver="hll", ntracer=1,
                    shape=(64, 64), xmin=(0.0, 0.0), xmax=(1.0, 1.0),
                    bcs=(("outflow", "outflow"),) * 2, cfl=0.3)
    P = multi_clumps(cfg, mode="fixnum", n_clumps=5, rho_amb=1.0)
    dx2 = cfg.dx**2
    assert P[RO].min() >= 1.0 and P[RO].max() > 2.0
    assert np.all(P[-1] >= 0) and np.all(P[-1] <= 1)

    # fixmass: integrated overdensity ~= budget (clumps fully on-grid)
    M = 3.0
    P2 = multi_clumps(cfg, mode="fixmass", total_mass=M, rho_amb=1.0,
                      r_range=(0.02, 0.04), region=(0.3, 0.7))
    got = (P2[RO] - 1.0).sum() * dx2
    assert abs(got - M) / M < 0.15  # Gaussian tails + discretization

    # strategic clump lands where asked
    P3 = multi_clumps(cfg, mode="fixnum", n_clumps=1,
                      strategic=(((0.25, 0.75), 2.0, 0.05),))
    iy, ix = np.unravel_index(np.argmax(P3[RO]), cfg.shape)
    x = cfg.cell_centers(0)[iy], cfg.cell_centers(1)[ix]
    assert abs(x[0] - 0.25) < 0.1 or abs(x[1] - 0.75) < 0.1


def test_multi_clumps_radial_ambient():
    from pion_tpu.ics import multi_clumps

    cfg = SimConfig(ndim=2, eqn="euler", solver="hll", shape=(32, 32),
                    xmin=(0.0, 0.0), xmax=(1.0, 1.0),
                    bcs=(("outflow", "outflow"),) * 2, cfl=0.3)
    P = multi_clumps(cfg, mode="fixnum", n_clumps=0 or 1, rho_amb=2.0,
                     radial_slope=2.0, cloud_center=(0.0, 0.0),
                     cloud_radius=0.2, mass_range=(1e-6, 2e-6))
    # density falls off ~r^-2 from the cloud centre outside the core
    c = P[RO]
    assert c[0, 0] > c[-1, -1]


def test_photoevap_cloudclump_runs():
    from pion_tpu.ics import photoevap_cloudclump

    cfg = SimConfig(ndim=2, eqn="euler", solver="hll", ntracer=1,
                    shape=(32, 32), xmin=(0.0, 0.0), xmax=(1.0, 1.0),
                    bcs=(("outflow", "outflow"),) * 2, cfl=0.3, tmax=0.02)
    P0 = photoevap_cloudclump(cfg)
    assert P0[RO].max() > 50.0 and np.all(np.isfinite(P0))
    sim = Simulation(cfg, jnp.asarray(P0))
    sim.run()
    assert np.all(np.isfinite(np.asarray(sim.P)))


def test_clump_axisymmetric_with_field():
    """Clump_Axisymmetric: 2D cylindrical clump with uniform B
    (reference: spherical_clump.cpp:129-133)."""
    from pion_tpu.ics import spherical_clump

    cfg = SimConfig(ndim=2, eqn="glm", solver="hlld", coords="cylindrical",
                    ntracer=1, shape=(32, 64), xmin=(0.0, -1.0),
                    xmax=(1.0, 1.0),
                    bcs=(("axisymmetric", "outflow"), ("outflow", "outflow")),
                    cfl=0.3, tmax=0.02)
    P0 = spherical_clump(cfg, center=(0.0, 0.0), B0=(0.0, 0.1, 0.0),
                         v0=(0.0, 0.5, 0.0))
    sim = Simulation(cfg, jnp.asarray(P0))
    sim.run()
    P = np.asarray(sim.P)
    assert np.all(np.isfinite(P)) and sim.t >= 0.02


def test_advect_sine_wave_period():
    """AdvectSineWave: after one full period the profile returns to its
    initial phase (smooth-profile accuracy test, icgen_base.cpp:47)."""
    import numpy as np
    import jax.numpy as jnp
    from pion_tpu import SimConfig, Simulation
    from pion_tpu.ics import advect_sine_wave

    cfg = SimConfig(ndim=1, eqn="euler", solver="hll", shape=(128,),
                    xmin=(0.0,), xmax=(1.0,), bcs=(("periodic", "periodic"),),
                    cfl=0.4, ooa=2, tmax=1.0)
    P0 = advect_sine_wave(cfg, v=(1.0, 0.0, 0.0))
    sim = Simulation(cfg, jnp.asarray(P0))
    sim.run()  # one period at v=1 over unit box
    err = np.abs(np.asarray(sim.P)[0] - P0[0]).mean()
    assert err < 5.0e-4, err
