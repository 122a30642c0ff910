"""1D shock-tube regression tests against exact solutions.

Equivalent of the reference's NG_shocktube suite gates (SURVEY.md §4):
field-level comparison against the analytic Riemann solution.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pion_tpu import Eqn, SimConfig, Simulation, Solver
from pion_tpu.constants import PG, RO, VX
from pion_tpu.ics import brio_wu, toro_tests
from pion_tpu.ops import riemann_hydro as rh
from pion_tpu.ops.eqns import prim_to_cons


def sod_cfg(n=256, solver=Solver.HLL, gamma=1.4, **kw):
    return SimConfig(
        ndim=1, eqn=Eqn.EULER, solver=solver, gamma=gamma,
        shape=(n,), xmin=(0.0,), xmax=(1.0,),
        bcs=(("outflow", "outflow"),), cfl=0.3, ooa=2,
        av="falle", etav=0.1, **kw,
    )


def test_exact_pstar_classic_sod():
    """Literature anchor: classic Sod (vl=0) has p*=0.30313, u*=0.92745
    (Toro 1999 table 4.3)."""
    cfg = sod_cfg()
    Pl = jnp.asarray(np.array([1.0, 1.0, 0.0, 0.0, 0.0])[:, None])
    Pr = jnp.asarray(np.array([0.125, 0.1, 0.0, 0.0, 0.0])[:, None])
    pstar, vstar = rh.exact_pstar(Pl, Pr, cfg)
    assert abs(float(pstar[0]) - 0.30313) < 1e-4
    assert abs(float(vstar[0]) - 0.92745) < 1e-4


@pytest.mark.parametrize("n", [1, 3, 4, 5])
def test_exact_pstar_toro(n):
    """Cross-check the Newton iteration against an independent bisection
    root of the same pressure function (PION's tests use the modified Sod
    with vl=0.75: reference shock_tube.cpp:475-485)."""
    cfg = sod_cfg()
    P0 = toro_tests(cfg, n)
    i_mid = np.argmax(np.diff(P0[RO] + P0[PG]) != 0)
    Pl = jnp.asarray(P0[:, : i_mid + 1][:, -1:])
    Pr = jnp.asarray(P0[:, i_mid + 1 :][:, :1])
    pstar, vstar = rh.exact_pstar(Pl, Pr, cfg)

    def f(p):
        return float(
            rh._fK(jnp.asarray([p]), Pl[:, 0:1], rh.sound_speed(Pl, cfg), cfg.gamma)[0]
            + rh._fK(jnp.asarray([p]), Pr[:, 0:1], rh.sound_speed(Pr, cfg), cfg.gamma)[0]
            + float(Pr[VX, 0] - Pl[VX, 0])
        )

    lo, hi = 1e-10, 1e5
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if f(lo) * f(mid) <= 0:
            hi = mid
        else:
            lo = mid
    p_ref = 0.5 * (lo + hi)
    assert abs(float(pstar[0]) - p_ref) / p_ref < 1e-5


def exact_profile(cfg, Pl, Pr, x, x0, t):
    """Analytic Riemann solution rho(x, t): shift frame so each sample point
    sits at xi = (x-x0)/t = 0."""
    s = (x - x0) / t
    nvar = cfg.nvar
    L = np.repeat(Pl[:, None], len(x), axis=1)
    R = np.repeat(Pr[:, None], len(x), axis=1)
    L[VX] -= s
    R[VX] -= s
    pstar, vstar = rh.exact_pstar(jnp.asarray(L), jnp.asarray(R), cfg)
    P0 = rh._sample_exact(jnp.asarray(L), jnp.asarray(R), pstar, vstar, cfg)
    out = np.array(P0)
    out[VX] += s
    return out


@pytest.mark.parametrize(
    "solver", [Solver.HLL, Solver.EXACT, Solver.RCV, Solver.RPV, Solver.FVS]
)
def test_sod_vs_exact(solver):
    cfg = sod_cfg(n=256, solver=solver, tmax=0.2)
    P0 = toro_tests(cfg, 1)
    sim = Simulation(cfg, jnp.asarray(P0))
    sim.run()
    x = cfg.cell_centers(0)
    Pl = P0[:, 0].copy()
    Pr = P0[:, -1].copy()
    ref = exact_profile(cfg, Pl, Pr, x, 0.3, sim.t)
    l1 = np.mean(np.abs(np.asarray(sim.P[RO]) - ref[RO])) / np.mean(ref[RO])
    assert l1 < 0.015, f"L1 density error {l1} too large for {solver}"


def test_toro2_no_nan():
    """Double rarefaction (near-vacuum) must stay finite."""
    cfg = sod_cfg(n=200, solver=Solver.HLL, tmax=0.15)
    P0 = toro_tests(cfg, 2)
    sim = Simulation(cfg, jnp.asarray(P0))
    sim.run()
    assert np.all(np.isfinite(np.asarray(sim.P)))
    assert np.all(np.asarray(sim.P[RO]) > 0)


def test_brio_wu_runs():
    cfg = SimConfig(
        ndim=1, eqn=Eqn.GLM, solver=Solver.HLLD, gamma=2.0,
        shape=(400,), xmin=(0.0,), xmax=(1.0,),
        bcs=(("outflow", "outflow"),), cfl=0.3, ooa=2,
        av="falle", etav=0.1, tmax=0.08,
    )
    P0 = brio_wu(cfg)
    sim = Simulation(cfg, jnp.asarray(P0))
    sim.run()
    out = np.asarray(sim.P)
    assert np.all(np.isfinite(out))
    # compound wave + shock structure: density must dip below left state and
    # the right-moving fast rarefaction must have started
    assert out[RO].min() > 0.1
    assert out[RO].max() <= 1.05
    # conservation of mass on outflow-free interior
    assert abs(out[RO].mean() - P0[RO].mean()) / P0[RO].mean() < 0.05


def test_mass_conservation_periodic():
    cfg = sod_cfg(n=128, solver=Solver.HLL, tmax=0.1).with_(
        bcs=(("periodic", "periodic"),)
    )
    P0 = toro_tests(cfg, 1)
    sim = Simulation(cfg, jnp.asarray(P0))
    U0 = np.asarray(prim_to_cons(jnp.asarray(P0), cfg))
    sim.run()
    U1 = np.asarray(prim_to_cons(sim.P, cfg))
    for v in (RO, VX):
        np.testing.assert_allclose(U1[v].sum(), U0[v].sum(), rtol=1e-10)


def test_roe_mhd_uniform_consistency():
    """Roe-MHD flux of identical states equals the exact flux."""
    import jax.numpy as jnp
    from pion_tpu.ops import riemann_mhd as rm
    from pion_tpu.ops.eqns import flux_from_prim

    cfg = SimConfig(ndim=1, eqn=Eqn.MHD, gamma=5.0 / 3.0, shape=(4,),
                    xmin=(0.0,), xmax=(1.0,), bcs=(("outflow", "outflow"),))
    P = jnp.asarray(np.array(
        [[1.2], [0.8], [0.3], [-0.2], [0.1], [0.6], [0.5], [-0.4]]))
    f, _ = rm.roe_cv(P, P, cfg)
    np.testing.assert_allclose(np.asarray(f), np.asarray(flux_from_prim(P, cfg)),
                               rtol=1e-12, atol=1e-13)


def test_brio_wu_roe_mhd():
    cfg = SimConfig(
        ndim=1, eqn=Eqn.GLM, solver="roe", gamma=2.0,
        shape=(256,), xmin=(0.0,), xmax=(1.0,),
        bcs=(("outflow", "outflow"),), cfl=0.3, ooa=2,
        av="falle", etav=0.1, tmax=0.08,
    )
    P0 = brio_wu(cfg)
    sim = Simulation(cfg, jnp.asarray(P0))
    sim.run()
    out = np.asarray(sim.P)
    assert np.all(np.isfinite(out))
    assert out[RO].min() > 0.05 and out[RO].max() <= 1.1
    # cross-check against HLLD: same problem, solutions should agree well
    cfg2 = cfg.with_(solver="hlld")
    sim2 = Simulation(cfg2, jnp.asarray(brio_wu(cfg2)))
    sim2.run()
    l1 = np.mean(np.abs(out[RO] - np.asarray(sim2.P[RO])))
    assert l1 < 0.02, f"Roe vs HLLD L1 {l1}"


def test_2d_extruded_sod_matches_1d():
    """2D ShockTube with angle 0 is a pure extrusion: with the same dt
    sequence every row evolves exactly like the 1D run (the transverse
    sweep sees uniform data and cancels; reference: shock_tube.cpp:338-365)."""
    from pion_tpu.ics.shocktube import shocktube

    n = 128
    L = [1.0, 1.0, 0.75, 0.0, 0.0]
    R = [0.125, 0.1, 0.0, 0.0, 0.0]
    cfg1 = sod_cfg(n=n, tmax=0.05)
    # sharp 1D IC (the generator smooths 1D per the reference; build the
    # sharp version by slicing one row of a 2D extrusion)
    cfg2 = SimConfig(
        ndim=2, eqn=Eqn.EULER, solver=Solver.HLL, gamma=1.4,
        shape=(8, n), xmin=(0.0, 0.0), xmax=(8.0 / n, 1.0),
        bcs=(("periodic", "periodic"), ("outflow", "outflow")),
        cfl=0.3, ooa=2, av="falle", etav=0.1, tmax=0.05,
    )
    P2 = shocktube(cfg2, L, R, 0.3)
    assert P2.shape == (cfg2.nvar,) + cfg2.shape
    P1 = P2[:, 0, :].copy()

    sim1 = Simulation(cfg1, jnp.asarray(P1))
    sim2 = Simulation(cfg2, jnp.asarray(P2))
    dt = 0.8 * sim1.compute_dt()
    for _ in range(40):
        sim1.P = sim1.fns.advance(sim1.P, dt, sim1.t)
        sim2.P = sim2.fns.advance(sim2.P, dt, sim2.t)
    out2 = np.asarray(sim2.P)
    for row in range(8):
        np.testing.assert_allclose(out2[:, row, :], np.asarray(sim1.P),
                                   rtol=1e-12, atol=1e-12)


def test_rotated_shocktube_ics():
    """STangleXY rotates the state vectors and tilts the interface
    (reference: shock_tube.cpp:342-365)."""
    from pion_tpu.constants import VY
    from pion_tpu.ics.shocktube import shocktube

    cfg = SimConfig(
        ndim=2, eqn=Eqn.EULER, gamma=1.4, shape=(64, 64),
        xmin=(0.0, 0.0), xmax=(1.0, 1.0),
        bcs=(("outflow", "outflow"),) * 2,
    )
    L = np.zeros(cfg.nvar); L[RO], L[PG], L[VX] = 1.0, 1.0, 1.0
    R = np.zeros(cfg.nvar); R[RO], R[PG] = 0.125, 0.1
    th = np.deg2rad(30.0)
    P = shocktube(cfg, L, R, 0.5, angle_xy=th)
    # left-state velocity rotated into (cos, sin)
    msk = P[RO] == 1.0
    np.testing.assert_allclose(P[VX][msk], np.cos(th), rtol=1e-12)
    np.testing.assert_allclose(P[VY][msk], np.sin(th), rtol=1e-12)
    # interface is oblique: crossing position shifts with y by tan(theta)
    x = cfg.cell_centers(1)
    rows = [8, 48]
    xc = [x[np.argmax(P[RO, r] < 0.5)] for r in rows]
    y = cfg.cell_centers(0)
    expect_shift = -(y[rows[1]] - y[rows[0]]) * np.tan(th)
    assert abs((xc[1] - xc[0]) - expect_shift) < 2.5 * cfg.dx


def test_snapshot_shape_validation(tmp_path):
    """save_snapshot rejects a state whose shape contradicts the config
    (the round-2 end-to-end breakage class)."""
    from pion_tpu.io import save_snapshot

    cfg = SimConfig(ndim=2, shape=(16, 16), xmin=(0, 0), xmax=(1, 1),
                    bcs=(("outflow", "outflow"),) * 2)
    bad = np.zeros((cfg.nvar, 16))  # 1D array for a 2D config
    with pytest.raises(ValueError, match="does not match"):
        save_snapshot(str(tmp_path / "x"), bad, cfg, 0.0)
    with pytest.raises(ValueError, match="state shape"):
        Simulation(cfg, jnp.asarray(bad))


def test_exact_solver_cavitation_branch():
    """Vacuum-generating data through the EXACT solver (reference:
    riemann.cpp solve_cavitation; the upstream binary aborts on Toro2 with
    the exact solver — handling it is strictly beyond reference parity).
    Strong double rarefaction: u_R - u_L >= 2(c_L+c_R)/(g-1)."""
    cfg = sod_cfg()
    # Toro2-like but strong enough to cavitate: c = sqrt(1.4*0.4/1) ~ 0.75
    # -> threshold du = 2*(0.75+0.75)/0.4 = 7.48
    Pl = jnp.asarray(np.array([1.0, 0.4, -4.0, 0.0, 0.0])[:, None])
    Pr = jnp.asarray(np.array([1.0, 0.4, +4.0, 0.0, 0.0])[:, None])
    F, P0 = rh.exact(Pl, Pr, cfg)
    assert np.all(np.isfinite(np.asarray(F)))
    assert np.all(np.isfinite(np.asarray(P0)))
    # at x/t=0 the cavity sits over the interface: near-vacuum state
    assert float(P0[RO, 0]) < 1.0e-4
    assert float(P0[PG, 0]) < 1.0e-4
    # one-sided sweep: everything moving right -> left input state
    Pl2 = jnp.asarray(np.array([1.0, 0.4, 5.0, 0.0, 0.0])[:, None])
    Pr2 = jnp.asarray(np.array([1.0, 0.4, 20.0, 0.0, 0.0])[:, None])
    _, P02 = rh.exact(Pl2, Pr2, cfg)
    np.testing.assert_allclose(np.asarray(P02[:, 0]),
                               np.asarray(Pl2[:, 0]), rtol=1e-12)


def test_toro2_exact_solver_end_to_end():
    """Full Toro2 run with the exact solver (the configuration the
    reference binary crashes on): finite, positive, symmetric."""
    cfg = sod_cfg(n=200, solver=Solver.EXACT, tmax=0.15)
    P0 = toro_tests(cfg, 2)
    sim = Simulation(cfg, jnp.asarray(P0))
    sim.run()
    P = np.asarray(sim.P)
    assert np.all(np.isfinite(P))
    assert np.all(P[RO] > 0)
    # central rarefaction trough
    assert P[RO][cfg.shape[0] // 2] < 0.2 * P[RO][0]


def test_roe_pv_distinct_and_accurate():
    """The Roe-mean PV solver (reference:
    Roe_Hydro_PrimitiveVar_solver.cpp) must differ from the
    arithmetic-mean linear solver on asymmetric states and be at least as
    close to the exact p* there."""
    cfg = sod_cfg()
    Pl = jnp.asarray(np.array([1.0, 1.0, 0.75, 0.0, 0.0])[:, None])
    Pr = jnp.asarray(np.array([0.125, 0.1, 0.0, 0.0, 0.0])[:, None])
    _, p_roe = rh.roe_pv(Pl, Pr, cfg)
    _, p_lin = rh.linear_pv(Pl, Pr, cfg)
    p_ex, _ = rh.exact_pstar(Pl, Pr, cfg)
    assert float(p_roe[PG, 0]) != float(p_lin[PG, 0])
    err_roe = abs(float(p_roe[PG, 0]) - float(p_ex[0]))
    err_lin = abs(float(p_lin[PG, 0]) - float(p_ex[0]))
    assert err_roe < 1.5 * err_lin  # not wildly worse; usually better


def test_fvs_interface_state_roe_average():
    """FVS pstar is the Roe average (reference: Riemann_FVS_hydro.cpp:177)
    rather than the arithmetic mean."""
    cfg = sod_cfg()
    Pl = jnp.asarray(np.array([4.0, 2.0, 1.0, 0.0, 0.0])[:, None])
    Pr = jnp.asarray(np.array([1.0, 0.5, -1.0, 0.0, 0.0])[:, None])
    _, pstar = rh.fvs(Pl, Pr, cfg)
    # Roe density = sqrt(rho_l*rho_r) = 2; velocity sqrt-weighted
    assert float(pstar[RO, 0]) == pytest.approx(2.0, rel=1e-12)
    wl, wr = 2.0 / 3.0, 1.0 / 3.0
    assert float(pstar[rh.VX, 0]) == pytest.approx(wl * 1.0 + wr * (-1.0),
                                                   rel=1e-12)


def test_sod_rpv_end_to_end():
    """Shocktube through the distinct RPV solver stays accurate."""
    cfg = sod_cfg(n=200, solver=Solver.RPV, tmax=0.2)
    P0 = toro_tests(cfg, 1)
    sim = Simulation(cfg, jnp.asarray(P0))
    sim.run()
    P = np.asarray(sim.P)
    assert np.all(np.isfinite(P)) and np.all(P[RO] > 0)
