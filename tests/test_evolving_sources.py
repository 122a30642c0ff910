"""Evolving radiation sources (reference: update_evolving_RT_sources,
setup_fixed_grid.cpp:595-790): source strength / Teff / Rstar follow a
stellar-evolution table in time; mfion photoion tables are re-integrated
when the star moves >1% in L or T; the ionizing flux in a run follows the
table."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from pion_tpu import Eqn, SimConfig, Simulation
from pion_tpu.constants import K_B, PG, RO, RSUN
from pion_tpu.microphysics import MPv3, MPv3Config
from pion_tpu.physics import Physics
from pion_tpu.raytracing import Source, StarEvolution

LSUN = 3.828e33


def write_evo(path, times, lums, teffs):
    """Reference evo-file format: 2 header lines then
    'time M L Teff Mdot vrot vcrit vinf' (stellar_wind_BC.cpp:1034)."""
    with open(path, "w") as f:
        f.write("# synthetic stellar evolution table\n")
        f.write("# time M L Teff Mdot vrot vcrit vinf\n")
        for t, L, T in zip(times, lums, teffs):
            f.write(f"{t:.6e} 2.0e34 {L:.6e} {T:.6e} "
                    "1.0e19 1.0e5 1.0e8 2.0e8\n")


def test_star_evolution_interpolation(tmp_path):
    p = str(tmp_path / "evo.txt")
    write_evo(p, [0.0, 1.0e6, 2.0e6],
              [1.0e38, 1.0e39, 1.0e39], [3.0e4, 4.0e4, 4.0e4])
    evo = StarEvolution.from_file(p)
    L0, T0, R0 = evo.at(0.0)
    assert np.isclose(L0, 1.0e38, rtol=1e-6)
    assert np.isclose(T0, 3.0e4, rtol=1e-6)
    # Stefan-Boltzmann radius
    assert np.isclose(R0, np.sqrt(1.0e38 / (4 * np.pi * 5.670367e-5
                                            * (3.0e4) ** 4)), rtol=1e-6)
    # log-linear midpoint (reference interpolates the LOGS linearly)
    Lm, Tm, _ = evo.at(0.5e6)
    assert np.isclose(Lm, 10 ** (0.5 * (38 + 39)), rtol=1e-6)
    # clamped past the end (reference holds the last line)
    Le, Te, _ = evo.at(5.0e6)
    assert np.isclose(Le, 1.0e39, rtol=1e-6) and np.isclose(Te, 4.0e4)


def _mini_physics(tmp_path, effect, lums, teffs, tstar=3.0e4):
    p = str(tmp_path / "evo.txt")
    write_evo(p, [0.0, 1.0e6, 2.0e6], lums, teffs)
    evo = StarEvolution.from_file(p)
    mpc = MPv3Config(tracer_slot=5, ion_src=effect,
                     n_idot=1.0e48, tstar=tstar, rstar_cm=10 * RSUN)
    mp = MPv3(mpc)
    src = Source(position=(1.5e18,), strength=1.0e38, effect=effect,
                 evolution=evo)
    cfg = SimConfig(ndim=1, eqn=Eqn.EULER, ntracer=1, solver="hll",
                    shape=(16,), xmin=(0.0,), xmax=(3.0e18,),
                    bcs=(("outflow", "outflow"),), tmax=1.0e15,
                    min_temperature=50.0)
    phys = Physics(mp=mp, sources=[src], dt_limit=False)
    from pion_tpu.grid import make_geometry

    phys.setup(cfg, make_geometry(cfg))
    return phys, cfg


def test_update_sources_mono_scales_with_L(tmp_path):
    phys, _ = _mini_physics(tmp_path, "mono",
                            [1.0e38, 1.0e40, 1.0e40], [3.0e4, 3.0e4, 3.0e4])
    sp0 = phys.update_sources(0.0)
    sp1 = phys.update_sources(1.0e6)
    # strength follows L: rel = L(t)/strength0 (reference sets
    # rs->strength = Lnow)
    assert np.isclose(float(sp0["0"]["rel"]), 1.0, rtol=1e-6)
    assert np.isclose(float(sp1["0"]["rel"]), 100.0, rtol=1e-6)


def test_update_sources_hysteresis(tmp_path):
    phys, _ = _mini_physics(tmp_path, "mono",
                            [1.0e38, 1.0e38 * 1.001, 1.0e38], [3e4, 3e4, 3e4])
    sp0 = phys.update_sources(0.0)
    # 0.1% L change: below the reference's 1% re-apply threshold
    sp1 = phys.update_sources(1.0e6)
    assert float(sp0["0"]["rel"]) == float(sp1["0"]["rel"])


def test_update_sources_mfion_rebuilds_tables(tmp_path):
    phys, _ = _mini_physics(tmp_path, "mfion",
                            [1.0e38, 1.0e38, 1.0e38], [3.0e4, 4.5e4, 4.5e4],
                            tstar=3.0e4)
    sp0 = phys.update_sources(0.0)
    sp1 = phys.update_sources(1.0e6)
    # hotter star -> harder spectrum -> different normalized table
    s0 = np.asarray(sp0["0"]["tau_stack"])
    s1 = np.asarray(sp1["0"]["tau_stack"])
    assert s0.shape == s1.shape == (200, 4)
    assert not np.allclose(s0, s1)
    # hotter + bigger flux -> larger absolute rate scale
    assert float(sp1["0"]["rel"]) > float(sp0["0"]["rel"])


def test_run_ionizing_flux_follows_table(tmp_path):
    """End-to-end: two otherwise-identical runs — one with a flat table,
    one whose L ramps 100x — the ramping star must ionize much more."""

    def run(lums):
        p = str(tmp_path / f"evo_{lums[1]:.0e}.txt")
        write_evo(p, [0.0, 3.0e9, 1.0e12], lums, [3.0e4] * 3)
        evo = StarEvolution.from_file(p)
        n = 32
        L = 3.0e18
        cfg = SimConfig(ndim=2, eqn=Eqn.EULER, ntracer=1, solver="hll",
                        shape=(n, n), xmin=(0.0, 0.0), xmax=(L, L),
                        bcs=(("outflow", "outflow"),) * 2, cfl=0.3, ooa=2,
                        av="falle", etav=0.1, min_temperature=50.0,
                        tmax=1.0e15)
        mpc = MPv3Config(tracer_slot=cfg.eqn.nbase, ion_src="mono",
                         n_idot=1.0e45, min_temperature=50.0)
        src = Source(position=(1.5e18, 1.5e18), strength=1.0e45,
                     effect="mono", evolution=evo)
        phys = Physics(mp=MPv3(mpc), sources=[src], dt_limit=False)
        nH = 10.0
        P0 = np.zeros((cfg.nvar,) + cfg.shape)
        P0[RO] = nH * mpc.mean_mass_per_h
        P0[PG] = 1.1 * nH * K_B * 100.0
        P0[cfg.eqn.nbase] = 1.0e-6
        sim = Simulation(cfg, jnp.asarray(P0), physics=phys)
        # fixed dt so both runs cross the table's L ramp at 3e9 s
        dt = 3.0e8
        P = sim.P
        for k in range(20):
            t = k * dt
            sp = phys.update_sources(t)
            P = sim.fns.advance(P, dt, t, sp)
        x = np.asarray(P)[cfg.eqn.nbase]
        assert np.all(np.isfinite(np.asarray(P)))
        return float(x.sum())

    flat = run([1.0e45, 1.0e45, 1.0e45])
    ramp = run([1.0e45, 1.0e47, 1.0e47])
    assert ramp > 3.0 * flat, (flat, ramp)


def test_cli_reads_rt_evo_file(tmp_path):
    """RT_EVO_FILE_0 in a param file attaches the evolution table."""
    from pion_tpu.cli import physics_from_params

    evo_path = str(tmp_path / "evo.txt")
    write_evo(evo_path, [0.0, 1.0e6], [1.0e38, 1.0e39], [3.0e4, 3.5e4])
    cfg = SimConfig(ndim=1, eqn=Eqn.EULER, ntracer=1, solver="hll",
                    shape=(16,), xmin=(0.0,), xmax=(3.0e18,),
                    bcs=(("outflow", "outflow"),), tmax=1.0e15)
    params = {
        "chem_code": "MPv3",
        "RT_Nsources": "1",
        "RT_position_0_0": "0.0",
        "RT_strength_0": "1.0e48",
        "RT_effect__0": "2",
        "RT_EVO_FILE_0": evo_path,
        "Tracer000": "H1+",
    }
    phys = physics_from_params(cfg, params)
    assert phys.sources[0].evolution is not None
    L, T, _ = phys.sources[0].evolution.at(1.0e6)
    assert np.isclose(L, 1.0e39, rtol=1e-6)
