"""CLI entry-point tests: the icgen / pion binaries equivalent
(reference: ics/icgen.cpp:83-257, main.cpp:62-158)."""
import numpy as np

from pion_tpu.cli import (build_ics, icgen_main, physics_from_params,
                          run_main, sources_from_params, winds_from_params)
from pion_tpu.io import load_snapshot
from pion_tpu.io.params import config_from_params, read_paramfile

PARAMS = """\
# tiny blast-wave run in the reference param dialect
ndim 2
coordinates cartesian
eqn euler
solver 8
OrderOfAccSpace 2
GAMMA 1.666666667
CFL 0.3
ArtificialViscosity 1
EtaViscosity 0.1
ics BlastWave
OutputFile cli_blast
OutputPath {path}/
OutputFrequency 0
StartTime 0.0
FinishTime 0.02
ntracer 0
chem_code None
noise -1
NGridX 32
NGridY 32
NGridZ 1
Xmin 0.0
Ymin 0.0
Zmin 0.0
Xmax 1.0
Ymax 1.0
Zmax 0.0
BC_XN outflow
BC_XP outflow
BC_YN outflow
BC_YP outflow
RT_Nsources 0
WIND_NSRC 0
"""


def _write_params(tmp_path):
    p = tmp_path / "params_blast.txt"
    p.write_text(PARAMS.format(path=tmp_path))
    return str(p)


def test_icgen_and_run(tmp_path):
    pf = _write_params(tmp_path)
    snap = icgen_main([pf])
    cfg, P, t, step = load_snapshot(snap)
    assert cfg.shape == (32, 32) and t == 0.0 and step == 0
    assert np.all(np.isfinite(P)) and P[1].max() > P[1].min()

    # run from the param file (generates ICs itself)
    sim = run_main([pf, "max_steps=5"])
    assert sim.step_count == 5 and np.all(np.isfinite(np.asarray(sim.P)))

    # restart mode from the icgen snapshot
    sim2 = run_main([snap, "FinishTime=1.0e-3"])
    assert sim2.t >= 1.0e-3 * (1 - 1e-9)


def test_rt_wind_param_sections(tmp_path):
    """RT_* and WIND_* sections parse into Source/WindSource with the
    reference's unit conventions (Msun/yr, km/s)."""
    from pion_tpu.constants import MSUN, YEAR

    pf = "/root/reference/test_problems/RCW120/param_RCW120_WindHIIR.txt"
    params = read_paramfile(pf)
    cfg = config_from_params(params)
    srcs = sources_from_params(cfg, params)
    assert len(srcs) == 2
    assert srcs[0].effect == "mfion" and srcs[0].strength == 2.40e38
    assert srcs[1].effect == "uv_heating"
    winds = winds_from_params(cfg, params)
    assert len(winds) == 1
    w = winds[0]
    assert abs(w.mdot - 1.55e-7 * MSUN / YEAR) / w.mdot < 1e-12
    assert w.vinf == 2000.0e5
    assert w.radius == 1.2055e17
    assert w.tracers[:2] == (0.9999999, 1.0)
    phys = physics_from_params(cfg, params)
    assert phys is not None and phys.mp is not None
    assert phys.mp.name == "MPv5"
    assert len(phys.wind_sources) == 1 and len(phys.sources) == 2


def test_build_ics_menu_smoke():
    """Every dispatchable ics name builds a finite state on a small grid."""
    base = dict(PARAMS=None)
    hydro2d = {"ndim": "2", "coordinates": "cartesian", "eqn": "euler",
               "NGridX": "16", "NGridY": "16", "Xmin": "0.0", "Ymin": "0.0",
               "Xmax": "1.0", "Ymax": "1.0", "BC_XN": "outflow",
               "BC_XP": "outflow", "BC_YN": "outflow", "BC_YP": "outflow",
               "ntracer": "1"}
    mhd2d = dict(hydro2d, eqn="glm")
    cases = [
        ("Advection", hydro2d), ("AdvectSineWave", hydro2d),
        ("KelvinHelmholz", hydro2d), ("LiskaWendroffImplosion", hydro2d),
        ("DoubleMachRef", hydro2d), ("BlastWave", hydro2d),
        ("ShockCloud", hydro2d), ("Clump_Spherical", hydro2d),
        ("PhotEvap_RandomClumps", hydro2d),
        ("PhotoEvap_radial", hydro2d), ("PhotoEvap_powerlaw", hydro2d),
        ("Uniform", hydro2d),
        ("OrszagTang", mhd2d), ("FieldLoop", mhd2d),
        ("FieldLoopVz", mhd2d), ("FieldLoopStatic", mhd2d),
        ("StarBench_ContactDiscontinuity3", hydro2d),
    ]
    for name, over in cases:
        params = dict(over)
        params["ics"] = name
        if name == "PhotoEvap_radial":
            params["PEC_ambRO"] = "1.0"
            params["PEC_ambPG"] = "1.0"
        cfg = config_from_params(params)
        P = build_ics(cfg, params)
        assert P.shape == (cfg.nvar,) + cfg.shape, name
        assert np.all(np.isfinite(P)), name
        assert P[0].min() > 0.0, name


def test_jet_param_run(tmp_path):
    """N_JET section: a jet inflow boundary drives material into the box."""
    import jax.numpy as jnp

    params = {
        "ndim": "2", "coordinates": "cartesian", "eqn": "euler",
        "solver": "8", "GAMMA": "1.666666667", "CFL": "0.3",
        "ics": "Jet", "JETambRO": "1.0", "JETambPG": "1.0",
        "NGridX": "32", "NGridY": "16",
        "Xmin": "0.0", "Ymin": "0.0", "Xmax": "2.0", "Ymax": "1.0",
        "BC_XN": "jet", "BC_XP": "outflow",
        "BC_YN": "reflecting", "BC_YP": "outflow",
        "N_JET": "1", "JETradius": "3",
        "JETdensity": "0.1", "JETpressure": "1.0", "JETvelocity": "10.0",
        "ntracer": "0", "FinishTime": "1.0",
    }
    from pion_tpu.cli import build_ics, jet_from_params
    from pion_tpu import Simulation

    cfg = config_from_params(params)
    P0 = build_ics(cfg, params)
    jet = jet_from_params(cfg, params)
    assert jet is not None and jet[0] == 3 * cfg.dx
    sim = Simulation(cfg, jnp.asarray(P0), jet=jet)
    sim.run(max_steps=40)
    P = np.asarray(sim.P)
    assert np.all(np.isfinite(P))
    # jet material (fast) has entered near the y=0 symmetry axis
    assert P[2, :4, :4].max() > 1.0, "jet did not inflow"


NG_PARAMS = """\
# 3-level NG cylindrical shocktube (param_ST_Toro1.txt scaled down)
ndim 2
coordinates cylindrical
eqn  euler
solver 3
CFL 0.5
ArtificialViscosity 1
EtaViscosity 0.15
OrderOfAccSpace 2
ntracer 0
chem_code NONE
ics ShockTube
GAMMA 1.4
STnumber 1
STshockpos 0.5
STangleXY 0
OutputFile ToroNG1
OutputPath {path}/
OutputCriterion 0
OutputFrequency 0
StartTime 0.0
FinishTime 0.2
noise -1.0
NGridX  32
NGridY  32
NGridZ  1
Xmin -0.3
Ymin 0.0
Zmin 0.0
Xmax 0.9
Ymax 1.2
Zmax 0.9
grid_nlevels          3
NG_centre_XX          0.3
NG_centre_YY          0.0e18
NG_centre_ZZ          0.0e18
NG_refine_XX          1
NG_refine_YY          1
NG_refine_ZZ          1
BC_XN outflow
BC_XP outflow
BC_YN reflecting
BC_YP reflecting
BC_Ninternal  0
"""


def test_icgen_and_run_ng_toro1(tmp_path):
    """The round-2 breakage reproducer: the NG_shocktube/param_ST_Toro1
    layout (2D cylindrical, 3 levels) must icgen and run through the CLI
    (reference: main_NG.cpp + sim_control_NG.cpp:564-810)."""
    from pion_tpu.ng import NGHierarchy

    pf = tmp_path / "param_ST_Toro1.txt"
    pf.write_text(NG_PARAMS.format(path=tmp_path))
    snap = icgen_main([str(pf)])
    cfg, P, t, step = load_snapshot(snap)
    assert cfg.nlevels == 3 and P.shape == (3, cfg.nvar, 32, 32)
    # level extents follow the reference recursion about (0.3, R=0)
    hier_chk = NGHierarchy(cfg)
    np.testing.assert_allclose(hier_chk.cfgs[1].xmin, (0.0, 0.0))
    np.testing.assert_allclose(hier_chk.cfgs[1].xmax, (0.6, 0.6))
    sim = run_main([snap, "max_steps=4", "log_freq=0"])
    assert sim.step_count == 4 and sim.t > 0.0
    for l in range(3):
        assert np.all(np.isfinite(np.asarray(sim.P[l]))), f"level {l}"
    # a final multi-level snapshot was written and restarts cleanly
    out = [f for f in tmp_path.iterdir() if f.name.startswith("ToroNG1.0")]
    assert out
    h2 = NGHierarchy.restart(str(sorted(out)[-1]))
    assert h2.step_count == 4 and h2.n_levels == 3


def test_restart_preserves_physics(tmp_path):
    """Snapshot headers carry the parameter registry; a CLI restart
    rebuilds chemistry/RT/winds instead of silently dropping them
    (reference: sim_init.cpp:173-321, parameter_defs.h:56)."""
    from pion_tpu.sim import Simulation

    pf = "/root/reference/test_problems/RCW120/param_RCW120_WindHIIR.txt"
    params = read_paramfile(pf)
    # keep the file's 2:1 domain square-celled at reduced resolution
    params.update(OutputPath=str(tmp_path), OutputFile="rcw",
                  NGridX="64", NGridY="32", grid_nlevels="1",
                  OutputCriterion="0", OutputFrequency="0")
    pf2 = tmp_path / "p.txt"
    pf2.write_text("\n".join(f"{k} {v}" for k, v in params.items()))
    snap = icgen_main([str(pf2)])
    sim = run_main([snap, "max_steps=2", "log_freq=0"])
    assert sim.physics is not None and sim.physics.mp is not None
    assert sim.physics.sources and sim.physics.winds
    # the snapshot it wrote restarts WITH physics
    out = sorted(f for f in tmp_path.iterdir() if f.name.startswith("rcw.0"))
    sim2 = Simulation.restart(str(out[-1]))
    assert sim2.physics is not None and sim2.physics.mp is not None
    assert sim2.physics.sources and sim2.physics.winds
    assert type(sim2.physics.mp).__name__ == type(sim.physics.mp).__name__
    sim2.step()
    assert np.all(np.isfinite(np.asarray(sim2.P)))


def test_wind2d_cylindrical_ng_runs(tmp_path):
    """The Wind2D flagship config (cylindrical, 3 NG levels, stellar wind,
    `ics Uniform` with UNIFORM_amb* ambient) icgens and runs finite through
    the CLI — regression for the UNIFORM_amb prefix being ignored and for
    cgs cylindrical cell volumes overflowing float32 in the NG restriction
    (reference: ics/basic_tests.cpp:150-310, test_problems/Wind2D)."""
    from pion_tpu.constants import RO as iRO, VX as iVX

    pf = "/root/reference/test_problems/Wind2D/params_ResStudy_HD_l3n0128.txt"
    snap = icgen_main([pf, "NGridX=16", "NGridY=16",
                       f"OutputPath={tmp_path}", "OutputFile=w2d"])
    import numpy as np

    from pion_tpu.io.snapshot import load_snapshot_raw
    cfg, P, _t, _s, extra = load_snapshot_raw(snap)
    assert cfg.nlevels == 3 and P.shape[0] == 3
    # UNIFORM_amb* actually reached the generator
    np.testing.assert_allclose(P[0][iRO], 7.0e-24)
    np.testing.assert_allclose(P[0][iVX], -25.0e5)
    sim = run_main([snap, "max_steps=6", "log_freq=0"])
    for l in range(3):
        assert np.all(np.isfinite(np.asarray(sim.P[l]))), f"level {l}"
    assert sim.t > 0


def test_icgen_equilibrate_mp(tmp_path):
    """icgen chemistry equilibration (reference: icgen.cpp:216
    equilibrate_MP): with EP_chemistry on, ion fractions are integrated
    to equilibrium at fixed energy before the IC snapshot is written —
    cold dense neutral gas settles at the cosmic-ray ionization balance,
    not the hand-set seed value."""
    import numpy as np

    from pion_tpu.cli import icgen_main
    from pion_tpu.constants import PG as iPG, RO as iRO

    base = """ics Uniform
ndim 2
coordinates cartesian
eqn euler
solver 4
OrderOfAccSpace 2
OrderOfAccTime 2
GAMMA 1.666666666666667
CFL 0.3
ntracer 1
Tracer000 H1+
chem_code MPv3
EP_chemistry 1
EP_Min_Temperature 10.0
EP_Max_Temperature 1.0e9
UNIFORM_ambRO 2.34e-22
UNIFORM_ambPG 3.3e-12
UNIFORM_ambVX 0.0
UNIFORM_ambVY 0.0
UNIFORM_ambVZ 0.0
UNIFORM_ambTR0 1.0e-6
OutputPath {path}/
OutputFile eqtest
OutputFileType npz
OutputCriterion 0
OutputFrequency 0
StartTime 0.0
FinishTime 1.0e12
NGridX 8
NGridY 8
Xmin 0.0
Ymin 0.0
Xmax 3.0e18
Ymax 3.0e18
BC_XN outflow
BC_XP outflow
BC_YN outflow
BC_YP outflow
BC_Ninternal 0
RT_Nsources 0
"""
    pf = tmp_path / "eq.txt"
    pf.write_text(base.format(path=tmp_path))
    snap = icgen_main([str(pf)])
    from pion_tpu.io.snapshot import load_snapshot

    cfg, P, _, _ = load_snapshot(snap)
    x = P[cfg.eqn.nbase]
    # equilibrium, not the seed: cosmic-ray ionization vs recombination
    # at nH ~ 100 gives x ~ 1e-4..1e-2
    assert np.all(np.isfinite(P))
    assert float(x.min()) > 5.0e-6 and float(x.max()) < 0.5
    # energy held fixed during equilibration (update_erg=false)
    np.testing.assert_allclose(P[iPG], 3.3e-12, rtol=1e-6)

    # InitIons NO skips the pass (reference: icgen_base.cpp:161)
    pf2 = tmp_path / "eq_no.txt"
    pf2.write_text(base.format(path=tmp_path) + "InitIons NO\n")
    snap2 = icgen_main([str(pf2), "OutputFile=eqtest2"])
    _, P2, _, _ = load_snapshot(snap2)
    np.testing.assert_allclose(P2[cfg.eqn.nbase], 1.0e-6, rtol=1e-8)


def test_run_mesh_auto_matches_single_device(tmp_path):
    """CLI multi-device execution (cfg.mesh='auto'): the same run sharded
    over the 8-device mesh must reproduce the single-device fields —
    the silocompare serial-vs-parallel gate of the reference
    (test_problems/blastwave_crt3d/compare_ser_pll.sh)."""
    import jax

    assert len(jax.devices()) >= 8
    pf = _write_params(tmp_path)
    sim1 = run_main([pf, "max_steps=5", "mesh=off"])
    assert len(sim1.P.sharding.device_set) == 1
    sim8 = run_main([pf, "max_steps=5", "mesh=on"])
    assert len(sim8.P.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sim8.P), np.asarray(sim1.P),
                               rtol=1e-12, atol=1e-13)


def test_run_mesh_auto_ng(tmp_path):
    """NG hierarchy through the CLI with every level sharded."""
    import jax

    pf = _write_params(tmp_path)
    txt = open(pf).read().replace("ics BlastWave", "ics BlastWave\ngrid_nlevels 2")
    open(pf, "w").write(txt)
    sim1 = run_main([pf, "max_steps=2", "mesh=off"])
    sim8 = run_main([pf, "max_steps=2", "mesh=on"])
    assert len(sim8.P[0].sharding.device_set) == 8
    for l in range(2):
        np.testing.assert_allclose(np.asarray(sim8.P[l]),
                                   np.asarray(sim1.P[l]),
                                   rtol=1e-12, atol=1e-13)
