"""Checkpoint/restart + compare-tool tests.

Gate modeled on the reference restart-equivalence procedure
(reference: test_problems/OpenMP/README.md:43-58): a run interrupted and
restarted from a checkpoint must match the uninterrupted run.
"""
import numpy as np
import jax.numpy as jnp

from pion_tpu import SimConfig, Simulation
from pion_tpu.ics import toro_tests
from pion_tpu.io import compare_snapshots, compare_states, load_snapshot, save_snapshot


def make(tmax=0.1):
    cfg = SimConfig(
        ndim=1, eqn="euler", solver="hll", gamma=1.4, shape=(128,),
        xmin=(0.0,), xmax=(1.0,), bcs=(("outflow", "outflow"),),
        cfl=0.3, ooa=2, av="falle", etav=0.1, tmax=tmax,
    )
    return cfg, toro_tests(cfg, 1)


def test_snapshot_roundtrip(tmp_path):
    cfg, P0 = make()
    p = save_snapshot(str(tmp_path / "snap"), P0, cfg, 0.123, 42)
    cfg2, P2, t, step = load_snapshot(p)
    assert cfg2 == cfg
    assert (t, step) == (0.123, 42)
    np.testing.assert_array_equal(P2, P0)


def test_restart_equivalence(tmp_path):
    cfg, P0 = make()
    # uninterrupted run
    sim_a = Simulation(cfg, jnp.asarray(P0))
    sim_a.run()

    # interrupted at a step boundary (checkpoints are step-based, so the dt
    # sequence is unchanged), checkpointed, restarted
    sim_b = Simulation(cfg, jnp.asarray(P0))
    sim_b.run(max_steps=30)
    ck = save_snapshot(str(tmp_path / "ck"), np.asarray(sim_b.P), cfg,
                       sim_b.t, sim_b.step_count)
    sim_c = Simulation.restart(ck)
    # restore dt-growth limiter state for exact equivalence
    sim_c.last_dt = sim_b.last_dt
    sim_c.run()

    res = compare_states(np.asarray(sim_a.P), np.asarray(sim_c.P))
    assert res["all_max"] < 1e-12, res


def test_output_cadence(tmp_path):
    cfg, P0 = make(tmax=0.02)
    sim = Simulation(cfg, jnp.asarray(P0), outfile=str(tmp_path / "run"),
                     opfreq=5, checkpoint_freq=7)
    sim.run()
    files = sorted(p.name for p in tmp_path.iterdir())
    assert any(".999999" in f or ".999998" in f for f in files)
    assert sum(1 for f in files if ".99999" not in f) >= 2  # snapshots + final


def test_compare_snapshots_cli(tmp_path):
    cfg, P0 = make()
    p1 = save_snapshot(str(tmp_path / "a"), P0, cfg, 0.0, 0)
    P1 = P0.copy()
    P1[0] *= 1.001
    p2 = save_snapshot(str(tmp_path / "b"), P1, cfg, 0.0, 0)
    res = compare_snapshots(p1, p2)
    assert 0.0009 < res["rho"]["L1"] < 0.0011
    assert res["pg"]["max"] == 0.0


def test_fits_roundtrip(tmp_path):
    """FITS snapshot is a full restart file (SURVEY.md §2.9); also check a
    3D MHD config so extension count and axis ordering are exercised."""
    from pion_tpu.io.fits import read_fits, write_fits

    cfg = SimConfig(
        ndim=3, eqn="glm", solver="hlld", ntracer=2, shape=(4, 6, 8),
        xmin=(0.0, 0.0, 0.0), xmax=(0.5, 0.75, 1.0),
        bcs=tuple([("outflow", "outflow")] * 3), cfl=0.3, ooa=2,
    )
    rng = np.random.default_rng(0)
    P0 = rng.normal(size=(cfg.nvar, 4, 6, 8))
    p = write_fits(str(tmp_path / "snap"), P0, cfg, t=0.5)
    P2, cfg2, t = read_fits(p)
    assert cfg2 == cfg and t == 0.5
    np.testing.assert_array_equal(P2, P0)
    # header blocks are valid FITS: 2880-byte multiple, SIMPLE first card
    raw = open(p, "rb").read()
    assert len(raw) % 2880 == 0 and raw[:6] == b"SIMPLE"


def test_npz_to_fits_converter(tmp_path):
    from pion_tpu.io.fits import npz_to_fits, read_fits

    cfg, P0 = make()
    p = save_snapshot(str(tmp_path / "snap"), P0, cfg, 0.25, 3)
    f = npz_to_fits(p)
    P2, cfg2, t = read_fits(f)
    assert cfg2 == cfg and t == 0.25
    np.testing.assert_array_equal(P2, P0)


def test_async_writer_restartable(tmp_path):
    """Async (queued) snapshots must be complete restart files identical to
    synchronous ones, and a restart from a mid-run async snapshot must
    reproduce the uninterrupted run."""
    from pion_tpu.io.snapshot import AsyncSnapshotWriter

    cfg, P0 = make()
    sim = Simulation(cfg, jnp.asarray(P0), outfile=str(tmp_path / "run"),
                     opfreq=10)
    sim.run(max_steps=30)     # emits async snapshots at steps 10,20,30 + final
    sim.flush_io()
    snap = str(tmp_path / "run.00000020")
    cfg2, P2, t2, step2 = load_snapshot(snap)
    assert cfg2 == cfg and step2 == 20

    # direct writer round-trip vs synchronous save
    w = AsyncSnapshotWriter()
    w.submit(str(tmp_path / "async"), P0, cfg, 0.5, 7)
    w.close()
    p_sync = save_snapshot(str(tmp_path / "sync"), P0, cfg, 0.5, 7)
    ca, Pa, ta, sa = load_snapshot(str(tmp_path / "async"))
    cs, Ps, ts, ss = load_snapshot(p_sync)
    assert ca == cs and (ta, sa) == (ts, ss)
    np.testing.assert_array_equal(Pa, Ps)

    # restart from the async mid-run snapshot reproduces the full run
    sim_a = Simulation(cfg, jnp.asarray(P0))
    sim_a.run()
    sim_c = Simulation.restart(snap)
    sim_b = Simulation(cfg, jnp.asarray(P0))
    sim_b.run(max_steps=20)
    sim_c.last_dt = sim_b.last_dt
    sim_c.run()
    res = compare_states(np.asarray(sim_a.P), np.asarray(sim_c.P))
    assert res["all_max"] < 1e-12, res


def test_time_based_output_cadence(tmp_path):
    """OutputCriterion=1 / OPfreqTime: snapshots at fixed simulation-time
    intervals (reference: sim_init.cpp:695-760)."""
    cfg, P0 = make(tmax=0.05)
    sim = Simulation(cfg, jnp.asarray(P0), outfile=str(tmp_path / "run"),
                     opfreq_time=0.01)
    sim.run()
    snaps = sorted(f.name for f in tmp_path.iterdir()
                   if ".99999" not in f.name)
    # ~5 time-interval snapshots + the final save
    assert len(snaps) >= 4, snaps
    # each snapshot restarts to a time >= its interval boundary
    t_prev = -1.0
    for s in snaps[:-1]:
        _, _, t, _ = load_snapshot(str(tmp_path / s))
        assert t > t_prev
        t_prev = t
