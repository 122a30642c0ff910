"""Tests for runtime utilities, the native I/O library, and param files."""
import numpy as np
import pytest

from pion_tpu import SimConfig, make_geometry
from pion_tpu import native
from pion_tpu.constants import BC, Coord, Eqn, Solver
from pion_tpu.io.params import apply_overrides, config_from_params, read_paramfile
from pion_tpu.utils import Timers, conservation_totals


def test_timers():
    import time

    t = Timers()
    t.start("a")
    time.sleep(0.01)
    assert t.read("a") >= 0.01
    total = t.pause("a")
    assert total >= 0.01
    t.start("a")
    time.sleep(0.005)
    assert t.stop("a") >= 0.015
    assert "a" in t.report()


def test_conservation_totals():
    cfg = SimConfig(ndim=2, eqn=Eqn.EULER, shape=(8, 8), xmin=(0.0, 0.0),
                    xmax=(1.0, 1.0), bcs=(("outflow", "outflow"),) * 2)
    geom = make_geometry(cfg)
    P = np.zeros((cfg.nvar, 8, 8))
    P[0] = 2.0
    P[1] = 1.0
    tot = conservation_totals(P, cfg, geom)
    np.testing.assert_allclose(tot["mass"], 2.0, rtol=1e-12)


def test_native_roundtrip():
    lib = native.get_lib()
    assert lib is not None, "native library failed to build"
    rng = np.random.default_rng(1)
    x = (rng.random((5, 64, 64)) * np.linspace(1, 2, 64)).astype(np.float64)
    blob = native.compress(x)
    raw = native.decompress(blob, x.nbytes)
    np.testing.assert_array_equal(raw.view(np.float64).reshape(x.shape), x)


def test_native_diff_norms():
    a = np.ones((3, 1000))
    b = a.copy()
    b[1] += 0.5
    out = native.diff_norms(a, b)
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[1], [0.5, 0.5, 0.5])


def test_snap_native_format(tmp_path):
    from pion_tpu.io import load_snapshot, save_snapshot

    cfg = SimConfig(ndim=1, eqn=Eqn.EULER, shape=(32,), xmin=(0.0,),
                    xmax=(1.0,), bcs=(("outflow", "outflow"),))
    P = np.random.default_rng(2).random((cfg.nvar, 32))
    p = save_snapshot(str(tmp_path / "s"), P, cfg, 1.5, 7)
    assert p.endswith(".snap") or p.endswith(".npz")
    cfg2, P2, t, step = load_snapshot(str(tmp_path / "s"))
    assert cfg2 == cfg and (t, step) == (1.5, 7)
    np.testing.assert_array_equal(P2, P)


def test_paramfile(tmp_path):
    f = tmp_path / "params.txt"
    f.write_text("""
# advection test
ndim 2
eqn 1
coordinates 1
solver 8
NgridX 64
NgridY 32
XminX 0.0
XmaxX 2.0
XminY 0.0
XmaxY 1.0
BCXn periodic
BCXp periodic
BCYn outflow
BCYp outflow
gamma 1.6666666666667
CFLno 0.24
ArtificialViscosity 1
EtaViscosity 0.15
FinishTime 0.5
ntracer 1
""")
    params = read_paramfile(str(f))
    params = apply_overrides(params, ["CFLno=0.3"])
    cfg = config_from_params(params)
    assert cfg.ndim == 2
    assert cfg.shape == (32, 64)       # (y, x) array order
    assert cfg.xmax == (1.0, 2.0)
    assert cfg.bcs[1] == (BC.PERIODIC, BC.PERIODIC)
    assert cfg.bcs[0] == (BC.OUTFLOW, BC.OUTFLOW)
    assert cfg.solver is Solver.HLL
    assert cfg.cfl == 0.3
    assert cfg.ntracer == 1
    assert cfg.tmax == 0.5


def test_cell_inspector(tmp_path):
    """Reference CLI-debugger parity: fpt/lpt/next_point/end_of_col walk and
    print_cell (tools/command_line_interface.cpp:54-65 demo sequence)."""
    import numpy as np
    from pion_tpu import SimConfig
    from pion_tpu.debug import CellInspector, inspect_snapshot
    from pion_tpu.io import save_snapshot

    cfg = SimConfig(ndim=2, eqn="euler", shape=(4, 8), xmin=(0.0, 0.0),
                    xmax=(1.0, 2.0), bcs=(("outflow", "outflow"),) * 2)
    P = np.arange(cfg.nvar * 4 * 8, dtype=float).reshape(cfg.nvar, 4, 8)
    dbg = CellInspector(P, cfg)
    assert dbg.fpt() == (0, 0)
    assert dbg.end_of_col("YP") == (3, 0)     # y = array axis 0 in 2D
    assert dbg.next_point("YP") == (3, 0)     # clamped at edge
    assert dbg.next_point("XP") == (3, 1)
    assert dbg.next_point("YN") == (2, 1)
    assert dbg.lpt() == (3, 7)
    cell = dbg.print_cell(out=lambda *_: None)
    assert cell["rho"] == P[0, 3, 7]
    # physical position: x fastest axis
    x, y = dbg.position()
    assert abs(x - (7 + 0.5) * cfg.dx) < 1e-12
    mm = dbg.minmax(out=lambda *_: None)
    assert mm["rho"] == (P[0].min(), P[0].max(), 0)
    # snapshot entry point
    p = save_snapshot(str(tmp_path / "s"), P, cfg, 0.0, 0)
    dbg2 = inspect_snapshot(p)
    assert dbg2.goto(1, 2) == (1, 2)
    # repl drives the same methods
    cmds = iter(["fpt", "next_point XP", "print_cell", "minmax", "quit"])
    lines = []
    dbg2.repl(input_fn=lambda _: next(cmds), out=lines.append)
    assert any("rho" in l for l in lines)
