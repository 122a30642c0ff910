"""Colliding-winds binary through the reference's own CWB config
(reference: test_problems/CollidingWinds2D/param_CWB2DCRT_d2l3n256.txt —
two wind sources on a 2D Cartesian nested grid)."""
import numpy as np

from pion_tpu.cli import icgen_main, run_main
from pion_tpu.constants import PG, RO

REF = ("/root/reference/test_problems/CollidingWinds2D/"
       "param_CWB2DCRT_d2l3n256.txt")


def test_colliding_winds_cli_gate(tmp_path):
    txt = open(REF).read()
    repl = {
        "NGridX  256": "NGridX  64",
        "NGridY  256": "NGridY  64",
        "grid_nlevels 3": "grid_nlevels 2",
        "OutputPath ./": f"OutputPath {tmp_path}/",
        "OutputFileType silo": "OutputFileType npz",
    }
    for a, b in repl.items():
        assert a in txt, f"reference param line changed: {a}"
        txt = txt.replace(a, b)
    pf = tmp_path / "params_cwb.txt"
    pf.write_text(txt)
    snap = icgen_main([str(pf)])
    sim = run_main([snap, "max_steps=6", "log_freq=0"])
    assert sim.step_count == 6 and sim.t > 0.0
    # two wind sources built from the WIND_* sections
    assert len(sim.physics.wind_sources) == 2
    for l in range(2):
        assert np.all(np.isfinite(np.asarray(sim.P[l]))), f"level {l}"
    # both wind cavities exist on the fine level (stars at x = +-4e15,
    # inside the level-1 window) and the midplane gas between them is
    # compressed by the colliding flows relative to the free winds
    Pf = np.asarray(sim.P[1])
    cfg_f = sim.cfgs[1]
    xs = np.asarray(cfg_f.cell_centers(1))   # array axis 1 = physical x
    ys = np.asarray(cfg_f.cell_centers(0))
    iy = np.argmin(np.abs(ys))
    i_s1 = np.argmin(np.abs(xs - 4.0e15))
    i_s2 = np.argmin(np.abs(xs + 4.0e15))
    i_mid = np.argmin(np.abs(xs))
    rho = Pf[RO]
    assert rho[iy, i_s1] < 1e-26 and rho[iy, i_s2] < 1e-26, \
        "wind cavities (inert cores) should be carved at both stars"
    # midplane pressure exceeds the free-wind pressure near either star's
    # wind edge (collision region)
    pg = Pf[PG]
    edge1 = np.argmin(np.abs(xs - (4.0e15 - 8.0e14)))
    assert pg[iy, i_mid] > pg[iy, edge1]
