"""Nested-grid tests: prolongation/restriction consistency, conservation
with BC89 flux correction, and NG-vs-uniform shock agreement
(the reference's NG_shocktube / NG advection gates, SURVEY.md §4)."""
import numpy as np
import jax.numpy as jnp

from pion_tpu import Eqn, SimConfig, Simulation
from pion_tpu.constants import PG, RO, VX
from pion_tpu.grid import make_geometry
from pion_tpu.ics import toro_tests
from pion_tpu.ics.blast import blast_wave
from pion_tpu.ng import NGHierarchy, make_level_cfg
from pion_tpu.ops.eqns import prim_to_cons


def init_levels(hier, fill):
    """Fill every level from an analytic function of position."""
    states = []
    for l in range(hier.n_levels):
        cfg = hier.cfgs[l]
        coords = [cfg.cell_centers(ax) for ax in range(cfg.ndim)]
        grids = np.meshgrid(*coords, indexing="ij")
        states.append(jnp.asarray(fill(cfg, grids)))
    hier.set_states(states)


def test_prolong_restrict_roundtrip():
    """A linear profile must prolong exactly (2nd-order interpolation) and
    restrict back to itself."""
    cfg0 = SimConfig(ndim=1, eqn=Eqn.EULER, shape=(32,), xmin=(0.0,),
                     xmax=(1.0,), bcs=(("outflow", "outflow"),))
    hier = NGHierarchy(cfg0, 2)

    def fill(cfg, grids):
        x = grids[0]
        P = np.zeros((cfg.nvar,) + cfg.shape)
        P[RO] = 1.0 + 0.5 * x
        P[PG] = 2.0 - 0.3 * x
        return P

    init_levels(hier, fill)
    padded = hier._prolong_padded(hier.P[0], 1)
    cfg1 = hier.cfgs[1]
    x_pad = cfg1.cell_centers(0, padded=True)
    np.testing.assert_allclose(np.asarray(padded[RO]), 1.0 + 0.5 * x_pad,
                               rtol=1e-12)
    # restriction of the fine level leaves the coarse linear profile intact
    Pc2 = hier._restrict(hier.P[0], hier.P[1], 1)
    np.testing.assert_allclose(np.asarray(Pc2[RO]), np.asarray(hier.P[0][RO]),
                               rtol=1e-12)


def test_ng_blast_conservation_2d():
    """2D blast fully inside the fine level: total mass/energy on the
    composite grid is conserved (BC89 keeps levels consistent)."""
    n = 32
    cfg0 = SimConfig(ndim=2, eqn=Eqn.EULER, solver="hll", shape=(n, n),
                     xmin=(0.0, 0.0), xmax=(1.0, 1.0),
                     bcs=(("outflow", "outflow"),) * 2, cfl=0.3, ooa=2,
                     av="falle", etav=0.1)
    hier = NGHierarchy(cfg0, 2)

    def fill(cfg, grids):
        return blast_wave(cfg, rho0=1.0, p0=0.1, p_in=10.0, r_in=0.08,
                          center=(0.5, 0.5))

    init_levels(hier, fill)

    def composite_mass_energy(h):
        # coarse cells covered by the fine level are excluded; fine adds them
        Uc = np.asarray(prim_to_cons(h.P[0], h.cfgs[0]))
        Uf = np.asarray(prim_to_cons(h.P[1], h.cfgs[1]))
        vc = np.prod([h.geoms[0].dx] * 2)
        vf = np.prod([h.geoms[1].dx] * 2)
        q = n // 4
        mask = np.ones((n, n), dtype=bool)
        mask[q : 3 * q, q : 3 * q] = False
        m = Uc[RO][mask].sum() * vc + Uf[RO].sum() * vf
        e = Uc[PG][mask].sum() * vc + Uf[PG].sum() * vf
        return m, e

    m0, e0 = composite_mass_energy(hier)
    for _ in range(12):
        hier.step()
    m1, e1 = composite_mass_energy(hier)
    assert np.all(np.isfinite(np.asarray(hier.P[0])))
    assert np.all(np.isfinite(np.asarray(hier.P[1])))
    np.testing.assert_allclose(m1, m0, rtol=1e-10)
    np.testing.assert_allclose(e1, e0, rtol=1e-10)


def test_ng_shocktube_vs_uniform():
    """1D NG shocktube: the fine region must match a uniform fine-resolution
    run where the shock is inside the fine level."""
    n = 64
    base = dict(eqn=Eqn.EULER, solver="hll", gamma=1.4, cfl=0.3, ooa=2,
                av="falle", etav=0.1)
    cfg0 = SimConfig(ndim=1, shape=(n,), xmin=(0.0,), xmax=(1.0,),
                     bcs=(("outflow", "outflow"),), **base)
    hier = NGHierarchy(cfg0, 2)

    def fill(cfg, grids):
        x = grids[0]
        P = np.zeros((cfg.nvar,) + cfg.shape)
        # Sod-like IC centered at 0.5 (inside the fine level [0.25,0.75])
        P[RO] = np.where(x < 0.5, 1.0, 0.125)
        P[PG] = np.where(x < 0.5, 1.0, 0.1)
        return P

    init_levels(hier, fill)
    t_end = 0.08  # shock stays inside the fine region
    hier.run(t_end)

    cfg_u = SimConfig(ndim=1, shape=(2 * n,), xmin=(0.0,), xmax=(1.0,),
                      bcs=(("outflow", "outflow"),), **base)
    Pu = np.zeros((cfg_u.nvar, 2 * n))
    xu = cfg_u.cell_centers(0)
    Pu[RO] = np.where(xu < 0.5, 1.0, 0.125)
    Pu[PG] = np.where(xu < 0.5, 1.0, 0.1)
    sim = Simulation(cfg_u.with_(tmax=t_end), jnp.asarray(Pu))
    sim.run()

    # compare the fine level against the matching slice of the uniform run
    fine = np.asarray(hier.P[1][RO])
    uni = np.asarray(sim.P[RO])[n // 2 : 3 * n // 2]
    l1 = np.mean(np.abs(fine - uni)) / np.mean(uni)
    assert l1 < 0.02, f"NG-vs-uniform L1 {l1}"
