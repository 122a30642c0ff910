"""Multiple ionizing sources with per-source column sets
(reference: rad_src_data.h:27-76 per-source Tau slots; calc_microphysics_dU
sums over FVI_ionising_srcs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pion_tpu import Eqn, SimConfig, Simulation
from pion_tpu.constants import K_B, PG, RO, RSUN
from pion_tpu.microphysics import MPv3, MPv3Config
from pion_tpu.physics import Physics
from pion_tpu.raytracing import Source


def _sim(sources, n=32, nH=10.0, dt_limit=False, ion_src="mono"):
    L = 3.0e18
    cfg = SimConfig(ndim=2, eqn=Eqn.EULER, ntracer=1, solver="hll",
                    shape=(n, n), xmin=(0.0, 0.0), xmax=(L, L),
                    bcs=(("outflow", "outflow"),) * 2, cfl=0.3, ooa=2,
                    av="falle", etav=0.1, min_temperature=50.0,
                    tmax=1.0e15)
    mpc = MPv3Config(tracer_slot=cfg.eqn.nbase, ion_src=ion_src,
                     n_idot=sum(s.strength for s in sources),
                     tstar=3.0e4 if ion_src == "mfion" else 0.0,
                     rstar_cm=10 * RSUN if ion_src == "mfion" else 0.0,
                     min_temperature=50.0)
    phys = Physics(mp=MPv3(mpc), sources=list(sources), dt_limit=dt_limit)
    P0 = np.zeros((cfg.nvar,) + cfg.shape)
    P0[RO] = nH * mpc.mean_mass_per_h
    P0[PG] = 1.1 * nH * K_B * 100.0
    P0[cfg.eqn.nbase] = 1.0e-6
    return Simulation(cfg, jnp.asarray(P0), physics=phys), cfg


def test_two_colocated_halves_equal_one_source():
    """Two sources at the same position with strength S/2 each must give
    exactly the same evolution as one source of strength S (identical
    columns, rates sum linearly)."""
    pos = (1.5e18, 1.5e18)
    S = 2.0e46
    one, cfg = _sim([Source(position=pos, strength=S, effect="mono")])
    two, _ = _sim([Source(position=pos, strength=S / 2, effect="mono"),
                   Source(position=pos, strength=S / 2, effect="mono")])
    dt = 3.0e8
    Pa, Pb = one.P, two.P
    for k in range(8):
        Pa = one.fns.advance(Pa, dt, k * dt)
        Pb = two.fns.advance(Pb, dt, k * dt)
    a, b = np.asarray(Pa), np.asarray(Pb)
    assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
    assert a[cfg.eqn.nbase].max() > 0.5, "source should ionize"
    for v in range(cfg.nvar):
        # identical up to summation-order roundoff ((S/2 + S/2) vs S)
        np.testing.assert_allclose(
            b[v], a[v], rtol=1e-10,
            atol=1e-10 * max(np.abs(a[v]).max(), 1e-300),
            err_msg=f"variable {v}")


def test_two_separated_sources_both_ionize():
    """Two separated stars each carve their own ionized region."""
    s1 = Source(position=(0.8e18, 0.8e18), strength=1.0e46, effect="mono")
    s2 = Source(position=(2.2e18, 2.2e18), strength=1.0e46, effect="mono")
    sim, cfg = _sim([s1, s2])
    dt = 3.0e8
    P = sim.P
    for k in range(10):
        P = sim.fns.advance(P, dt, k * dt)
    x = np.asarray(P)[cfg.eqn.nbase]
    assert np.all(np.isfinite(np.asarray(P)))
    n = cfg.shape[0]
    q1 = x[: n // 2, : n // 2].max()      # around source 1
    q2 = x[n // 2:, n // 2:].max()        # around source 2
    mid = x[n // 2, n // 2]
    assert q1 > 0.5 and q2 > 0.5, (q1, q2)
    # midpoint between the stars sees attenuated flux from both
    assert mid < max(q1, q2)


def test_two_mfion_sources_with_distinct_stars():
    """Two mfion sources with different (Tstar, Rstar): each gets its own
    re-integrated rate table (reference: set_multifreq_source_properties
    per source, MPv3.cpp:431)."""
    s1 = Source(position=(0.8e18, 1.5e18), strength=1.0e46, effect="mfion",
                tstar=3.0e4, rstar_cm=10 * RSUN)
    s2 = Source(position=(2.2e18, 1.5e18), strength=1.0e46, effect="mfion",
                tstar=4.5e4, rstar_cm=8 * RSUN)
    sim, cfg = _sim([s1, s2], ion_src="mfion")
    # source 1 matches the module table (no per-source entry); source 2
    # differs and must get one
    assert 0 not in sim.physics._src_static
    assert 1 in sim.physics._src_static
    dt = 3.0e8
    P = sim.P
    for k in range(6):
        P = sim.fns.advance(P, dt, k * dt)
    x = np.asarray(P)[cfg.eqn.nbase]
    assert np.all(np.isfinite(np.asarray(P)))
    assert x.max() > 0.5


def test_mixed_effects_rejected():
    s1 = Source(position=(0.8e18, 0.8e18), strength=1e46, effect="mono")
    s2 = Source(position=(2.2e18, 2.2e18), strength=1e46, effect="mfion")
    with pytest.raises(NotImplementedError):
        _sim([s1, s2])
