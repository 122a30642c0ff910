"""Interpret-mode equivalence of the fused Pallas MPv3 kernel vs the XLA
path (pallas_mpv3.py <-> mpv3.py), mirroring the reference's
solver-variant cross-checks (SURVEY.md §4: silocompare between code
paths).  Runs the kernel in interpret mode on the CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pion_tpu.constants import RSUN
from pion_tpu.microphysics import MPv3, MPv3Config
from pion_tpu.microphysics.pallas_mpv3 import update_pallas, ydot_pallas

SHAPE = (8, 16, 16)


def _setup(ion):
    rng = np.random.default_rng(7)
    mpc = MPv3Config(tracer_slot=5, ion_src=ion, n_idot=1e48,
                     tstar=3.75e4 if ion == "mfion" else 0.0,
                     rstar_cm=10 * RSUN if ion == "mfion" else 0.0,
                     min_temperature=50.0)
    mp = MPv3(mpc)
    nH = jnp.asarray((10 ** rng.uniform(0, 4, SHAPE)).astype(np.float32))
    T = (10 ** rng.uniform(1.8, 6, SHAPE)).astype(np.float32)
    x = rng.uniform(1e-6, 1 - 1e-6, SHAPE).astype(np.float32)
    omx = jnp.asarray((1.0 - x).astype(np.float32))
    Eint = jnp.asarray(((mpc.n_ion + mpc.n_elec * x) * np.asarray(nH)
                        * 1.380649e-16 * T / (mpc.gamma - 1.0))
                       .astype(np.float32))
    z = jnp.zeros(SHAPE, jnp.float32)
    rt = {"tau0": jnp.asarray(
              (10 ** rng.uniform(-3, 2, SHAPE)).astype(np.float32)),
          "ds": z + 3e16, "nv": z + 1e-3, "sv": z + 1e-3,
          "g0_uv": z, "g0_ir": z, "n_idot": 1e48, "vshell": z + 1e30}
    return mp, omx, Eint, nH, rt


@pytest.mark.parametrize("ion", [None, "mono", "mfion"])
def test_ydot_matches_xla(ion):
    mp, omx, Eint, nH, rt = _setup(ion)
    d0, e0 = mp.ydot(omx, Eint, nH, rt)
    d1, e1 = ydot_pallas(mp, omx, Eint, nH, rt, interpret=True)
    # scale-normalized: summed rates pass through zero, so pointwise
    # relative error is meaningless at cancellation points; the remaining
    # spread is f32 cancellation in the (r0 - r1)/(1 - exp(-dtau))
    # small-dtau switchover, present in both paths
    for a, b, tol in ((d0, d1, 5e-3), (e0, e1, 3e-2)):
        sc = jnp.maximum(jnp.abs(a), jnp.max(jnp.abs(a)) * 1e-6)
        assert float(jnp.max(jnp.abs(b - a) / sc)) < tol


@pytest.mark.parametrize("ion", ["mono", "mfion"])
def test_update_ladder_matches_xla(ion):
    """The fused Euler+Newton-ladder kernel must land on the same state as
    the XLA ladder (both converge the same backward-Euler residual)."""
    mp, omx, Eint, nH, rt = _setup(ion)
    # f64: the XLA reference ladder runs f64 under the x64 test env (its
    # tables are f64); the kernel in interpret mode handles both dtypes
    omx, Eint, nH = (a.astype(jnp.float64) for a in (omx, Eint, nH))
    rt = {k: (v.astype(jnp.float64) if hasattr(v, "astype") else v)
          for k, v in rt.items()}
    dt = jnp.float64(1.0e9)
    o1, e1 = update_pallas(mp, omx, Eint, nH, dt, rt, interpret=True)
    assert bool(jnp.all(jnp.isfinite(o1)))
    assert bool(jnp.all(jnp.isfinite(e1)))
    assert float(o1.min()) >= 0.0 and float(o1.max()) <= 1.0
    # XLA reference ladder on the same inputs
    d_omx, d_E = mp.ydot(omx, Eint, nH, rt)
    maxdelta = jnp.maximum(jnp.abs(d_omx * dt / omx),
                           jnp.abs(d_E * dt / Eint))
    from pion_tpu.microphysics.mpv3 import EULER_CUTOFF

    use_euler = maxdelta < EULER_CUTOFF
    stiffness = jnp.max(jnp.where(use_euler, 0.0, maxdelta))
    o_st, e_st = mp._stiff_solve(omx, Eint, nH, rt, dt, stiffness=stiffness)
    o_ref = jnp.where(use_euler, omx + dt * d_omx, o_st)
    e_ref = jnp.where(use_euler, Eint + dt * d_E, e_st)
    # the ladders differ in substep-count granularity (per-tile vs global)
    # so compare loosely: same qualitative state per cell
    sc = jnp.maximum(jnp.abs(e_ref), jnp.max(jnp.abs(e_ref)) * 1e-6)
    med = float(jnp.median(jnp.abs(e1 - e_ref) / sc))
    assert med < 0.05


def test_subclass_with_custom_ydot_never_takes_kernel():
    """MPv5 overrides ydot (Henney+09 molecular terms, MPv5.cpp:246); a
    kernel built from MPv3's formulas would silently run the wrong
    physics, so the gate must reject any subclass with its own ydot."""
    from pion_tpu.microphysics.variants import MPv5, MPv6

    mp5 = MPv5(MPv3Config(tracer_slot=5, min_temperature=50.0))
    assert not mp5._use_pallas({"tau0": None}, jnp.float32)
    # MPv6 keeps MPv3's ydot (config-only restriction): eligible wherever
    # MPv3 is (backend-dependent, so just check the method identity)
    mp6 = MPv6(MPv3Config(tracer_slot=5, min_temperature=50.0))
    assert type(mp6).ydot is MPv3.ydot


def test_multi_source_ydot_matches_xla():
    """K=2 ionizing sources through the kernel's stacked per-source
    planes (reference: per-source Tau slots, rad_src_data.h:27-76)."""
    for ion in ("mono", "mfion"):
        mp, omx, Eint, nH, rt = _setup(ion)
        z = jnp.zeros(SHAPE, jnp.float32)
        e1 = {"tau0": rt["tau0"], "ds": rt["ds"], "nv": rt["nv"],
              "sv": rt["sv"]}
        e2 = {"tau0": rt["tau0"] * 2.0, "ds": rt["ds"], "nv": z + 5e-4,
              "sv": z + 5e-4}
        rt2 = dict(rt)
        rt2["ion"] = (e1, e2)
        d0, e0 = mp.ydot(omx, Eint, nH, rt2)
        d1, e1v = ydot_pallas(mp, omx, Eint, nH, rt2, interpret=True)
        for a, b, tol in ((d0, d1, 5e-3), (e0, e1v, 3e-2)):
            sc = jnp.maximum(jnp.abs(a), jnp.max(jnp.abs(a)) * 1e-6)
            assert float(jnp.max(jnp.abs(b - a) / sc)) < tol
