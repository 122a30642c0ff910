"""Pallas fused-sweep correctness: interpret-mode vs the XLA path."""
import numpy as np
import jax.numpy as jnp
import pytest

from pion_tpu import Eqn, SimConfig, make_geometry
from pion_tpu.boundaries import BoundaryData, apply_bcs
from pion_tpu.ics.blast import blast_wave
from pion_tpu.ops.pallas_sweep import dynamics_dU_pallas, supports
from pion_tpu.ops.sweep import dynamics_dU


@pytest.mark.parametrize("case", ["glm3d", "euler2d", "mhd2d"])
def test_pallas_matches_xla(case):
    if case == "glm3d":
        cfg = SimConfig(ndim=3, eqn=Eqn.GLM, solver="hlld", ntracer=1,
                        shape=(8, 8, 128), xmin=(0, 0, 0),
                        xmax=(8 / 128, 8 / 128, 1),
                        bcs=(("outflow", "outflow"),) * 3,
                        av="falle", etav=0.1)
        P0 = blast_wave(cfg, B0=(0.1, 0.05, 0.02))
    elif case == "euler2d":
        cfg = SimConfig(ndim=2, eqn=Eqn.EULER, solver="hll", ntracer=0,
                        shape=(16, 128), xmin=(0, 0), xmax=(16 / 128, 1),
                        bcs=(("outflow", "outflow"),) * 2, av="none")
        P0 = blast_wave(cfg)
    else:
        cfg = SimConfig(ndim=2, eqn=Eqn.MHD, solver="linear", ntracer=0,
                        shape=(16, 128), xmin=(0, 0), xmax=(16 / 128, 1),
                        bcs=(("outflow", "outflow"),) * 2, av="falle")
        P0 = blast_wave(cfg, B0=(0.2, 0.1, 0.0))
    assert supports(cfg)
    geom = make_geometry(cfg)
    # non-trivial velocity field so tracer/AV paths are exercised
    rng = np.random.default_rng(0)
    P0[2:5] += 0.1 * rng.standard_normal((3,) + cfg.shape)
    Ppad = apply_bcs(jnp.asarray(P0), cfg, BoundaryData())
    dt = 1.0e-3
    for order in (1, 2):
        ref, _ = dynamics_dU(Ppad, cfg, geom, dt, order)
        out = dynamics_dU_pallas(Ppad, cfg, geom, dt, order, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-10, atol=1e-13)


@pytest.mark.parametrize("case", ["glm3d", "euler2d"])
def test_fused_advance_matches_composed(case):
    """advance() routes pure-dynamics pallas runs through the fused
    final-axis kernel (dU + cell_advance + GLM damp in one call); its
    result must match the composed XLA path."""
    import dataclasses

    from pion_tpu.stepper import advance

    if case == "glm3d":
        cfg = SimConfig(ndim=3, eqn=Eqn.GLM, solver="hlld", ntracer=1,
                        shape=(8, 8, 128), xmin=(0, 0, 0),
                        xmax=(8 / 128, 8 / 128, 1),
                        bcs=(("outflow", "outflow"),) * 3,
                        av="falle", etav=0.1, pallas="interpret")
        P0 = blast_wave(cfg, B0=(0.1, 0.05, 0.02))
    else:
        cfg = SimConfig(ndim=2, eqn=Eqn.EULER, solver="hll", ntracer=0,
                        shape=(16, 128), xmin=(0, 0), xmax=(16 / 128, 1),
                        bcs=(("outflow", "outflow"),) * 2, av="none",
                        pallas="interpret")
        P0 = blast_wave(cfg)
    geom = make_geometry(cfg)
    rng = np.random.default_rng(1)
    P0[2:5] += 0.1 * rng.standard_normal((3,) + cfg.shape)
    P0 = jnp.asarray(P0)
    cfg_xla = dataclasses.replace(cfg, pallas="off")
    dt = 1.0e-3
    for ooa in (1, 2):
        c_p = dataclasses.replace(cfg, ooa=ooa)
        c_x = dataclasses.replace(cfg_xla, ooa=ooa)
        out = advance(P0, dt, c_p, geom, BoundaryData())
        ref = advance(P0, dt, c_x, geom, BoundaryData())
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-9)


def test_unsupported_configs_fall_back():
    cfg = SimConfig(ndim=1, eqn=Eqn.EULER, shape=(32,), xmin=(0.0,),
                    xmax=(1.0,), bcs=(("outflow", "outflow"),))
    assert not supports(cfg)  # 1D
    cfg2 = SimConfig(ndim=2, eqn=Eqn.EULER, coords="cylindrical",
                     shape=(16, 16), xmin=(0.0, 0.0), xmax=(1.0, 1.0),
                     bcs=(("outflow", "outflow"),) * 2)
    assert supports(cfg2)  # 2D cylindrical: supported since round 5
    cfg3 = SimConfig(ndim=1, eqn=Eqn.EULER, coords="spherical",
                     shape=(32,), xmin=(0.0,), xmax=(1.0,),
                     bcs=(("reflecting", "outflow"),))
    assert not supports(cfg3)  # 1D spherical stays on the XLA sweep


def test_cylindrical_pallas_matches_xla():
    """2D cylindrical (axisymmetric) fused sweep vs the XLA sweep:
    com-spaced slopes, metric divergence and the radial geometric
    sources must agree to rounding (reference:
    cyl_FV_solver_*::geometric_source, solver_eqn_mhd_adi.cpp:1001-1215)."""
    import numpy as np
    import jax.numpy as jnp

    from pion_tpu import Coord, SimConfig
    from pion_tpu.boundaries import BoundaryData, apply_bcs
    from pion_tpu.grid import make_geometry
    from pion_tpu.ops import pallas_sweep
    from pion_tpu.ops.sweep import dynamics_dU

    rng = np.random.default_rng(5)
    for eqn, solver in (("euler", "hll"), ("glm", "hlld")):
        cfg = SimConfig(ndim=2, eqn=eqn, solver=solver,
                        coords=Coord.CYLINDRICAL, ntracer=1,
                        shape=(32, 64), xmin=(0.0, 0.0), xmax=(0.5, 1.0),
                        bcs=(("axisymmetric", "outflow"),
                             ("outflow", "outflow")),
                        cfl=0.3, ooa=2, av="falle", etav=0.1,
                        dtype="float64")
        geom = make_geometry(cfg)
        P = np.ones((cfg.nvar,) + cfg.shape)
        P[0] = 1.0 + 0.3 * rng.random(cfg.shape)
        P[1] = 1.0 + 0.3 * rng.random(cfg.shape)
        P[2:5] = 0.2 * rng.standard_normal((3,) + cfg.shape)
        if cfg.eqn.is_mhd:
            P[5:8] = 0.1 * rng.standard_normal((3,) + cfg.shape)
            if eqn == "glm":
                P[8] = 0.01 * rng.standard_normal(cfg.shape)
        P[cfg.eqn.nbase] = rng.random(cfg.shape)
        Pj = jnp.asarray(P)
        Ppad = apply_bcs(Pj, cfg, BoundaryData())
        dt = jnp.float64(1e-3)
        ch = jnp.float64(100.0)
        dU_x, _ = dynamics_dU(Ppad, cfg, geom, dt, 2, ch=ch)
        dU_p = pallas_sweep.dynamics_dU_pallas(Ppad, cfg, geom, dt, 2,
                                               ch=ch, interpret=True)
        scale = float(jnp.max(jnp.abs(dU_x)))
        assert float(jnp.max(jnp.abs(dU_p - dU_x))) < 1e-12 * scale
        # the fused advance path (final kernel with the geometry pack)
        Pn = pallas_sweep.advance_dynamics_pallas(Pj, Ppad, cfg, geom, dt,
                                                  2, ch=ch, interpret=True)
        assert bool(jnp.all(jnp.isfinite(Pn)))
