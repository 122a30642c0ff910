"""Unit tests for equation algebra: P<->U round trips, fluxes, wave speeds."""
import numpy as np
import jax.numpy as jnp
import pytest

from pion_tpu import Eqn, SimConfig
from pion_tpu.ops import eqns
from pion_tpu.constants import BX, BY, BZ, PG, RO, SI, VX, VY, VZ


def random_prim(cfg, shape=(16,), seed=0):
    rng = np.random.default_rng(seed)
    P = np.empty((cfg.nvar,) + shape)
    P[RO] = rng.uniform(0.1, 10.0, shape)
    P[PG] = rng.uniform(0.1, 10.0, shape)
    for v in (VX, VY, VZ):
        P[v] = rng.uniform(-2.0, 2.0, shape)
    if cfg.eqn.is_mhd:
        for b in (BX, BY, BZ):
            P[b] = rng.uniform(-1.5, 1.5, shape)
        if cfg.eqn is Eqn.GLM:
            P[SI] = rng.uniform(-0.5, 0.5, shape)
    for t in range(cfg.eqn.nbase, cfg.nvar):
        P[t] = rng.uniform(0.0, 1.0, shape)
    return jnp.asarray(P)


@pytest.mark.parametrize("eqn", [Eqn.EULER, Eqn.MHD, Eqn.GLM])
@pytest.mark.parametrize("ntracer", [0, 2])
def test_ptou_roundtrip(eqn, ntracer):
    cfg = SimConfig(eqn=eqn, ntracer=ntracer)
    P = random_prim(cfg)
    U = eqns.prim_to_cons(P, cfg)
    P2 = eqns.cons_to_prim(U, cfg)
    np.testing.assert_allclose(np.asarray(P2), np.asarray(P), rtol=1e-12)


def test_euler_flux_matches_formula():
    cfg = SimConfig(eqn=Eqn.EULER)
    P = random_prim(cfg)
    F = eqns.flux_from_prim(P, cfg)
    rho, pg = np.asarray(P[RO]), np.asarray(P[PG])
    vx, vy, vz = np.asarray(P[VX]), np.asarray(P[VY]), np.asarray(P[VZ])
    E = 0.5 * rho * (vx**2 + vy**2 + vz**2) + pg / (cfg.gamma - 1)
    np.testing.assert_allclose(np.asarray(F[RO]), rho * vx, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(F[VX]), rho * vx**2 + pg, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(F[PG]), vx * (E + pg), rtol=1e-12)


def test_mhd_flux_bx_zero():
    cfg = SimConfig(eqn=Eqn.MHD)
    P = random_prim(cfg)
    F = eqns.flux_from_prim(P, cfg)
    assert np.all(np.asarray(F[BX]) == 0.0)


def test_wavespeed_ordering():
    cfg = SimConfig(eqn=Eqn.MHD)
    P = random_prim(cfg)
    cs = np.asarray(eqns.cslow(P, cfg))
    ch = np.asarray(eqns.sound_speed(P, cfg))
    cf = np.asarray(eqns.cfast(P, cfg))
    ca = np.abs(np.asarray(P[BX])) / np.sqrt(np.asarray(P[RO]))
    assert np.all(cs <= ca + 1e-12)
    assert np.all(cf >= ca - 1e-12)
    assert np.all(cf >= ch - 1e-12)


def test_pressure_floor():
    cfg = SimConfig(eqn=Eqn.EULER)
    U = jnp.asarray(np.array([[1.0], [0.1], [1.0], [0.0], [0.0]]))  # E < KE
    P = eqns.cons_to_prim(U, cfg)
    assert float(P[PG][0]) > 0.0


def test_sweep_perm_roundtrip():
    cfg = SimConfig(eqn=Eqn.GLM, ntracer=1, ndim=3,
                    shape=(4, 4, 4), xmin=(0, 0, 0), xmax=(1, 1, 1),
                    bcs=tuple([("outflow", "outflow")] * 3))
    for axis in range(3):
        perm = eqns.sweep_perm(cfg, axis)
        inv = eqns.inverse_perm(perm)
        assert np.array_equal(perm[inv], np.arange(cfg.nvar))
        P = random_prim(cfg, shape=(3,))
        np.testing.assert_array_equal(np.asarray(P[perm][inv]), np.asarray(P))
