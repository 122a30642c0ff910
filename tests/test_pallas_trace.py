"""Interpret-mode equivalence of the Pallas octant raytrace sweep
(raytracing/pallas_trace.py) vs the L1-shell scan reference tracer —
the tracer-variant cross-check the reference gets from silocompare
(SURVEY.md §4).  Covers centered, off-center, corner and boundary
sources (the corner/off-center cases exercise the OOB index clamps)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pion_tpu import SimConfig
from pion_tpu.grid import make_geometry
from pion_tpu.raytracing.pallas_trace import OctantSweep3D, supports
from pion_tpu.raytracing.tracer import (PointSourcePlaneTracer,
                                        PointSourceTracer)

CASES = [
    ((16, 16, 16), (0.5, 0.5, 0.5)),
    ((16, 12, 20), (0.3, 0.6, 0.45)),
    ((8, 8, 8), (0.03, 0.03, 0.03)),    # corner source
    ((8, 8, 8), (0.97, 0.2, 0.6)),      # boundary, strongly off-center
]


@pytest.mark.parametrize("shape,pos_frac", CASES)
def test_octant_sweep_matches_shell_scan(shape, pos_frac):
    xmax = tuple(n / 16 for n in shape)
    cfg = SimConfig(ndim=3, eqn="euler", solver="hll", shape=shape,
                    xmin=(0.0, 0.0, 0.0), xmax=xmax,
                    bcs=tuple([("outflow", "outflow")] * 3),
                    dtype="float32")
    geom = make_geometry(cfg)
    pos = tuple(pos_frac[a] * xmax[a] for a in range(3))
    tr_ref = PointSourceTracer(cfg, geom, pos)
    tr_pl = PointSourcePlaneTracer(cfg, geom, pos)
    assert supports(shape, tr_pl.src_idx, 3)
    rng = np.random.default_rng(3)
    dtau = jnp.asarray(rng.uniform(0.01, 0.5, shape).astype(np.float32))
    tau_ref = tr_ref.trace(dtau)
    sweep = OctantSweep3D(shape, tr_pl.src_idx, tr_pl.tau_min,
                          interpret=True)
    tau_k = sweep(dtau) - dtau
    assert float(jnp.max(jnp.abs(tau_k - tau_ref))) < 5e-6 * float(
        jnp.max(tau_ref))


def test_supports_gates_on_vmem():
    # centered 128^3 fits; a corner source at 192^3 does not
    assert supports((128, 128, 128), (64, 64, 64), 3)
    assert not supports((192, 192, 192), (0, 0, 0), 3)
    assert not supports((64, 64), (32, 32), 2)  # 2D: XLA path (slow degenerate layout on hw)


def test_octant_sweep_2d_embedding():
    """2D point-source tracing through the 3D kernel as a depth-1 cube:
    the 3D C2Ray weights with z-offset 0 reduce exactly to the 2D
    formulas (w3 = w4 = 0)."""
    for shape, posf in (((16, 16), (0.5, 0.5)), ((12, 20), (0.3, 0.7)),
                        ((16, 16), (0.02, 0.9))):
        xmax = tuple(n / 16 for n in shape)
        cfg = SimConfig(ndim=2, eqn="euler", solver="hll", shape=shape,
                        xmin=(0.0, 0.0), xmax=xmax,
                        bcs=tuple([("outflow", "outflow")] * 2),
                        dtype="float32")
        geom = make_geometry(cfg)
        pos = tuple(posf[a] * xmax[a] for a in range(2))
        tr_ref = PointSourceTracer(cfg, geom, pos)
        tr_pl = PointSourcePlaneTracer(cfg, geom, pos)
        rng = np.random.default_rng(4)
        dtau = jnp.asarray(rng.uniform(0.01, 0.5, shape).astype(np.float32))
        tau_ref = tr_ref.trace(dtau)
        sweep = OctantSweep3D((1,) + shape, (0,) + tr_pl.src_idx,
                              tr_pl.tau_min, interpret=True)
        tau_k = sweep(dtau[None])[0] - dtau
        assert float(jnp.max(jnp.abs(tau_k - tau_ref))) < 5e-6 * float(
            jnp.max(tau_ref))


def test_sharded_octant_trace_matches():
    """shard_map causal-pipeline trace (per-shard octant kernels + one
    source-plane ppermute per axis; reference:
    raytracer_SC_pllel.cpp:156-221) matches the single-device shell scan
    on an 8-device 2x2x2 mesh — the zero-all-gather RT schedule."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pion_tpu.parallel.mesh import make_mesh
    from pion_tpu.raytracing.pallas_trace import (sharded_octant_trace,
                                                  supports_sharded)

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")
    shape = (16, 16, 16)
    cfg = SimConfig(ndim=3, eqn="euler", solver="hll", shape=shape,
                    xmin=(0.0,) * 3, xmax=(1.0,) * 3,
                    bcs=tuple([("outflow", "outflow")] * 3),
                    dtype="float32")
    geom = make_geometry(cfg)
    tr = PointSourceTracer(cfg, geom, (0.5, 0.5, 0.5))
    mesh = make_mesh(cfg)
    assert supports_sharded(shape, tr.src_idx, mesh)
    rng = np.random.default_rng(3)
    dtau = jnp.asarray(rng.uniform(0.01, 0.5, shape).astype(np.float32))
    tau_ref = tr.trace(dtau)
    dtau_sh = jax.device_put(dtau, NamedSharding(mesh, P("z", "y", "x")))
    col = sharded_octant_trace(dtau_sh, mesh, tr.tau_min, interpret=True)
    assert len(col.sharding.device_set) == 8
    assert float(jnp.max(jnp.abs((col - dtau_sh) - tau_ref))) < 5e-6 * \
        float(jnp.max(tau_ref))
    # off-center sources are not eligible (they take the GSPMD sweep)
    assert not supports_sharded(shape, (3, 7, 7), mesh)
