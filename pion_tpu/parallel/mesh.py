"""Device-mesh spatial sharding (the MPI domain decomposition equivalent).

The reference decomposes each level into per-rank bricks with explicit
MPI halo exchange (reference: source/decomposition/MCMD_control.cpp:62-230,
source/boundaries/MCMD_boundaries.cpp).  Here the domain is one global dense
array sharded over a ``jax.sharding.Mesh``; stencil shifts on sharded arrays
compile to XLA collective-permutes over ICI, so "halo exchange" is emitted by
the compiler rather than hand-written (GSPMD).  The same jitted ``advance``
runs single-chip or multi-chip — only the shardings differ.

Mesh axes are named after the array axes they shard: ('z','y','x') for 3D.
Like the reference (MCMD_control.cpp nx search: most-divided along Z then Y
then X), we put more shards on the slower axes first, keeping the fast/lane
axis (x) whole when possible.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig

AXIS_NAMES = ("z", "y", "x")


def decompose(n_devices: int, ndim: int, shape: Sequence[int]) -> Tuple[int, ...]:
    """Split n_devices into per-axis factors, most-divided on the slowest
    axis (reference: MCMD_control.cpp:62-230 'nx' search)."""
    factors = [1] * ndim
    remaining = n_devices
    # greedy: repeatedly assign the smallest prime factor to the axis with
    # the largest cells-per-shard
    primes = []
    m = remaining
    p = 2
    while m > 1:
        while m % p == 0:
            primes.append(p)
            m //= p
        p += 1
    for prime in sorted(primes, reverse=True):
        ax = int(np.argmax([shape[i] / factors[i] for i in range(ndim)]))
        factors[ax] *= prime
    return tuple(factors)


def _split_dcn(factors, nproc):
    """Factor the per-axis shard counts into (hosts, per-host) so the
    slowest axes cross hosts: halo exchange is nearest-neighbour on the
    mesh, so intra-host neighbours ride ICI and only the outermost slabs
    cross DCN (the scaling-critical layout for >= 2 hosts)."""
    import math

    dcn = [1] * len(factors)
    ici = list(factors)
    rem = nproc
    for ax in range(len(factors)):
        g = math.gcd(ici[ax], rem)
        dcn[ax] = g
        ici[ax] //= g
        rem //= g
        if rem == 1:
            break
    return (dcn, ici) if rem == 1 else None


def make_mesh(cfg: SimConfig, n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """Build the spatial device mesh.

    When all local devices are used, device placement is delegated to
    ``mesh_utils`` so mesh-adjacent shards sit on ICI-adjacent chips
    (single host: ``create_device_mesh``; multi-host:
    ``create_hybrid_device_mesh`` with the slowest axes across DCN).
    Explicit ``devices``/``n_devices`` subsets fall back to a plain
    reshape (used by tests on virtual-device subsets)."""
    explicit = devices is not None or n_devices is not None
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[: n_devices]
    n = len(devices)
    factors = decompose(n, cfg.ndim, cfg.shape)
    names = AXIS_NAMES[-cfg.ndim:]
    dev_array = None
    if not explicit:
        from jax.experimental import mesh_utils

        try:
            if jax.process_count() > 1:
                split = _split_dcn(factors, jax.process_count())
                if split is not None:
                    dcn, ici = split
                    dev_array = mesh_utils.create_hybrid_device_mesh(
                        ici, dcn, devices=devices)
            if dev_array is None:
                dev_array = mesh_utils.create_device_mesh(
                    factors, devices=devices)
        except (ValueError, NotImplementedError):
            dev_array = None  # unusual topology: fall back to reshape
    if dev_array is None:
        dev_array = np.array(devices).reshape(factors)
    return Mesh(dev_array, names)


def state_sharding(mesh: Mesh, cfg: SimConfig) -> NamedSharding:
    """State arrays (nvar, *spatial): variable axis replicated, spatial axes
    sharded along the mesh."""
    spec = P(None, *mesh.axis_names)
    return NamedSharding(mesh, spec)


def shard_state(Pstate, mesh: Mesh, cfg: SimConfig):
    return jax.device_put(Pstate, state_sharding(mesh, cfg))


def mesh_requested(cfg) -> bool:
    """Shard-on-construction gate for cfg.mesh (see SimConfig.mesh)."""
    n = len(jax.devices())
    if n <= 1:
        return False
    if cfg.mesh == "on":
        return True
    return cfg.mesh == "auto" and jax.default_backend() in (
        "tpu", "axon", "gpu", "cuda", "rocm")


def maybe_distributed_init() -> bool:
    """Multi-host bootstrap (the COMM->init equivalent of the reference
    binaries, main_NG_MPI.cpp:40-60): call ``jax.distributed.initialize``
    when standard cluster environment variables are present.  Idempotent;
    returns True when running multi-process."""
    import os

    try:
        if jax.process_count() > 1:
            return True
    except RuntimeError:
        pass
    markers = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
               "SLURM_JOB_ID", "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")
    if not any(os.environ.get(m) for m in markers):
        return False
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError):
        # already initialized, or single-process env that happens to set a
        # marker (e.g. SLURM_JOB_ID on a login shell): stay single-process
        return jax.process_count() > 1
    return jax.process_count() > 1
