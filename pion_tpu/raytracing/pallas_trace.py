"""In-VMEM Pallas point-source sweep: 8 independent octant kernels.

The XLA plane sweep (tracer.PointSourcePlaneTracer) issues ~6 tiny
dynamic-slice ops per Chebyshev shell from the host-compiled program —
latency-bound at ~27 ms for 128^3 on v5e.  Here each octant of the C2Ray
sweep (reference: raytracer_SC.cpp:1141 splits the grid into octants
swept outward from the source; :1543-1562 ordering) runs as ONE Pallas
kernel with the whole subcube resident in VMEM and a ``fori_loop`` over
shells, so a shell step costs pure VPU work instead of kernel launches.

Octant independence: with the C2Ray upstream interpolation, every cell
depends only on cells whose integer offsets from the source are
component-wise smaller, so the 8 source-centered subcubes (each including
the source planes) are fully independent — the same decomposition the
reference uses for its serial octant walk.

Mosaic cannot dynamically slice the lane (last) dimension, so the x-face
of each shell is carried as a running (y, z) plane: its same-shell
dependencies on the z- and y-faces reduce to two one-hot matvec line
injections (the only cells of a z/y plane a later x-face ever reads are
on the octant's diagonal edges), and the x-face values are written to a
separate x-major output that XLA transposes back once per trace.

Values are bitwise the plane-sweep path's up to f32 reassociation: same
Mellema+06 eq. A5 weights, same face order (z, then y, then x satisfies
every same-shell dependency given the x>y>z major-axis preference).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for one octant's four resident subcube arrays (col, colx,
# dtau, dtauT) incl. lane padding to 128; larger octants (far off-center
# sources) fall back to the XLA plane sweep.
VMEM_BUDGET = 12 * 1024 * 1024


def _padded_bytes(shape) -> int:
    if len(shape) == 2:
        s0, s1 = shape
        return -(-s0 // 8) * 8 * -(-s1 // 128) * 128 * 4
    s0, s1, s2 = shape
    return s0 * -(-s1 // 8) * 8 * -(-s2 // 128) * 128 * 4


def octant_shapes(shape, src_idx):
    """Subcube sizes (incl. the source planes) for the 2^nd octants."""
    out = []
    nd = len(shape)
    for bits in range(1 << nd):
        sz = []
        for a in range(nd):
            if (bits >> a) & 1:
                sz.append(shape[a] - src_idx[a])
            else:
                sz.append(src_idx[a] + 1)
        out.append(tuple(sz))
    return out


def supports(shape, src_idx, ndim) -> bool:
    """3D only.  (A 2D depth-1 embedding reduces exactly to the 2D C2Ray
    weights — validated in tests — but the degenerate (1, n) face planes
    run far below the XLA plane sweep on real hardware, so 2D stays on
    the XLA path.)"""
    if ndim != 3:
        return False
    return all(4 * _padded_bytes(s) <= VMEM_BUDGET
               for s in octant_shapes(shape, src_idx))


def _octant_kernel_3d(sz: int, sy: int, sx: int, tmin: float, dtype,
                      interpret: bool):
    """Build the pallas_call for one (sz, sy, sx) octant, source at
    (0,0,0), sweep toward +.  Returns (col_zy, colx) where col_zy holds
    the z/y-face values in (z, y, x) layout and colx the x-face values in
    (x, y, z) layout."""
    M = max(sz, sy, sx) - 1

    def corr_of(m):
        mf = m.astype(dtype)
        c = jnp.sqrt((mf * mf + 0.25) / ((mf - 1.0) ** 2 + 0.25)) \
            * (mf - 1.0) / jnp.maximum(mf, 1.0)
        return jnp.where((mf < 10.0) & (mf >= 1.0), c, 1.0)

    def interp(c1, c2, c3, c4, d0, d1, on_axis, corr, dtau_pl):
        w1 = (1.0 - d0) * (1.0 - d1) / jnp.maximum(tmin, c1)
        w2 = d0 * (1.0 - d1) / jnp.maximum(tmin, c2)
        w3 = (1.0 - d0) * d1 / jnp.maximum(tmin, c3)
        w4 = d0 * d1 / jnp.maximum(tmin, c4)
        tau_in = (w1 * c1 + w2 * c2 + w3 * c3 + w4 * c4) / (
            w1 + w2 + w3 + w4)
        tau_in = jnp.where(on_axis, c1 * corr, tau_in)
        return tau_in + dtau_pl

    def shift1(p, axis):
        """One step toward the source along ``axis`` with edge replication
        (offset-0 rows keep their own value: sgn=0 at the source plane).
        Length-1 axes (depth-1 2D embedding) shift to themselves — and
        Mosaic rejects the 0-sized slice the concat form would need."""
        if p.shape[axis] == 1:
            return p
        if axis == 0:
            return jnp.concatenate([p[:1, :], p[:-1, :]], axis=0)
        return jnp.concatenate([p[:, :1], p[:, :-1]], axis=1)

    def kernel(dtau_ref, dtauT_ref, col_ref, colx_ref):
        col_ref[:] = jnp.zeros_like(col_ref)
        colx_ref[:] = jnp.zeros_like(colx_ref)
        iy_c = jax.lax.broadcasted_iota(jnp.int32, (sy, sz), 0)
        iz_l = jax.lax.broadcasted_iota(jnp.int32, (sy, sz), 1)
        # source cell: mask the x=0 dtau plane down to (y=0, z=0)
        xprev0 = jnp.where((iy_c == 0) & (iz_l == 0),
                           dtauT_ref[0:1, :, :][0], 0.0)
        colx_ref[0:1] = xprev0[None].astype(dtype)
        iz0 = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 0)
        ix0 = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 1)
        col_ref[0:1, :, :] = jnp.where(
            (iz0 == 0) & (ix0 == 0), dtau_ref[0:1, :, :][0], 0.0)[None]

        def onehot(n, idx):
            return (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
                    == idx).astype(dtype)

        def body(m, xprev):
            mf = m.astype(dtype)
            corr = corr_of(m)
            # Mosaic does not clamp out-of-bounds dynamic-slice starts
            # (octants with max(sz,sy,sx)-1 >= s_a would fault), so every
            # read index is clamped; the pl.when guards keep the writes
            # and the line injections correct.
            mz_r = jnp.minimum(m, sz - 1)
            my_r = jnp.minimum(m, sy - 1)
            mx_r = jnp.minimum(m, sx - 1)

            # ---- z-face: plane (y, x) at z = m --------------------------
            prevz = col_ref[pl.ds(jnp.minimum(m - 1, sz - 1), 1), :, :][0]          # (sy, sx)
            iy = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 0)
            ix = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 1)
            # inject maj==x diagonal-edge line (z=m-1, y<=m-1, x=m-1) from
            # the previous x-plane: column z=m-1 of xprev -> values over y
            lxz = jnp.dot(xprev, onehot(sz, m - 1),
                          preferred_element_type=dtype)           # (sy, 1)
            prevz = jnp.where((ix == m - 1) & (iy <= m - 1), lxz, prevz)
            dz = dtau_ref[pl.ds(mz_r, 1), :, :][0]
            d0 = iy.astype(dtype) / mf
            d1 = ix.astype(dtype) / mf
            oa = (jnp.maximum(iy, ix) == 0)
            c1 = prevz
            c2 = shift1(prevz, 0)     # first perp axis = y
            c3 = shift1(prevz, 1)     # second = x
            c4 = shift1(c2, 1)
            newz_all = interp(c1, c2, c3, c4, d0, d1, oa, corr, dz)
            mz = (iy < m) & (ix < m)
            curz = col_ref[pl.ds(mz_r, 1), :, :][0]
            newz = jnp.where(mz, newz_all, curz)

            @pl.when(m < sz)
            def _():
                col_ref[pl.ds(mz_r, 1), :, :] = newz[None]

            # ---- y-face: plane (z, x) at y = m --------------------------
            prevy = col_ref[:, pl.ds(jnp.minimum(m - 1, sy - 1), 1), :][:, 0, :]     # (sz, sx)
            iz = jax.lax.broadcasted_iota(jnp.int32, (sz, sx), 0)
            ixy = jax.lax.broadcasted_iota(jnp.int32, (sz, sx), 1)
            # inject maj==x line (z<=m-1, y=m-1, x=m-1): row y=m-1 of
            # xprev -> values over z, relaid out sublane-major
            row = jnp.where(iy_c == m - 1, xprev, 0.0).sum(
                axis=0, keepdims=True)                          # (1, sz)
            prevy = jnp.where((ixy == m - 1) & (iz <= m - 1),
                              row.reshape(sz, 1), prevy)
            dy = dtau_ref[:, pl.ds(my_r, 1), :][:, 0, :]
            d0y = iz.astype(dtype) / mf
            d1y = ixy.astype(dtype) / mf
            oay = (jnp.maximum(iz, ixy) == 0)
            c1y = prevy
            c2y = shift1(prevy, 0)    # first perp = z
            c3y = shift1(prevy, 1)    # second = x
            c4y = shift1(c2y, 1)
            newy_all = interp(c1y, c2y, c3y, c4y, d0y, d1y, oay, corr, dy)
            my = (iz <= m) & (ixy < m)
            cury = col_ref[:, pl.ds(my_r, 1), :][:, 0, :]
            newy = jnp.where(my, newy_all, cury)

            @pl.when(m < sy)
            def _():
                col_ref[:, pl.ds(my_r, 1), :] = newy[:, None, :]

            # ---- x-face: running plane (y, z) at x = m ------------------
            # same-shell injections into the x=m-1 plane: maj==z cells
            # (z=m, y<=m-1, x=m-1) from newz, maj==y cells (z<=m, y=m,
            # x=m-1) from newy (the only cells of those faces the x-face
            # ever reads)
            lz = jnp.dot(newz, onehot(sx, m - 1),
                         preferred_element_type=dtype)           # (sy, 1)
            xcur = jnp.where((iz_l == m) & (iy_c <= m - 1), lz, xprev)
            ly = jnp.dot(newy, onehot(sx, m - 1),
                         preferred_element_type=dtype)           # (sz, 1)
            lyT = ly.reshape(1, sz)
            xcur = jnp.where((iy_c == m) & (iz_l <= m), lyT, xcur)
            dx_pl = dtauT_ref[pl.ds(mx_r, 1), :, :][0]              # (sy, sz)
            d0x = iz_l.astype(dtype) / mf    # first perp = z
            d1x = iy_c.astype(dtype) / mf    # second = y
            oax = (jnp.maximum(iz_l, iy_c) == 0)
            c1x = xcur
            c2x = shift1(xcur, 1)     # shift along z (lane dim of (y, z))
            c3x = shift1(xcur, 0)     # shift along y
            c4x = shift1(c2x, 0)
            newx_all = interp(c1x, c2x, c3x, c4x, d0x, d1x, oax, corr,
                              dx_pl)
            mx = (iz_l <= m) & (iy_c <= m)
            newx = jnp.where(mx, newx_all, xcur)

            @pl.when(m < sx)
            def _():
                colx_ref[pl.ds(mx_r, 1), :, :] = newx[None]
            return newx

        if M >= 1:
            jax.lax.fori_loop(1, M + 1, body, xprev0.astype(dtype))

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((sz, sy, sx), dtype),
                   jax.ShapeDtypeStruct((sx, sy, sz), dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )


class OctantSweep3D:
    """Driver: split dtau into 8 flipped octants, run the kernel on each,
    reassemble col (total optical depth at cell exit); tau_entry =
    col - dtau as in the XLA tracers."""

    def __init__(self, shape: Tuple[int, ...], src_idx: Tuple[int, ...],
                 tau_min: float, dtype=jnp.float32, interpret: bool = False):
        self.shape = shape
        self.src = src_idx
        self.tau_min = float(tau_min)
        self.dtype = dtype
        self.interpret = interpret
        self._kernels = {}
        self._octs = []
        nd = len(shape)
        for bits in range(1 << nd):
            sl = []
            flips = []
            for a in range(nd):
                if (bits >> a) & 1:
                    sl.append((src_idx[a], shape[a]))
                    flips.append(False)
                else:
                    sl.append((0, src_idx[a] + 1))
                    flips.append(True)
            key = tuple(s[1] - s[0] for s in sl)
            if key not in self._kernels:
                self._kernels[key] = _octant_kernel_3d(
                    *key, tmin=self.tau_min, dtype=dtype,
                    interpret=interpret)
            self._octs.append((tuple(sl), tuple(flips), key))
        # static maj==x masks per octant size
        self._maskx = {}
        for _, _, key in self._octs:
            if key not in self._maskx:
                szo, syo, sxo = key
                iz, iy, ix = np.meshgrid(np.arange(szo), np.arange(syo),
                                         np.arange(sxo), indexing="ij")
                self._maskx[key] = (ix >= iy) & (ix >= iz)  # numpy: safe to
                # cache across jit traces (jnp constants would leak tracers)

    def __call__(self, dtau):
        col = jnp.zeros_like(dtau)
        for sl, flips, key in self._octs:
            sub = dtau[tuple(slice(a, b) for a, b in sl)]
            for a, f in enumerate(flips):
                if f:
                    sub = jnp.flip(sub, axis=a)
            sub = sub.astype(self.dtype)
            subT = jnp.transpose(sub, (2, 1, 0))  # (x, y, z)
            A, colx = self._kernels[key](sub, subT)
            colx_t = jnp.transpose(colx, (2, 1, 0))  # back to (z, y, x)
            oct_col = jnp.where(self._maskx[key], colx_t, A)
            for a, f in enumerate(flips):
                if f:
                    oct_col = jnp.flip(oct_col, axis=a)
            col = jax.lax.dynamic_update_slice(
                col, oct_col.astype(dtau.dtype),
                tuple(a for a, _ in sl))
        return col


# ---------------------------------------------------------------------------
# sharded octant trace: the causal-pipeline equivalent under shard_map
# (reference: raytracer_SC_pllel.cpp:156-221 recv-upstream -> trace ->
# send-downstream).  For the production case — source centered on the
# shard boundaries of a 2x2x2 mesh — every octant is local to one shard:
# the only communication is a 1-deep halo of the source planes (ppermute),
# and each shard runs the SAME octant kernel on its flip-normalized block.
# ---------------------------------------------------------------------------

def supports_sharded(shape, src_idx, mesh) -> bool:
    """Eligibility: 3D, every mesh axis split exactly in 2, and the source
    cell sitting at the lower side of the split (src = n/2 - 1), so each
    octant coincides with one shard plus a single ghost plane."""
    if len(shape) != 3 or tuple(mesh.devices.shape) != (2, 2, 2):
        return False
    for a in range(3):
        if shape[a] % 2 or src_idx[a] != shape[a] // 2 - 1:
            return False
    n2 = shape[0] // 2 + 1
    return 4 * _padded_bytes((n2, n2, n2)) <= VMEM_BUDGET


def sharded_octant_trace(dtau, mesh, tau_min: float,
                         interpret: bool = False):
    """Total optical depth at cell exit (col) for a sharded grid, zero
    all-gathers: per-shard octant kernels + one boundary-plane ppermute
    per axis.  ``dtau`` must be sharded (or shardable) as P('z','y','x')
    over ``mesh``; values equal the single-device octant sweep's."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    names = mesh.axis_names
    shape = dtau.shape
    n2 = shape[0] // 2 + 1
    kern = _octant_kernel_3d(n2, n2, n2, tmin=tau_min,
                             dtype=jnp.float32, interpret=interpret)
    iz, iy, ix = np.meshgrid(np.arange(n2), np.arange(n2), np.arange(n2),
                             indexing="ij")
    maskx = (ix >= iy) & (ix >= iz)

    def local(dtau_l):
        cube = dtau_l
        # lower ghost plane per axis: the source plane lives in the
        # lower-side shard; ppermute it to the upper neighbor (shard 0
        # receives zeros — its ghost slot is junk beyond its octant)
        for a, nm in enumerate(names):
            top = jax.lax.slice_in_dim(cube, cube.shape[a] - 1,
                                       cube.shape[a], axis=a)
            # the ghost must carry the neighbor's TOP plane only along
            # this axis but the already-attached ghosts of earlier axes
            # too — sequential exchange propagates edges/corners
            recv = jax.lax.ppermute(top, nm, perm=[(0, 1)])
            cube = jnp.concatenate([recv, cube], axis=a)
        # flip-normalize: lower-side shards (axis index 0) sweep from
        # their top corner; flipping the padded cube puts the source
        # plane at index 0 for every shard (single program, no cond)
        flips = [jax.lax.axis_index(nm) == 0 for nm in names]
        for a in range(3):
            cube = jnp.where(flips[a], jnp.flip(cube, axis=a), cube)
        cubeT = jnp.transpose(cube, (2, 1, 0))
        A, colx = kern(cube, cubeT)
        col = jnp.where(maskx, jnp.transpose(colx, (2, 1, 0)), A)
        for a in range(3):
            col = jnp.where(flips[a], jnp.flip(col, axis=a), col)
        return col[1:, 1:, 1:]

    fn = shard_map(local, mesh=mesh, in_specs=P(*names),
                   out_specs=P(*names), check_vma=False)
    return fn(dtau)
