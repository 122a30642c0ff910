"""External boundary conditions as pure pad functions.

The reference implements each BC as an assign/update class pair operating on
ghost-cell linked lists (reference: source/boundaries/*_boundaries.cpp,
orchestrated by assign_update_bcs.cpp).  Here a boundary condition is simply
a rule for filling the ``ng`` ghost layers while padding the state array —
``apply_bcs`` maps ``(nvar, *shape) -> (nvar, *(shape+2*ng))`` and is traced
straight into the jitted step, so XLA fuses the pads with the stencil reads.

Sign conventions for mirror-type BCs follow the reference exactly:
  - reflecting: negate normal v and normal B (reflecting_boundaries.cpp:36-76)
  - jetreflect: negate normal v and TANGENTIAL B (jetreflect_boundaries.cpp:50-66)
  - axisymmetric (R=0): negate v_R, v_theta, B_R, B_theta
    (axisymmetric_boundaries.cpp:40-57)
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .config import SimConfig
from .constants import BC, BX, BY, BZ, VX, VY, VZ, Eqn


@dataclasses.dataclass(frozen=True)
class BoundaryData:
    """Static per-face data for value-carrying BCs.

    ``fixed[(axis, side)]`` holds a ghost-strip array of shape
    (nvar, ..., ng, ...) — the frozen inflow/fixed state for that face
    (reference: inflow_boundaries.cpp / fixed_boundaries.cpp store refval).
    ``jet`` optionally holds (axis, side, radius_cells, state_vector) for the
    jet inflow region (reference: jet_boundaries.cpp).
    """

    fixed: Dict[Tuple[int, int], np.ndarray] = dataclasses.field(default_factory=dict)
    jet: Optional[Tuple[int, int, int, np.ndarray]] = None

    def __hash__(self):
        return hash(
            (
                tuple(sorted((k, v.tobytes()) for k, v in self.fixed.items())),
                None
                if self.jet is None
                else (self.jet[0], self.jet[1], self.jet[2], self.jet[3].tobytes()),
            )
        )

    def __eq__(self, other):
        return isinstance(other, BoundaryData) and hash(self) == hash(other)


def _mirror_signs(cfg: SimConfig, axis: int, kind: BC) -> np.ndarray:
    """Per-variable sign multipliers for mirror-type ghost cells."""
    sg = np.ones(cfg.nvar)
    k = cfg.ndim - 1 - axis  # physical axis index (x=0 is last array axis)
    if kind in (BC.REFLECTING, BC.JETREFLECT):
        sg[VX + k] = -1.0
        if cfg.eqn.is_mhd:
            if kind is BC.REFLECTING:
                sg[BX + k] = -1.0
            else:  # jetreflect: tangential B reversed
                for j in range(3):
                    if j != k:
                        sg[BX + j] = -1.0
    elif kind is BC.AXISYMMETRIC:
        # 2D (R,z): radial = VY, theta = VZ in PION's slot convention
        sg[VY] = -1.0
        sg[VZ] = -1.0
        if cfg.eqn.is_mhd:
            sg[BY] = -1.0
            sg[BZ] = -1.0
    return sg


def _pad_axis(P, cfg: SimConfig, axis: int, bdata: BoundaryData):
    """Pad one spatial axis with ng ghost layers on each side."""
    ng = cfg.ng
    lo_bc, hi_bc = cfg.bcs[axis]
    ax = 1 + axis  # array axis (variable index leads)
    k = cfg.ndim - 1 - axis

    def take(idx):
        return jnp.take(P, jnp.asarray(idx), axis=ax)

    n = P.shape[ax]

    def ghost(side: int, kind: BC):
        # side: 0 = low face, 1 = high face; returns ng-layer strip ordered
        # outermost..innermost for lo, innermost..outermost for hi.
        if kind is BC.PERIODIC:
            return take(range(n - ng, n)) if side == 0 else take(range(0, ng))
        if kind in (BC.OUTFLOW, BC.ONEWAY_OUT):
            edge = take([0] * ng) if side == 0 else take([n - 1] * ng)
            if kind is BC.ONEWAY_OUT:
                # clip inflow normal velocity to zero
                # (reference: oneway_out_boundaries.cpp:38-100)
                vslot = VX + k
                vn = edge[vslot]
                vn = jnp.minimum(vn, 0.0) if side == 0 else jnp.maximum(vn, 0.0)
                edge = edge.at[vslot].set(vn)
            return edge
        if kind in (BC.REFLECTING, BC.JETREFLECT, BC.AXISYMMETRIC):
            sg = jnp.asarray(_mirror_signs(cfg, axis, kind)).reshape(
                (-1,) + (1,) * cfg.ndim
            )
            strip = (
                take(range(ng - 1, -1, -1)) if side == 0
                else take(range(n - 1, n - ng - 1, -1))
            )
            return strip * sg
        if kind in (BC.INFLOW, BC.FIXED):
            strip = bdata.fixed.get((axis, side))
            if strip is None:
                raise ValueError(
                    f"{kind} BC on axis {axis} side {side} needs BoundaryData.fixed"
                )
            return jnp.asarray(strip)
        raise NotImplementedError(f"BC {kind} not implemented yet")

    lo = ghost(0, lo_bc)
    hi = ghost(1, hi_bc)
    out = jnp.concatenate([lo, P, hi], axis=ax)

    # Jet inflow overwrites part of a face after the base (reflecting) pad
    # (reference: jet_boundaries.cpp: JETBC within jetradius about the axis).
    if bdata.jet is not None and bdata.jet[0] == axis:
        jaxis, jside, jrad, jstate = bdata.jet
        if (jside == 0 and lo_bc is BC.JET) or (jside == 1 and hi_bc is BC.JET):
            raise NotImplementedError("jet BC applied via jet_mask in winds module")
    return out


def apply_bcs(P, cfg: SimConfig, bdata: Optional[BoundaryData] = None):
    """Pad all axes with BC-filled ghost zones (slowest axis first, so corner
    ghosts are filled from already-padded transverse data, matching the
    reference's sequential boundary updates)."""
    if bdata is None:
        bdata = BoundaryData()
    out = P
    for axis in range(cfg.ndim):
        out = _pad_axis(out, cfg, axis, bdata)
    return out


def make_fixed_strips(P0, cfg: SimConfig) -> BoundaryData:
    """Capture the initial edge states for INFLOW/FIXED faces
    (reference: inflow_boundaries.cpp BC_assign_INFLOW uses the IC edge
    value)."""
    ng = cfg.ng
    fixed = {}
    # Mimic apply_bcs' sequential padding: when axis a is padded, axes < a
    # are already padded and axes > a are not — strips must match that shape.
    out = np.asarray(P0)
    for axis in range(cfg.ndim):
        ax = 1 + axis
        n = out.shape[ax]
        lo = np.take(out, [0] * ng, axis=ax)
        hi = np.take(out, [n - 1] * ng, axis=ax)
        for side, kind in enumerate(cfg.bcs[axis]):
            if kind in (BC.INFLOW, BC.FIXED):
                fixed[(axis, side)] = (lo if side == 0 else hi).copy()
        out = np.concatenate([lo, out, hi], axis=ax)
    return BoundaryData(fixed=fixed)


def apply_bcs_outflow_only(P, cfg: SimConfig):
    """Pad every face with outflow ghosts (helper for strip capture)."""
    out = jnp.asarray(P)
    ng = cfg.ng
    for axis in range(cfg.ndim):
        ax = 1 + axis
        n = out.shape[ax]
        lo = jnp.take(out, jnp.asarray([0] * ng), axis=ax)
        hi = jnp.take(out, jnp.asarray([n - 1] * ng), axis=ax)
        out = jnp.concatenate([lo, out, hi], axis=ax)
    return out
