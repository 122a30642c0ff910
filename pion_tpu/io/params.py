"""icgen-style key-value parameter files.

Equivalent of the reference's text-parameter pipeline
(reference: source/dataIO/readparams.cpp + the typed parameter registry in
dataIO/parameter_defs.h:56; file format as in
test_problems/advection/params_*.txt: one `name value` pair per line,
'#' comments).  ``read_paramfile`` parses the file; ``config_from_params``
maps the reference's parameter names onto a :class:`SimConfig`.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

from ..config import SimConfig
from ..constants import BC, Coord, Eqn, Solver

_EQN = {1: Eqn.EULER, 2: Eqn.MHD, 9: Eqn.GLM}
_COORD = {1: Coord.CARTESIAN, 2: Coord.CYLINDRICAL, 3: Coord.SPHERICAL}
_SOLVER = {0: Solver.LF, 1: Solver.LINEAR, 2: Solver.EXACT, 3: Solver.HYBRID,
           4: Solver.RCV, 5: Solver.RPV, 6: Solver.FVS, 7: Solver.HLLD,
           8: Solver.HLL}
_BC = {"periodic": BC.PERIODIC, "outflow": BC.OUTFLOW,
       "oneway_out": BC.ONEWAY_OUT, "owo": BC.ONEWAY_OUT,
       "inflow": BC.INFLOW, "fixed": BC.FIXED, "reflecting": BC.REFLECTING,
       "refl": BC.REFLECTING, "axisymmetric": BC.AXISYMMETRIC,
       "axi": BC.AXISYMMETRIC, "jet": BC.JET, "jetreflect": BC.JETREFLECT,
       "dmach": BC.DMACH, "dmach2": BC.DMACH2}


def read_paramfile(path: str) -> Dict[str, str]:
    """Parse `name value` lines; later entries override earlier ones
    (reference: readparams.cpp)."""
    out: Dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].strip()
            if not line:
                continue
            parts = line.split(None, 1)
            if len(parts) == 2:
                out[parts[0]] = parts[1].strip()
    return out


def apply_overrides(params: Dict[str, str], overrides) -> Dict[str, str]:
    """CLI-style name=value overrides (reference: sim_init.cpp:329-660)."""
    out = dict(params)
    for ov in overrides:
        if "=" in ov:
            k, v = ov.split("=", 1)
            out[k.strip()] = v.strip()
    return out


def config_from_params(params: Dict[str, str], **extra) -> SimConfig:
    """Build a SimConfig from reference-style parameter names
    (ndim, eqn, coordinates, solver, NgridX.., Xmin.., BC strings, gamma,
    CFLno, ArtificialViscosity, EtaViscosity, FinishTime, OrderOfAccSpace)."""
    g = lambda k, d=None: params.get(k, d)
    ndim = int(g("ndim", g("gridndim", 1)))
    # reference axis order is (x,y,z); our array order is reversed
    ns = [int(g(f"Ngrid{a}", 0) or 0) for a in "XYZ"][:ndim]
    xmins = [float(g(f"Xmin{a}", 0.0) or 0.0) for a in "XYZ"][:ndim]
    xmaxs = [float(g(f"Xmax{a}", 1.0) or 1.0) for a in "XYZ"][:ndim]
    shape = tuple(reversed(ns))
    xmin = tuple(reversed(xmins))
    xmax = tuple(reversed(xmaxs))

    def bc_pair(a):
        lo = _BC[g(f"BC{a}n", g(f"BC_{a}N", "outflow")).lower()]
        hi = _BC[g(f"BC{a}p", g(f"BC_{a}P", "outflow")).lower()]
        return (lo, hi)

    bcs = tuple(reversed([bc_pair(a) for a in "XYZ"[:ndim]]))
    eqn = _EQN[int(g("eqn", g("eqntype", 1)))]
    av_flag = int(g("ArtificialViscosity", 0) or 0)
    av = {0: "none", 1: "falle", 3: "hcorr", 4: "hcorr_falle"}.get(av_flag,
                                                                   "none")
    cfg = SimConfig(
        ndim=ndim,
        eqn=eqn,
        coords=_COORD[int(g("coordinates", g("coordsys", 1)))],
        solver=_SOLVER[int(g("solver", g("solverType", 8)))],
        ntracer=int(str(g("ntracer", "0")).split()[0]),
        gamma=float(g("gamma", 5.0 / 3.0)),
        cfl=float(g("CFLno", g("cfl", 0.3))),
        ooa=int(g("OrderOfAccSpace", g("ooa", 2))),
        av=av,
        etav=float(g("EtaViscosity", 0.1)),
        shape=shape,
        xmin=xmin,
        xmax=xmax,
        bcs=bcs,
        tmax=float(g("FinishTime", g("finishtime", 1.0))),
        **extra,
    )
    return cfg
