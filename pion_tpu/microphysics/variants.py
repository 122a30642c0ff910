"""MPv3-family variants: MPv5 (molecular clouds) and MPv6 (pure H).

- MPv5 (reference: source/microphysics/MPv5.cpp): MPv3's skeleton with the
  Henney et al. (2009) molecular/PDR heating-cooling prescription for
  photoevaporating dense clouds — drops the PAH/Wolfire neutral terms and
  adds neutral metal-line + dense-gas molecular cooling (:240-270).
- MPv6 (reference: source/microphysics/MPv6.cpp): MPv3 restricted to pure
  hydrogen for the Iliev et al. (2006/2009) RT benchmark tests — no helium,
  no metals, so JM_NION=JM_NELEC=1 and all metal terms vanish.

The legacy modules MPv0/1/2/4 are superseded by MPv3 in the reference
(MPv4.h:6-15 "used in Mackey 2012 tests only") and are compiled out of
default reference builds — their sources are guarded by `#ifdef
LEGACY_CODE` (MPv1.h:36), set only by opting `-DLEGACY_CODE` into
PION_OPTIONS (bin_serial/Makefile:301).  MPv9 is likewise compiled out
(defines/functionality_flags.h EXCLUDE_MPV9) and MPv10 is marked "not yet
working, do not use" (MPv10.h:10-21); they are intentionally not
reproduced.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import SimConfig
from .mpv3 import MIN_NEUTRAL, MPv3, MPv3Config, _interp1, _interp2


class MPv6(MPv3):
    """Pure-hydrogen MPv3 (Iliev RT benchmark chemistry)."""

    name = "MPv6"

    def __init__(self, mpc: MPv3Config):
        import dataclasses

        mpc = dataclasses.replace(mpc, helium_mass_frac=0.0,
                                  metal_mass_frac=0.0)
        super().__init__(mpc)


class MPv5(MPv3):
    """MPv3 with Henney+09 molecular heating/cooling (dense PDR gas)."""

    name = "MPv5"

    def _build_tables(self):
        super()._build_tables()
        c = self.mpc
        T = np.asarray(self.tab["T"])
        # neutral metal-line cooling (reference: MPv5.cpp:246)
        nline = 1.85e-23 * c.metallicity * np.exp(
            -28390.0 / T - (1780.0 / T) ** 2)
        self.tab["C_nline"] = jnp.asarray(nline)

    def ydot(self, one_minus_x, Eint, nH, rt):
        c = self.mpc
        omx = jnp.maximum(one_minus_x, MIN_NEUTRAL)
        x = 1.0 - omx
        T = self.temperature_of(nH, Eint, x)
        Tc = jnp.clip(T, c.min_temperature, c.max_temperature)
        expnh = jnp.exp(-nH / 1.0e4)
        ne = c.n_elec * x * nH + nH * 1.5e-4 * c.metallicity * expnh

        tb = self.tab
        Tg = tb["T"]

        def f1(name):
            return _interp1(Tg, tb[name], Tc)

        omx_dot = jnp.zeros_like(omx)
        Edot = jnp.zeros_like(Eint)

        # collisional ionization + cooling
        omx_dot -= f1("cirh") * ne * omx
        Edot -= f1("C_cih0") * ne * omx

        # photoionization (same discrete rates as MPv3, inlined; summed
        # over per-source column sets like mpv3.ydot)
        if c.ion_src is not None:
            from .mpv3 import E_EXCESS, E_MONO, SIGMA0
            from . import tables as TB

            entries = rt.get("ion")
            if entries is None:
                entries = (rt,)
            for e in entries:
                dtau_cur = nH * e["ds"] * omx * SIGMA0
                tau0 = e["tau0"]
                if c.ion_src == "mono":
                    frac = float(TB.hi_xsection_fractional(E_MONO))
                    dtau = dtau_cur * frac
                    nv = e.get("nv", None)
                    if nv is None:
                        nv = e["n_idot"] / e["vshell"]
                    rate = nv * jnp.exp(-tau0 * frac)
                    rate = rate * jnp.where(
                        dtau < 1.0e-4, dtau, 1.0 - jnp.exp(-dtau)) / nH
                    omx_dot -= rate
                    Edot += rate * E_EXCESS
                else:
                    lg = tb["log_tau"]
                    tmin, tmax = self.tau_bounds
                    sv = e.get("sv", None)
                    if sv is None:
                        sv = jnp.exp(TB.LOGTEN * self.rate_scale_log) \
                            / e["vshell"]

                    def lookup(name, tau):
                        t_ = jnp.clip(tau, tmin, tmax)
                        return jnp.exp(TB.LOGTEN * _interp1(lg, tb[name],
                                                            jnp.log10(t_)))

                    big = lookup("pi_rate", tau0) - lookup("pi_rate",
                                                           tau0 + dtau_cur)
                    small = lookup("lt_pi_rate", tau0) * dtau_cur \
                        / (SIGMA0 * nH)
                    omx_dot -= jnp.where(dtau_cur < 0.01, small, big) \
                        * sv / nH
                    bigh = lookup("pi_heat", tau0) - lookup("pi_heat",
                                                            tau0 + dtau_cur)
                    smallh = lookup("lt_pi_heat", tau0) * dtau_cur \
                        / (SIGMA0 * nH)
                    Edot += jnp.where(dtau_cur < 0.01, smallh, bigh) \
                        * sv / nH

        # recombination + cooling, He free-free, H0 excitation
        omx_dot += f1("rrhp") * x * ne
        Edot -= f1("C_rrh") * x * ne
        Edot -= f1("C_ffhe") * x * ne
        Edot -= f1("C_cxh0") * omx * ne

        # UV/IR heating
        if c.n_diff_srcs:
            g0uv = rt["g0_uv"]
            g0ir = rt["g0_ir"]
            Edot += 1.9e-26 * c.metallicity * g0uv / (1.0 + 6.4 * (g0uv / nH))
            Edot += 7.7e-32 * c.metallicity * g0ir / (1.0 + 3.0e4 / nH) ** 2

        # cosmic rays
        Edot += 5.0e-28 * omx
        omx_dot -= 1.8e-17 * omx

        # metal cooling: max(forbidden + neutral lines, CIE)
        # (reference: MPv5.cpp:244-249)
        lines = f1("C_fbdn") * x * ne + f1("C_nline") * ne * omx
        cie = f1("C_cie") * x * x * nH
        Edot -= jnp.maximum(lines, cie)

        # dense-gas molecular cooling (Henney+09; reference: MPv5.cpp:252-257)
        t1 = 70.0 + 220.0 * (nH / 1.0e6) ** 0.2
        t2 = 3.981e-27 * c.metallicity * nH**0.6 * jnp.sqrt(Tc) \
            * jnp.exp(-t1 / Tc)
        t2 = jnp.where(nH < 100.0, t2 * 0.1585 * nH**0.4, t2)
        Edot -= t2 * omx * omx * jnp.exp(-Tc * Tc / 1.0e10)

        Edot = Edot * nH
        Tmin = c.min_temperature
        cold = (Edot < 0.0) & (T < 2.0 * Tmin)
        Edot = jnp.where(cold, jnp.minimum(0.0, Edot * (T - Tmin) / Tmin),
                         Edot)
        return omx_dot, Edot
