"""Analysis-tool tests: projection geometry and exports."""
import numpy as np
import jax.numpy as jnp

from pion_tpu import Coord, Eqn, SimConfig
from pion_tpu.analysis import project_axisymmetric, project_3d, to_ascii, to_vtk
from pion_tpu.analysis.projection import abel_weights
from pion_tpu.constants import K_B, M_P, PG, RO
from pion_tpu.microphysics import MPv5, MPv6, MPv3Config


def test_abel_weights_uniform_sphere():
    """Projecting a uniform emissivity sphere of radius a gives the chord
    2*sqrt(a^2-b^2)."""
    n = 128
    dR = 1.0 / n
    R = (np.arange(n) + 0.5) * dR
    W = abel_weights(R, dR)
    a = 0.7
    j = (R < a).astype(float)
    proj = W @ j
    expected = 2.0 * np.sqrt(np.maximum(a * a - R * R, 0.0))
    sel = R < 0.6
    np.testing.assert_allclose(proj[sel], expected[sel], atol=2 * dR)


def test_project_axisymmetric_shapes():
    n = 32
    cfg = SimConfig(ndim=2, eqn=Eqn.EULER, coords=Coord.CYLINDRICAL,
                    ntracer=1, shape=(n, n), xmin=(0.0, 0.0),
                    xmax=(3.0e18, 3.0e18),
                    bcs=(("axisymmetric", "outflow"), ("outflow", "outflow")))
    P = np.zeros((cfg.nvar, n, n))
    nH = 100.0
    P[RO] = nH * M_P / 0.7297
    P[PG] = 2.2 * nH * K_B * 1.0e4
    P[5] = 1.0
    imgs = project_axisymmetric(jnp.asarray(P), cfg,
                                quantities=("em", "halpha", "nii", "xray"))
    for q, img in imgs.items():
        assert img.shape == (n, n)
        assert np.all(np.isfinite(np.asarray(img)))
        assert np.asarray(img).max() > 0.0


def test_project_3d():
    cfg = SimConfig(ndim=3, eqn=Eqn.EULER, shape=(8, 8, 8),
                    xmin=(0.0,) * 3, xmax=(3.0e18,) * 3,
                    bcs=(("outflow", "outflow"),) * 3)
    P = np.zeros((cfg.nvar, 8, 8, 8))
    P[RO] = 100.0 * M_P
    P[PG] = 220.0 * K_B * 1.0e4
    imgs = project_3d(jnp.asarray(P), cfg)
    assert imgs["em"].shape == (8, 8)


def test_exports(tmp_path):
    cfg = SimConfig(ndim=2, eqn=Eqn.EULER, shape=(8, 8), xmin=(0.0, 0.0),
                    xmax=(1.0, 1.0), bcs=(("outflow", "outflow"),) * 2)
    P = np.random.default_rng(0).random((cfg.nvar, 8, 8)) + 1.0
    p1 = to_ascii(str(tmp_path / "snap.txt"), P, cfg)
    data = np.loadtxt(p1)
    assert data.shape == (64, 2 + cfg.nvar)
    p2 = to_vtk(str(tmp_path / "snap"), P, cfg)
    txt = open(p2).read()
    assert "STRUCTURED_POINTS" in txt and "SCALARS rho" in txt


def test_mpv5_mpv6_instantiate():
    mp6 = MPv6(MPv3Config(tracer_slot=5))
    assert mp6.mpc.metallicity == 0.0
    assert mp6.mpc.n_elec == 1.0
    mp5 = MPv5(MPv3Config(tracer_slot=5))
    # both produce finite rates on a simple state
    cfg = SimConfig(ndim=1, eqn=Eqn.EULER, ntracer=1, shape=(4,),
                    xmin=(0.0,), xmax=(1.0,), bcs=(("outflow", "outflow"),))
    P = np.zeros((cfg.nvar, 4))
    P[RO] = 100.0 * mp5.mpc.mean_mass_per_h
    P[PG] = 220.0 * K_B * 1.0e3
    P[5] = 0.5
    for mp in (mp5, mp6):
        out = mp.update(jnp.asarray(P), 3.0e7, cfg)
        assert np.all(np.isfinite(np.asarray(out)))


def test_xray_band_tables():
    """Band emissivities behave like the reference's >E tables: higher
    threshold => strictly less emission; soft band peaks at the CIE bump;
    hard band keeps rising into the brems regime."""
    import numpy as np
    import jax.numpy as jnp
    from pion_tpu.analysis.projection import XRAY_BANDS_KEV, xray_emissivity

    T = jnp.asarray(10.0 ** np.linspace(5.0, 8.5, 50))
    one = jnp.ones_like(T)
    prev = None
    for e0 in XRAY_BANDS_KEV:
        lam = np.asarray(xray_emissivity(one, one, T, e0))
        assert np.all(lam > 0) and np.all(np.isfinite(lam))
        if prev is not None:
            assert np.all(lam <= prev + 1e-30)
        prev = lam
    soft = np.asarray(xray_emissivity(one, one, T, 0.1))
    hard = np.asarray(xray_emissivity(one, one, T, 5.0))
    logT = np.linspace(5.0, 8.5, 50)
    assert 6.0 < logT[np.argmax(soft)] < 7.3       # CIE metal bump
    assert np.argmax(hard) > len(T) - 5            # brems keeps rising
    # off-menu threshold interpolates between bands
    mid = np.asarray(xray_emissivity(one, one, T, 0.3))
    lo = np.asarray(xray_emissivity(one, one, T, 0.2))
    hi = np.asarray(xray_emissivity(one, one, T, 0.5))
    assert np.all(mid <= lo * 1.0001) and np.all(mid >= hi * 0.9999)


def test_project_3d_full_menu():
    """All reference projection quantities (projection_constants.h:5-24)
    produce finite images; RM flips sign with B_los; Stokes Q sign tracks
    which plane-of-sky component dominates."""
    from pion_tpu.constants import BX, BY, BZ

    cfg = SimConfig(ndim=3, eqn=Eqn.MHD, shape=(8, 8, 8),
                    xmin=(0.0,) * 3, xmax=(3.0e18,) * 3,
                    bcs=(("outflow", "outflow"),) * 3)
    P = np.zeros((cfg.nvar, 8, 8, 8))
    P[RO] = 100.0 * M_P
    P[PG] = 220.0 * K_B * 1.0e4
    P[BX] = 2.0e-6
    P[BY] = 1.0e-6
    P[BZ] = 0.5e-6
    quantities = ("em", "halpha", "nii", "xray", "density", "neutral",
                  "ionized", "brems6ghz", "stokes_q", "stokes_u",
                  "bxabs", "byabs", "rm")
    imgs = project_3d(jnp.asarray(P), cfg, axis=0, quantities=quantities)
    for q in quantities:
        img = np.asarray(imgs[q])
        assert img.shape == (8, 8), q
        assert np.all(np.isfinite(img)), q
    # LOS along array axis 0 = physical z: RM proportional to Bz
    rm1 = np.asarray(imgs["rm"])
    P[BZ] *= -1.0
    rm2 = np.asarray(project_3d(jnp.asarray(P), cfg, axis=0,
                                quantities=("rm",))["rm"])
    np.testing.assert_allclose(rm2, -rm1, rtol=1e-6)
    # plane-of-sky components are (x, y); |Bx| > |By| -> Q > 0
    assert np.all(np.asarray(imgs["stokes_q"]) > 0.0)
    # surface density of a uniform box = rho * L
    np.testing.assert_allclose(np.asarray(imgs["density"]),
                               100.0 * M_P * 3.0e18, rtol=1e-5)


def test_project_axisymmetric_extra_quantities():
    n = 16
    cfg = SimConfig(ndim=2, eqn=Eqn.EULER, coords=Coord.CYLINDRICAL,
                    ntracer=1, shape=(n, n), xmin=(0.0, 0.0),
                    xmax=(3.0e18, 3.0e18),
                    bcs=(("axisymmetric", "outflow"), ("outflow", "outflow")))
    P = np.zeros((cfg.nvar, n, n))
    P[RO] = 100.0 * M_P / 0.7297
    P[PG] = 2.2 * 100.0 * K_B * 1.0e4
    imgs = project_axisymmetric(jnp.asarray(P), cfg,
                                quantities=("density", "neutral", "ionized",
                                            "brems6ghz"))
    for q, img in imgs.items():
        assert img.shape == (n, n) and np.all(np.isfinite(np.asarray(img))), q


def test_project_3d_tilted_los():
    """Angled-LOS projection: a uniform cube's interior column scales as
    1/cos(theta); a LOS-aligned B field keeps |B| in the RM integrand after
    frame rotation; theta=0 reduces to project_3d exactly."""
    from pion_tpu.analysis import project_3d_los
    from pion_tpu.constants import BX, BY, BZ

    n = 32
    cfg = SimConfig(ndim=3, eqn=Eqn.MHD, shape=(n, n, n),
                    xmin=(0.0,) * 3, xmax=(3.0e18,) * 3,
                    bcs=(("outflow", "outflow"),) * 3)
    P = np.zeros((cfg.nvar, n, n, n))
    P[RO] = 100.0 * M_P
    P[PG] = 220.0 * K_B * 1.0e4
    P[BZ] = 2.0e-6  # along array axis 0 (the LOS)

    base = project_3d_los(jnp.asarray(P), cfg, axis=0, theta=0.0,
                          quantities=("density", "rm"))
    from pion_tpu.analysis import project_3d
    ref = project_3d(jnp.asarray(P), cfg, axis=0,
                     quantities=("density", "rm"))
    np.testing.assert_array_equal(np.asarray(base["density"]),
                                  np.asarray(ref["density"]))

    theta = 0.3
    tilt = project_3d_los(jnp.asarray(P), cfg, axis=0, theta=theta,
                          quantities=("density", "rm"))
    dens = np.asarray(tilt["density"])
    # central pixel: full chord through the cube, length L/cos(theta)
    mid = dens[n // 2, n // 2]
    expect = 100.0 * M_P * 3.0e18 / np.cos(theta)
    np.testing.assert_allclose(mid, expect, rtol=0.05)
    # B was along the old LOS; after rotation b_los = |B| cos(theta)
    rm_mid = np.asarray(tilt["rm"])[n // 2, n // 2]
    rm0 = np.asarray(base["rm"])[n // 2, n // 2]
    np.testing.assert_allclose(rm_mid, rm0, rtol=0.05)


def test_xray_reference_table_loads_and_matches_exactly():
    """Loading the reference's shipped XSPEC table reproduces its band
    emissivities exactly (same data, same log-log interpolation)."""
    import os

    import jax.numpy as jnp

    from pion_tpu.analysis.projection import XrayTables, xray_emissivity

    path = "/root/reference/analysis/projection/xray-table.txt"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference xray-table.txt not available")
    xt = XrayTables.from_file(path)
    assert len(xt.logt) == 77 and len(xt.tabs) == 8
    # at an exact table row the interpolation returns the row value
    row = 20
    T = 10.0 ** xt.logt[row]
    for e0, tab in xt.tabs.items():
        lam = float(xray_emissivity(jnp.asarray(1.0), jnp.asarray(1.0),
                                    jnp.asarray(T), e0, tables=xt))
        want = 10.0 ** tab[row]
        if want > 1e-90:
            np.testing.assert_allclose(lam, want, rtol=1e-6)


def test_xray_builtin_vs_reference_table():
    """Quantify the built-in approximate model against the reference's
    XSPEC table (VERDICT r3 item 10): band-by-band log10 offsets at
    representative shocked-wind temperatures.  The soft bands agree to
    within ~0.5 dex in 1e6-1e7 K; numbers recorded in PARITY.md."""
    import os

    import jax.numpy as jnp

    from pion_tpu.analysis.projection import (XRAY_BANDS_KEV, XrayTables,
                                              xray_emissivity)

    path = "/root/reference/analysis/projection/xray-table.txt"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference xray-table.txt not available")
    xt = XrayTables.from_file(path)
    print("\nband-by-band log10(builtin/XSPEC):")
    offs = {}
    for T in (1.0e6, 3.0e6, 1.0e7, 3.0e7):
        row = []
        for e0 in XRAY_BANDS_KEV[:6]:      # 0.1..2 keV (main science bands)
            ref = float(xray_emissivity(jnp.asarray(1.0), jnp.asarray(1.0),
                                        jnp.asarray(T), e0, tables=xt))
            own = float(xray_emissivity(jnp.asarray(1.0), jnp.asarray(1.0),
                                        jnp.asarray(T), e0))
            off = np.log10(own / ref) if ref > 1e-60 else np.nan
            row.append(off)
            offs[(T, e0)] = off
        print(f"T={T:.0e}: " + " ".join(f"{o:+.2f}" for o in row))
    # the bands that dominate observed diffuse X-ray fluxes from wind
    # bubbles (0.3-2 keV at 1e6-1e7 K) must be within an order of magnitude
    for T in (1.0e6, 3.0e6, 1.0e7):
        for e0 in (0.3, 0.5, 1.0):
            assert abs(offs[(T, e0)]) < 1.0, (T, e0, offs[(T, e0)])


def test_emissivity_cube():
    """Per-cell emission cube (reference: make_emission_cube.cpp):
    hot ionized gas emits in Halpha + X-rays; cold neutral gas does not."""
    from pion_tpu import Eqn, SimConfig
    from pion_tpu.analysis.projection import emissivity_cube
    from pion_tpu.constants import K_B, PG as iPG, RO as iRO
    from pion_tpu.microphysics import MPv3, MPv3Config

    cfg = SimConfig(ndim=3, eqn=Eqn.EULER, solver="hll", ntracer=1,
                    shape=(8, 8, 8), xmin=(0.0,) * 3, xmax=(3.0e18,) * 3,
                    bcs=(("outflow", "outflow"),) * 3, tmax=1.0)
    mpc = MPv3Config(tracer_slot=cfg.eqn.nbase)
    mp = MPv3(mpc)
    P = np.zeros((cfg.nvar,) + cfg.shape)
    nH = 10.0
    P[iRO] = nH * mpc.mean_mass_per_h
    # half the box: hot ionized (3e6 K); other half: cold neutral
    x = np.zeros(cfg.shape)
    x[:, :, :4] = 1.0
    P[cfg.eqn.nbase] = x
    ntot = (mpc.n_ion + mpc.n_elec * x) * nH
    T = np.where(x > 0.5, 3.0e6, 100.0)
    P[iPG] = ntot * 1.380649e-16 * T
    cube = emissivity_cube(jnp.asarray(P), cfg, mp)
    assert set(cube) == {"halpha", "brems20cm", "xray_0.1-0.5keV",
                         "xray_0.5-2keV", "xray_2-10keV"}
    for k, v in cube.items():
        v = np.asarray(v)
        assert v.shape == cfg.shape and np.all(np.isfinite(v))
        assert v[0, 0, 0] > 0.0, f"{k}: hot ionized gas must emit"
        assert v[0, 0, 0] > 1e3 * max(v[0, 0, 7], 1e-300), \
            f"{k}: cold neutral gas must not emit"
