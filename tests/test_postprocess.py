"""Post-processing toolset tests (reference utils_python role)."""

import json

import numpy as np
import pytest


def _fake_table(n=24):
    rng = np.random.default_rng(0)
    rmin = np.repeat(np.array([1.0, 2.0, 4.0, 8.0]), 6)
    rmax = rmin * 1.5
    zmin = np.tile(np.arange(6) * 0.5, 4)
    zmax = zmin + 0.5
    return dict(
        rmin=rmin, rmax=rmax, zmin=zmin, zmax=zmax,
        using=np.ones(n, bool), n_gas=np.full(n, 1e6),
        species=np.array(["H2", "CO"]),
        abundances=np.stack([np.full(n, 0.5),
                             10 ** rng.uniform(-6, -4, n)]))


def test_profiles_and_columns():
    from rac2d_tpu import postprocess as pp
    t = _fake_table()
    r, v = pp.radial_profile(t, t["n_gas"], z_over_r_max=1e3)
    assert len(r) > 0 and (np.diff(r) >= 0).all()
    z, v = pp.vertical_cut(t, pp.abundance(t, "CO"), r0=3.0)
    assert len(z) == 6 and (np.diff(z) > 0).all()
    rs, N = pp.column_density(t, "H2")
    assert len(rs) == 4
    import rac2d_tpu.constants as c
    expect = 1e6 * 0.5 * 3.0 * c.AU2cm      # 6 cells x 0.5 AU
    np.testing.assert_allclose(N, expect, rtol=1e-10)
    d = pp.iter_diff(t, t, "CO")
    assert (d == 0).all()


def test_moment_maps_and_pv():
    from rac2d_tpu import postprocess as pp
    import rac2d_tpu.constants as c
    nf, ny, nx = 21, 5, 5
    f0 = 2.3e11
    freqs = f0 * (1 + np.linspace(-1e-5, 1e-5, nf))
    cube = np.zeros((nf, ny, nx))
    # left half emits blue-shifted, right half red-shifted
    cube[4, :, :2] = 1.0
    cube[16, :, 3:] = 1.0
    mom0, mom1 = pp.moment_maps(cube, freqs, restfreq=f0)
    assert mom0.shape == (ny, nx)
    assert mom1[2, 0] * mom1[2, 4] < 0      # opposite signs
    pv = pp.pv_cut(cube)
    assert pv.shape == (nf, nx)
    sm = pp.convolve_beam(cube[4], 2.0)
    np.testing.assert_allclose(sm.sum(), cube[4].sum(), rtol=1e-8)
    assert sm.max() < cube[4].max()         # smoothing spreads the peak


def test_parse_contributions(tmp_path):
    from rac2d_tpu import postprocess as pp
    p = tmp_path / "ana_r10_z2.txt"
    p.write_text(
        "# point (10, 2) AU -> cell 5 [1,2]x[0,1]\n"
        "n_gas = 1.0e+06 cm^-3\n"
        "Tgas  = 35.20 K\n\n"
        "== CO  X = 1.2e-04 ==\n"
        "  production:\n"
        "     1.0e-10   60.0%  C + OH -> CO + H\n"
        "     5.0e-11   40.0%  HCO+ + E- -> CO + H\n"
        "  destruction:\n"
        "     9.0e-11   90.0%  CO + PHOTON -> C + O\n")
    d = pp.parse_contributions(str(p))
    assert d["header"]["Tgas"] == pytest.approx(35.2)
    assert len(d["CO"]["produce"]) == 2
    assert d["CO"]["produce"][0][1] == pytest.approx(0.6)
    assert "PHOTON" in d["CO"]["destroy"][0][2]


def test_specline_roundtrip(tmp_path):
    """SpecLine must recover the metadata cards and reproduce the
    INTFLUX/INTFLUXL integrals (reference fits_proc.specline reads the
    same card set that ray_tracing.f90:730-753 writes)."""
    from rac2d_tpu import postprocess as pp
    from rac2d_tpu.io import fits as fitsio
    nf, ny, nx = 16, 4, 4
    f0 = 345.796e9
    df = 1e5
    freqs = f0 + (np.arange(nf) - nf / 2) * df
    cube = np.random.default_rng(1).random((nx, ny, nf))
    spec = cube.sum(axis=(0, 1))
    base = np.linspace(spec[0], spec[-1], nf)
    hdr = {"EXTNAME": "LineCube", "F0": f0, "LAM0": 8669.9,
           "EUP": 33.2, "ELOW": 16.6, "AUL": 2.5e-6,
           "BUL": 1.1e4, "BLU": 3.3e4, "QNUM": "3->2",
           "MOL-DB": "CO", "MAXFLUX": float(spec.max()),
           "MAXTAU": 7.5,
           "INTFLUX": float(spec.sum() * 1e-26 * df),
           "INTFLUXL": float((spec - base).sum() * 1e-26 * df),
           "THETA": 7.0, "DIST": 54.0}
    p = tmp_path / "line.fits"
    fitsio.write_cube_fits(p, cube, freqs=freqs, spectrum=spec,
                           header=hdr)
    sl = pp.SpecLine(p)
    assert sl.molname == "CO" and sl.qnum == "3->2"
    np.testing.assert_allclose(sl.f0, f0)
    np.testing.assert_allclose(sl.E_up, 33.2)
    np.testing.assert_allclose(sl.dist, 54.0)
    np.testing.assert_allclose(sl.spec, spec, rtol=1e-12)
    # velocity axis: v=0 at the rest frequency
    iv0 = np.argmin(np.abs(sl.v))
    assert abs(sl.f[iv0] - f0) <= df
    np.testing.assert_allclose(sl.integrated_flux(False), sl.intflux,
                               rtol=1e-10)
    np.testing.assert_allclose(sl.integrated_flux(True), sl.intfluxl,
                               rtol=1e-8)


def test_scale_height_and_tau_surface():
    """A discretized Gaussian layer must return H ~ the input scale
    height, and the tau=1 surface must sit where the analytic overhead
    column reaches 1/kappa."""
    from rac2d_tpu import postprocess as pp
    import rac2d_tpu.constants as c
    H_in = 1.0      # AU
    nz, dz = 120, 0.05
    zmin = np.arange(nz) * dz
    t = dict(rmin=np.full(nz, 1.0), rmax=np.full(nz, 1.5),
             zmin=zmin, zmax=zmin + dz,
             n_gas=1e8 * np.exp(-0.5 * ((zmin + dz / 2) / H_in) ** 2),
             Tgas=np.full(nz, 50.0), using=np.ones(nz, bool))
    rc, H = pp.scale_height(t)
    assert len(rc) == 1
    np.testing.assert_allclose(H[0], H_in, rtol=0.05)
    # kappa chosen so tau0=1 is reached at a known overhead column
    N_target = 1e8 * H_in * c.AU2cm * np.sqrt(2 * np.pi) * 0.2
    kappa = 1.0 / N_target
    rc, z1 = pp.tau_surface(t, kappa)
    # invert: expected z where erfc(z/H/sqrt2)/2 * full column = N_target
    from math import erf
    col = lambda z: (1e8 * H_in * c.AU2cm * np.sqrt(2 * np.pi)
                     * 0.5 * (1 - erf(z / H_in / np.sqrt(2))))
    zs = np.linspace(0, 6, 4000)
    z_expect = zs[np.argmin(np.abs([col(z) - N_target for z in zs]))]
    np.testing.assert_allclose(z1[0], z_expect, atol=0.08)
    st = pp.stokes_number(t, 2e33, 1e-5)
    assert (st > 0).all() and np.isfinite(st).all()
    fac = pp.settling_factor(st)
    assert (fac > 0).all()


def test_to_spherical_and_groups(tmp_path):
    from rac2d_tpu import postprocess as pp
    n = 8
    t = dict(rmin=np.array([1., 1., 1., 1., 3., 3., 3., 3.]),
             rmax=np.array([3., 3., 3., 3., 9., 9., 9., 9.]),
             zmin=np.tile([0., 2.], 4)[:n],
             zmax=np.tile([2., 8.], 4)[:n],
             using=np.ones(n, bool))
    vals = np.arange(n, dtype=float) + 1
    r_grid = np.array([1.0, 3.0, 9.0])
    theta_grid = np.array([0.0, np.pi / 4, np.pi / 2])
    out = pp.to_spherical(t, {"v": vals}, r_grid, theta_grid)
    v = out["v"]
    assert v.shape == (1, 2, 2)
    # theta near pole (first bin center pi/8): point at r=2 -> rho=0.77,
    # z=1.85 -> inner column upper cell? rho<1 -> outside -> 0
    assert v[0, 1, 0] == 1.0   # near midplane, inner radius: cell 0
    p = tmp_path / "v.inp"
    pp.write_radmc_inp(p, v)
    vals_back = np.loadtxt(p)
    assert len(vals_back) == v.size
    names = ["H2", "C2H2", "CH4", "HCN", "NH3", "Na", "CO", "gC3H2+"]
    hc = pp.hydrocarbons(names)
    assert set(hc) == {"C2H2", "CH4", "gC3H2+"}
    nb = pp.nitrogen_bearing(names)
    assert "HCN" in nb and "NH3" in nb and "Na" not in nb


def test_specline_rebuild_without_fluxspec(tmp_path):
    """A cube written WITHOUT the FLUXSPEC extension must still yield a
    flux spectrum when the pixel solid angle is recoverable (PIXSR card,
    ADVICE r4), and quoted header values containing '/' must survive
    the comment-separator parsing."""
    from rac2d_tpu import postprocess as pp
    from rac2d_tpu.io import fits as fitsio
    nf, ny, nx = 8, 3, 3
    f0 = 345.796e9
    df = 1e5
    freqs = f0 + (np.arange(nf) - nf / 2) * df
    cube = np.random.default_rng(2).random((nx, ny, nf))
    pix_sr = 2.5e-13
    hdr = {"EXTNAME": "LineCube", "F0": f0, "QNUM": "F=1/2-3/2",
           "MOL-DB": "OH", "THETA": 45.0, "DIST": 100.0,
           "PIXSR": pix_sr}
    p = tmp_path / "line_nospec.fits"
    fitsio.write_cube_fits(p, cube, freqs=freqs, header=hdr)
    sl = pp.SpecLine(p)
    assert sl.qnum == "F=1/2-3/2"          # '/' inside quotes preserved
    expect = cube.sum(axis=(0, 1)) * pix_sr / 1e-23
    np.testing.assert_allclose(sl.spec, expect, rtol=1e-10)


def test_element_tokenizer_groups():
    """_counts / nitrogen_bearing must tokenize two-letter symbols
    first: Ne/Na species are not nitrogen, He is not hydrogen, Cl is
    not carbon (ADVICE r4)."""
    from rac2d_tpu import postprocess as pp
    assert pp._counts("HNe+") == {"H": 1, "Ne": 1}
    assert pp._counts("HC3N") == {"H": 1, "C": 3, "N": 1}
    assert pp._counts("He") == {"He": 1}
    assert pp._counts("Cl2") == {"Cl": 2}
    assert pp._counts("NaCl") == {"Na": 1, "Cl": 1}
    names = ["HNe+", "Ne", "NH3", "N2H+", "NaH", "CN", "HCN", "CO"]
    nb = pp.nitrogen_bearing(names)
    assert set(nb) == {"NH3", "N2H+", "CN", "HCN"}
