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
