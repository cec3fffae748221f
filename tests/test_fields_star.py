"""Radiation-field reduction and photon-source tests.

Pins ops/fields.reduce_fields (reference post_montecarlo,
disk.f90:1204-1441) and models/star.packet_ladder (reference
get_next_lam / emit_a_photon, montecarlo.f90:515-573) against
closed-form expectations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import rac2d_tpu.constants as c
from rac2d_tpu.io.draine import DustMixture
from rac2d_tpu.models import star as starmod
from rac2d_tpu.ops import fields, mcrt, optics


def test_packet_ladder_energy_and_refinement():
    star = starmod.blackbody_star(4000.0, 1.0, mass=0.6)
    lam, en = starmod.packet_ladder(star, 20_000, 0.2, 0.1, 1e-3)
    # total launched energy equals the spectrum's luminosity over the
    # grid (ladder is exact per band by construction)
    assert en.sum() == pytest.approx(star.lumi, rel=0.02)
    # refined bands carry smaller packets: UV packets ~0.2x base energy
    uv_lo, uv_hi = [b / c.Angstrom2micron for b in c.lam_range_UV]
    base = np.median(en[(lam > 4000.0) & (lam < 8000.0)])
    in_uv = (lam >= uv_lo) & (lam <= uv_hi)
    lya_lo, lya_hi = [b / c.Angstrom2micron for b in c.lam_range_LyA]
    in_lya = (lam >= lya_lo) & (lam <= lya_hi)
    if in_uv.any():
        assert np.median(en[in_uv & ~in_lya]) < 0.5 * base
    # wavelengths ascendingly ordered within numerical noise
    assert (lam > 0).all() and np.isfinite(en).all()


def test_reduce_fields_closed_form():
    """One cell, hand-made tallies: flux normalization, band split, Av
    from the UV attenuation ratio, and the Lya photon flux all follow
    closed-form arithmetic."""
    mix = DustMixture(
        lam=np.logspace(2.5, 7.5, 300), kab=np.full(300, 50.0),
        ksc=np.zeros(300), g=np.zeros(300), pmass=1e-14, rav=0.1,
        r2av=0.01, r3av=1e-3, rho_material=3.0)
    tab = optics.build_tables([mix], optics.McConfig(nlen_lut=64))
    lam = np.asarray(tab.lam)
    nlam = len(lam)
    n = 1
    vol = np.array([c.AU2cm ** 3])
    cells = mcrt.McCells(
        rmin=jnp.asarray([10.0]), rmax=jnp.asarray([11.0]),
        zmin=jnp.asarray([0.0]), zmax=jnp.asarray([1.0]),
        using=jnp.ones(n, bool), n_gas=jnp.zeros(n),
        n_HI=jnp.zeros(n), n_H2O=jnp.zeros(n),
        Tgas=jnp.full(n, 100.0), rho_dust=jnp.full((1, n), 1e-20),
        dust_depletion=jnp.ones(n), d2h=jnp.full(n, 2.8e-12),
        grain_a=jnp.full(n, 1e-5), Tdust=jnp.full((1, n), 20.0),
        mdust_cell=jnp.full((1, n), 1e20), abso_wei=jnp.ones((1, n)))

    # put unit tally energy into one UV (non-Lya) and one FIR channel
    uv_lo, uv_hi = [b / c.Angstrom2micron for b in c.lam_range_UV]
    lya_hi = c.lam_range_LyA[1] / c.Angstrom2micron
    i_uv = int(np.argmin(np.abs(lam - (lya_hi * 1.5))))
    assert uv_lo < lam[i_uv] < uv_hi
    i_fir = int(np.argmin(np.abs(lam - 1e6)))
    tall = mcrt.McTallies.zeros(n, nlam, 1, 5)
    flux_t = np.zeros((n, nlam))
    flux_t[0, i_uv] = 2.0      # AU*erg/s units pre-normalization
    flux_t[0, i_fir] = 3.0
    tall = tall._replace(flux=jnp.asarray(flux_t))

    lumi_UV0 = 4e30
    lumi_Lya = 1e30
    fld = fields.reduce_fields(
        tab, cells, tall, vol, np.array([0.01]),
        lumi_UV0, lumi_Lya, 0.5e30,
        jnp.asarray([10.0]), jnp.asarray([0.5]),
        UV_G0_background=1.0, minimum_Tdust=1.0)

    expect_uv = 2.0 * c.AU2cm / vol[0]
    expect_fir = 3.0 * c.AU2cm / vol[0]
    assert float(fld.flux_UV[0]) == pytest.approx(expect_uv, rel=1e-6)
    assert float(fld.flux_FIR[0]) == pytest.approx(expect_fir, rel=1e-6)
    assert float(fld.flux_tot[0]) == pytest.approx(
        expect_uv + expect_fir, rel=1e-6)
    assert float(fld.flux_Lya[0]) == 0.0
    # Av from attenuation ratio vs the unattenuated stellar UV
    d2 = (10.0 ** 2 + 0.5 ** 2) * c.AU2cm ** 2
    unatten = (lumi_UV0 - lumi_Lya) / (4 * np.pi * d2)
    expect_av = -1.086 * np.log(expect_uv / unatten) / c.UVext2Av
    assert float(fld.Av_toStar[0]) == pytest.approx(expect_av, rel=1e-6)
    assert float(fld.G0_UV_toStar[0]) == pytest.approx(
        unatten / c.Habing_energy_flux_CGS, rel=1e-6)
    # Tdust recovered from the absorbed-energy LUT is finite
    assert np.isfinite(float(fld.Tdust[0]))


def test_file_spectrum_merged_into_photosphere():
    """A UV-only observed spectrum must be overlaid on the full-range
    photosphere blackbody, not replace it (reference disk.f90:462-510:
    make_stellar_spectrum -> merge_stellar_spectrum; the TW Hya file
    spans only 909-3150 A)."""
    from rac2d_tpu import defaults
    from rac2d_tpu.models import star as starmod

    s = starmod.load_star_spectrum(defaults.TWHYA_SPECTRUM,
                                   mass=0.6, radius=1.0, T=4000.0)
    bb = starmod.blackbody_star(4000.0, 1.0)
    assert s.lam[0] < 909.0 and s.lam[-1] > 1e6
    # optical/IR photosphere present: luminosity beyond the file range
    # matches the blackbody
    L_opt = s.luminosity(5000.0, 1e6)
    L_opt_bb = bb.luminosity(5000.0, 1e6)
    assert L_opt == pytest.approx(L_opt_bb, rel=1e-3)
    # inside the file range the file wins (Lya line far above the bb)
    i = np.argmin(np.abs(s.lam - 1216.0))
    j = np.argmin(np.abs(bb.lam - 1216.0))
    assert s.vals[i] > 100.0 * bb.vals[j]
    # total = photosphere + UV excess, nothing lost
    assert s.lumi > bb.lumi
