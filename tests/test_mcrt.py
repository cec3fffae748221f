"""Monte Carlo transport tests: MRW sampling, opacity means, and an
optically thin analytic check.

Fixtures follow SURVEY.md section 4's implied strategy: (b) MC RT on an
optically thin configuration with an analytic answer, plus statistical
checks of the new Modified-Random-Walk machinery (no analogue in the
reference, which walks every scattering: src/montecarlo.f90:577).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rac2d_tpu.io.draine import DustMixture
from rac2d_tpu.ops import geometry, mcrt, optics


def test_mrw_first_passage_moments():
    """The sampled first-passage -ln(y) has mean pi^2/6 (diffusion from
    the center of a sphere; Min et al. 2009)."""
    t = optics.mrw_lnx_table(n=4096)
    assert (np.diff(t) >= 0).all()
    assert abs(-t.mean() - np.pi ** 2 / 6) < 0.01
    # all paths finite and positive
    assert np.isfinite(t).all() and (t < 0).all()


def _gray_mixture(kab=100.0, ksc=50.0, g=0.5):
    lam = np.logspace(2, 7.5, 300)   # angstrom
    n = len(lam)
    return DustMixture(lam=lam, kab=np.full(n, kab), ksc=np.full(n, ksc),
                       g=np.full(n, g), pmass=1e-14, rav=0.1, r2av=0.01,
                       r3av=1e-3, rho_material=3.0)


def test_planck_rosseland_gray():
    """For gray opacity the Planck mean equals kappa_abs and the
    Rosseland transport mean equals kab + ksc (1 - g) at temperatures
    whose emission stays inside the lambda grid."""
    mix = _gray_mixture()
    tab = optics.build_tables([mix], optics.McConfig(nlen_lut=64))
    lut = tab.lut_Tds
    i = np.searchsorted(lut, 100.0)
    assert abs(tab.kap_P[0, i] - 100.0) / 100.0 < 0.05
    ktr_expect = 100.0 + 50.0 * (1.0 - 0.5)
    assert abs(tab.kap_trR[0, i] - ktr_expect) / ktr_expect < 0.05
    # tables are sane across the full T range (no zero/garbage entries)
    assert (tab.kap_P[0] > 1.0).all()
    assert (tab.kap_trR[0] > 1.0).all()
    assert np.isfinite(tab.lut_vals).all()


def _uniform_sphere_model(tau_half=0.05, n_dust_rho=None):
    """One-cell annulus ('sphere' stand-in) with uniform gray dust."""
    mix = _gray_mixture(kab=100.0, ksc=0.0, g=0.0)
    cfg = optics.McConfig(nlen_lut=64)
    tab = optics.build_tables([mix], cfg)
    # a single cell spanning r in [0.01, 1] AU, z in [0, 1] AU
    import rac2d_tpu.constants as c
    rho = tau_half / (100.0 * 1.0 * c.AU2cm)   # kab * rho * 1AU = tau_half
    rmin = np.array([0.01])
    rmax = np.array([1.0])
    zmin = np.array([0.0])
    zmax = np.array([1.0])
    gi = geometry.GridIndex(
        r_edges=jnp.asarray([0.01, 1.0]),
        z_edges=jnp.asarray([[0.0, 1.0]]),
        cell_of=jnp.asarray([[0]], dtype=jnp.int32),
        n_z=jnp.asarray([1], jnp.int32),
        zmax_dom=1.0, rmin_dom=0.01, rmax_dom=1.0)
    n = 1
    cells = mcrt.McCells(
        rmin=jnp.asarray(rmin), rmax=jnp.asarray(rmax),
        zmin=jnp.asarray(zmin), zmax=jnp.asarray(zmax),
        using=jnp.ones(n, bool), n_gas=jnp.zeros(n), n_HI=jnp.zeros(n),
        n_H2O=jnp.zeros(n), Tgas=jnp.full(n, 100.0),
        rho_dust=jnp.full((1, n), rho),
        dust_depletion=jnp.ones(n), d2h=jnp.full(n, 1e-12),
        grain_a=jnp.full(n, 1e-5),
        Tdust=jnp.full((1, n), 50.0),
        mdust_cell=jnp.full((1, n), 1.0),
        abso_wei=jnp.ones((1, n)))
    model = mcrt.McModel(tab=tab, gi=gi, cells=cells, star_mass=1.0)
    return model, tab, rho


def test_mc_optically_thin_absorption():
    """Thin limit: absorbed fraction along a half-height path ~ tau, and
    energy is conserved between escape and absorption tallies."""
    model, tab, rho = _uniform_sphere_model(tau_half=0.05)
    B = 4000
    key = jax.random.PRNGKey(0)
    lam = np.full(B, 5.5e4)       # 5.5 micron, inside the dust grid
    en = np.ones(B)
    pk = mcrt.launch_packets(model, key, jnp.asarray(lam), jnp.asarray(en),
                             0.0, 1.0)
    tall = mcrt.McTallies.zeros(1, len(tab.lam), 1, 5)
    pk, tall = mcrt.mc_pass(model, key, pk, tall, use_mrw=False)
    st = np.asarray(pk.status)
    assert (st != mcrt.ST_ACTIVE).all()
    absorbed = float(np.asarray(tall.en_gain).sum())
    # continuous estimator ~ <tau along path> in the thin limit
    assert 0.02 < absorbed / B < 0.2
    assert np.isfinite(np.asarray(tall.flux)).all()


def test_mrw_thick_cell_matches_plain_walk():
    """In a very thick gray cell the MRW-accelerated pass deposits the
    same total energy as the brute-force walk (same estimator, far
    fewer loop steps), and runs to completion."""
    model, tab, rho = _uniform_sphere_model(tau_half=300.0)
    B = 600
    lam = np.full(B, 3.0e5)      # 30 micron: thermalized IR
    en = np.ones(B)

    res = {}
    for use_mrw in (False, True):
        key = jax.random.PRNGKey(1)
        pk = mcrt.launch_packets(model, key, jnp.asarray(lam),
                                 jnp.asarray(en), 0.0, 1.0)
        tall = mcrt.McTallies.zeros(1, len(tab.lam), 1, 5)
        pk, tall = mcrt.mc_pass(model, key, pk, tall, use_mrw=use_mrw,
                                mrw_gamma=4.0, max_steps=40_000)
        res[use_mrw] = (float(np.asarray(tall.en_gain).sum()),
                        np.asarray(pk.status), np.asarray(pk.e_count))

    en_plain, st_plain, ec_plain = res[False]
    en_mrw, st_mrw, ec_mrw = res[True]
    # MRW must have fired and cut the event counts dramatically
    assert ec_mrw.max() < ec_plain.max() / 5
    # same physical answer within MC noise
    assert abs(en_mrw - en_plain) / en_plain < 0.15
    # all packets finished under MRW
    assert (st_mrw != mcrt.ST_ACTIVE).all()


def test_mc_pass_hosted_matches_single_program():
    """The host-chunked walk (bounded device programs for the TPU
    watchdog) must reproduce the single-program mc_pass bit-for-bit:
    same RNG stream threads across chunk boundaries, MRW fold applied
    exactly once at the end."""
    model, tab, rho = _uniform_sphere_model(tau_half=20.0)
    B = 800
    lam = np.full(B, 3.0e5)
    en = np.ones(B)
    key = jax.random.PRNGKey(3)

    pk0 = mcrt.launch_packets(model, key, jnp.asarray(lam),
                              jnp.asarray(en), 0.0, 1.0)
    tall0 = mcrt.McTallies.zeros(1, len(tab.lam), 1, 5)
    pk_a, tl_a = mcrt.mc_pass(model, key, pk0, tall0, use_mrw=True,
                              max_steps=40_000)

    pk1 = mcrt.launch_packets(model, key, jnp.asarray(lam),
                              jnp.asarray(en), 0.0, 1.0)
    tall1 = mcrt.McTallies.zeros(1, len(tab.lam), 1, 5)
    chunks = []
    pk_b, tl_b, _ = mcrt.mc_pass_hosted(
        model, key, pk1, tall1, use_mrw=True, steps_per_call=37,
        max_steps=40_000,
        progress_cb=lambda done, act: chunks.append((done, act)))

    assert len(chunks) > 2, "walk must actually span several chunks"
    np.testing.assert_array_equal(np.asarray(pk_b.status),
                                  np.asarray(pk_a.status))
    np.testing.assert_allclose(np.asarray(tl_b.en_gain),
                               np.asarray(tl_a.en_gain), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tl_b.flux),
                               np.asarray(tl_a.flux), rtol=1e-6)


def test_mc_pass_hosted_compaction_conserves_physics():
    """Compacted batches (tier ladder + ST_PADDING filler) must not
    change the physics: every launched packet accounted for in the fate
    counts, and the deposited/escaped energy statistically identical to
    the uncompacted pass."""
    model, tab, rho = _uniform_sphere_model(tau_half=20.0)
    B = 4096
    lam = np.full(B, 3.0e5)
    en = np.ones(B)
    key = jax.random.PRNGKey(5)

    pk0 = mcrt.launch_packets(model, key, jnp.asarray(lam),
                              jnp.asarray(en), 0.0, 1.0)
    tall0 = mcrt.McTallies.zeros(1, len(tab.lam), 1, 5)
    pk_a, tl_a = mcrt.mc_pass(model, key, pk0, tall0, use_mrw=True,
                              max_steps=40_000)

    pk1 = mcrt.launch_packets(model, key, jnp.asarray(lam),
                              jnp.asarray(en), 0.0, 1.0)
    tall1 = mcrt.McTallies.zeros(1, len(tab.lam), 1, 5)
    pk_b, tl_b, fates = mcrt.mc_pass_hosted(
        model, key, pk1, tall1, use_mrw=True, steps_per_call=64,
        max_steps=40_000, compact=True, compact_floor=64)

    # batch actually shrank at some point
    assert pk_b.x.shape[0] < B
    # every packet accounted for, none double-counted
    assert sum(fates.values()) == B
    assert fates["active"] == 0
    en_a = float(np.asarray(tl_a.en_gain).sum())
    en_b = float(np.asarray(tl_b.en_gain).sum())
    assert en_a > 0
    # same seed, different lane->rng assignment after compaction:
    # statistically identical (MC noise ~ 1/sqrt(B))
    np.testing.assert_allclose(en_b, en_a, rtol=0.1)


def test_mc_pass_streamed_refill_conserves_physics():
    """The constant-width streamed pass (batch topped up from the packet
    pool as lanes terminate, round-5 pass-level rebuild) must account
    for every pool packet exactly once and deposit statistically
    identical energy to the plain full-width pass."""
    model, tab, rho = _uniform_sphere_model(tau_half=20.0)
    N = 4096
    lam = np.full(N, 3.0e5)
    en = np.ones(N)
    key = jax.random.PRNGKey(7)

    pk0 = mcrt.launch_packets(model, key, jnp.asarray(lam),
                              jnp.asarray(en), 0.0, 1.0)
    tall0 = mcrt.McTallies.zeros(1, len(tab.lam), 1, 5)
    pk_a, tl_a = mcrt.mc_pass(model, key, pk0, tall0, use_mrw=True,
                              max_steps=40_000)

    tall1 = mcrt.McTallies.zeros(1, len(tab.lam), 1, 5)
    refills = []
    _, tl_b, fates = mcrt.mc_pass_streamed(
        model, key, lam, en, 0.0, 1.0, tall1, max_batch=512,
        steps_per_call=64, max_steps=40_000, use_mrw=True,
        compact_floor=64,
        progress_cb=lambda done, act, left: refills.append(left))

    # the pool actually drained through multiple top-ups
    assert refills[0] > 0 and refills[-1] == 0
    # every pool packet accounted for exactly once
    assert sum(fates.values()) == N
    assert fates["active"] == 0
    en_a = float(np.asarray(tl_a.en_gain).sum())
    en_b = float(np.asarray(tl_b.en_gain).sum())
    assert en_a > 0
    np.testing.assert_allclose(en_b, en_a, rtol=0.1)
    assert np.isfinite(np.asarray(tl_b.flux)).all()
