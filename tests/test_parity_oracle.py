"""Chemistry parity vs an independent oracle (VERDICT round-1 item 1).

The oracle (tests/oracle_chem.py) re-derives the reference's rate formulas
and RHS/Jacobian in plain numpy straight from the parsed network file and
integrates with scipy's BDF — none of the rac2d_tpu.ops code is involved.
These tests pin the TPU framework's chemistry engine against it, so the
expected values do NOT come from the code under test.

Reference behavior being checked: src/chemistry.f90:591-966 (rates),
src/disk.f90:4569-4659 (RHS), src/opkdmain.f:1757 DLSODES (integration).
"""

import numpy as np
import pytest

import oracle_chem as oc


def _env_pairs(point):
    """(oracle dict, CellEnv) for one physical point."""
    from rac2d_tpu.ops.rates import CellEnv
    d2g_num = 2.8e-12
    grain_a = 1e-5
    base = dict(
        Tdust=point["Tdust"], n_gas=point["n"],
        zeta_cosmicray_H2=1.36e-17, zeta_Xray_H2=point.get("zetaX", 0.0),
        Ncol_toISM=point["n"] * 1e17,
        Av_toISM=point["Av"], Av_toStar=point["Av"],
        G0_UV_toISM=1.0, G0_UV_toStar=point.get("G0star", 0.0),
        G0_UV_H2phd=point.get("G0star", 0.0) * 0.5,
        G0_UV_toStar_photoDesorb=point.get("G0star", 0.0),
        phflux_Lya=point.get("lya", 0.0),
        omega_albedo=0.5, GrainRadius_CGS=grain_a,
        sigdust_ave=np.pi * grain_a ** 2,
        ndust_tot=d2g_num * point["n"],
        ratioDust2HnucNum=d2g_num,
        SitesPerGrain=4.0 * np.pi * grain_a ** 2 * 1e15,
    )
    oenv = dict(base)
    oenv["fss_ism"] = {"H2": 0.3, "CO": 0.6}
    oenv["fss_star"] = {"H2": 0.2, "CO": 0.5}
    cenv = CellEnv.default(
        Tgas=point["T"],
        f_selfshielding_toISM=np.array([1.0, 0.3, 0.6, 1.0, 1.0]),
        f_selfshielding_toStar=np.array([1.0, 0.2, 0.5, 1.0, 1.0]),
        **base)
    return oenv, cenv


POINTS = [
    dict(T=10.0, Tdust=10.0, n=1e5, Av=10.0),                  # dark cloud
    dict(T=50.0, Tdust=30.0, n=1e7, Av=2.0, G0star=1e2, lya=1e6,
         zetaX=1e-16),                                          # warm layer
    dict(T=300.0, Tdust=80.0, n=1e9, Av=0.5, G0star=1e4),       # inner disk
]


@pytest.mark.parametrize("ip", range(len(POINTS)))
def test_rates_match_oracle(network, ip):
    from rac2d_tpu.ops.rates import build_rate_tables, compute_rates
    oenv, cenv = _env_pairs(POINTS[ip])
    k_o = oc.oracle_rates(network, oenv, POINTS[ip]["T"])
    tab = build_rate_tables(network)
    k_j = np.asarray(compute_rates(tab, cenv, POINTS[ip]["T"]))
    # atol: XLA flushes denormal intermediates that numpy keeps; rates
    # below 1e-250 /yr are zero for every physical purpose
    np.testing.assert_allclose(k_j, k_o, rtol=5e-12, atol=1e-250)


def test_rhs_jac_match_oracle(network):
    from rac2d_tpu.io import umist
    from rac2d_tpu import defaults
    from rac2d_tpu.ops.network import build_incidence, jac_species, \
        rhs_species
    from rac2d_tpu.ops.rates import build_rate_tables, compute_rates

    oenv, cenv = _env_pairs(POINTS[1])
    T = POINTS[1]["T"]
    k_o = oc.oracle_rates(network, oenv, T)
    tab = build_rate_tables(network)
    inc = build_incidence(network)
    k_j = np.asarray(compute_rates(tab, cenv, T))

    y0 = umist.load_initial_abundances(network, defaults.INIT_ABUNDANCES)
    rng = np.random.default_rng(7)
    # three states: initial; randomized positive; with negative excursions
    y_rand = y0 * 10 ** rng.uniform(-2, 2, y0.shape) + 1e-30
    y_neg = y_rand.copy()
    y_neg[rng.integers(0, len(y0), 40)] *= -1.0
    d2h = oenv["ratioDust2HnucNum"]
    spg = oenv["SitesPerGrain"]
    for y in (y0, y_rand, y_neg):
        f_o = oc.oracle_rhs(network, k_o, y, d2h, spg)
        f_j = np.asarray(rhs_species(inc, k_j, y, d2h, spg))
        scale = np.abs(f_o).max()
        np.testing.assert_allclose(f_j, f_o, rtol=1e-9,
                                   atol=1e-12 * scale)
        J_o = oc.oracle_jac(network, k_o, y, d2h, spg)
        J_j = np.asarray(jac_species(inc, k_j, y, d2h, spg))
        jscale = np.abs(J_o).max()
        np.testing.assert_allclose(J_j, J_o, rtol=1e-9,
                                   atol=1e-12 * jscale)


@pytest.mark.slow
@pytest.mark.parametrize("ip", [0, 1])
def test_integration_parity_vs_scipy(network, ip):
    """Full-network evolution to 1e5 yr: batched TPU-style BDF vs scipy.

    Comparison tolerance: both solvers run at rtol 1e-6; abundances above
    1e-12 must agree to 5% (stiff-solver path differences), key species
    to 2%.
    """
    import jax.numpy as jnp
    from rac2d_tpu import defaults
    from rac2d_tpu.io import umist
    from rac2d_tpu.ops import bdf as bdfmod
    from rac2d_tpu.ops import odesys

    point = POINTS[ip]
    oenv, cenv = _env_pairs(point)
    y0 = umist.load_initial_abundances(network, defaults.INIT_ABUNDANCES)
    t_end = 1e5

    sol = oc.oracle_solve(network, oenv, y0, point["T"], t_end,
                          rtol=1e-6, atol=1e-25)
    y_ref = sol.y[:, -1]

    ode = odesys.ChemicalODE(network)
    touts = jnp.asarray(bdfmod.log_output_times(1e-8, t_end, 1.5))
    nS = network.n_species
    rtol = np.full(nS + 1, 1e-6)
    atol = np.full(nS + 1, 1e-25)
    res = ode.solve_batched(
        jax.tree.map(lambda a: jnp.asarray(a)[None], cenv),
        jnp.asarray(y0)[None], jnp.asarray([point["T"]]),
        touts, jnp.asarray(rtol)[None], jnp.asarray(atol)[None],
        first_step=1e-8, evolT=False, max_steps_per_interval=4000)
    assert not bool(res.fail[0])
    y_tpu = np.asarray(res.ys[0, -1, :nS])

    big = y_ref > 1e-12
    rel = np.abs(y_tpu[big] - y_ref[big]) / y_ref[big]
    worst = np.argsort(rel)[::-1][:5]
    names = [network.species[i] for i in np.nonzero(big)[0][worst]]
    assert rel.max() < 0.05, (
        f"worst deviations: {list(zip(names, rel[worst]))}")
    ki = network.key_species_idx
    relk = np.abs(y_tpu[ki] - y_ref[ki]) / np.maximum(y_ref[ki], 1e-30)
    assert relk.max() < 0.02, dict(zip(
        [network.species[i] for i in ki], relk))


import jax  # noqa: E402  (used inside the slow test)
