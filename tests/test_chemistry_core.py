"""Unit tests for network parsing, rate evaluation, RHS/Jacobian assembly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rac2d_tpu.io import umist
from rac2d_tpu.ops import network as netops
from rac2d_tpu.ops import rates as ratesops


def test_parse_counts(network):
    assert network.n_reactions == 5830
    assert network.n_species == 484
    assert len(network.grain_species_idx) == 53


def test_element_conservation(network):
    net = network
    bad = 0
    for i in range(net.n_reactions):
        eL = net.elements[net.reac[i][net.reac[i] >= 0]].sum(0)
        eR = net.elements[net.prod[i][net.prod[i] >= 0]].sum(0)
        d = np.abs(eL[2:] - eR[2:]).sum() + abs(eL[0] - eR[0])
        bad += bool(d)
    assert bad == 0


def test_get_elements():
    e = umist.get_elements("H2O")
    assert e[umist.ELEMENTS.index("H")] == 2
    assert e[umist.ELEMENTS.index("O")] == 1
    e = umist.get_elements("Grain0")
    assert e[umist.ELEMENTS.index("Grain")] == 1
    e = umist.get_elements("gCH3OH")
    assert e[umist.ELEMENTS.index("C")] == 1
    assert e[umist.ELEMENTS.index("H")] == 4
    e = umist.get_elements("HC10N+")  # 2-digit multiplier + charge
    assert e[umist.ELEMENTS.index("C")] == 10
    assert e[0] == 1
    e = umist.get_elements("He+")
    assert e[umist.ELEMENTS.index("He")] == 1
    assert e[umist.ELEMENTS.index("H")] == 0


def test_initial_abundances(network, ref_inp):
    y0 = umist.load_initial_abundances(
        network, str(ref_inp / "initial_condition_Garrod08_mod.dat"))
    assert abs(float(y0 @ network.elements[:, 3]) - 1.0) < 1e-12
    assert abs(float(y0 @ network.elements[:, 0])) < 1e-15


@pytest.fixture(scope="module")
def cell(network):
    tab = ratesops.build_rate_tables(network)
    inc = netops.build_incidence(network, h2_form_use_moeq=False)
    env = ratesops.CellEnv.default(Tgas=50.0, Tdust=30.0, n_gas=1e8,
                                   ratioDust2HnucNum=1e-12)
    return tab, inc, env


def test_rates_finite_positive(network, cell):
    tab, inc, env = cell
    k = ratesops.compute_rates(tab, env, env.Tgas)
    k = np.asarray(k)
    assert np.isfinite(k).all()
    assert (k >= 0).all()
    # inactive itypes get zero rates
    for t in (9, 53, 67, 123):
        mask = network.itype == t
        if mask.any():
            assert np.abs(k[mask]).max() == 0.0


def test_dupli_selection(network, cell):
    tab, inc, env = cell
    k = np.asarray(ratesops.compute_rates(tab, env, env.Tgas))
    # within every duplicate group at most one reaction is active
    for g in range(int(network.dupli_group.max()) + 1):
        members = np.nonzero(network.dupli_group == g)[0]
        assert (k[members] != 0).sum() <= 1


def test_rhs_conserves_elements(network, cell):
    tab, inc, env = cell
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.uniform(1e-12, 1e-4, network.n_species))
    k = ratesops.compute_rates(tab, env, env.Tgas)
    ydot = netops.rhs_species(inc, k, y, env.ratioDust2HnucNum,
                              env.SitesPerGrain)
    # element conservation: d/dt (y . elements) = 0 for all conserved elements
    drift = np.asarray(ydot) @ network.elements.astype(float)
    scale = np.abs(np.asarray(ydot)).max()
    # charge (0) and all real elements (2:) conserved; electrons via charge
    assert np.abs(drift[0]) < 1e-10 * scale
    assert np.abs(drift[2:]).max() < 1e-10 * scale


def test_jacobian_matches_fd(network, cell):
    tab, inc, env = cell
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.uniform(1e-10, 1e-4, network.n_species))
    k = ratesops.compute_rates(tab, env, env.Tgas)

    def f(yy):
        return netops.rhs_species(inc, k, yy, env.ratioDust2HnucNum,
                                  env.SitesPerGrain)

    J = np.asarray(netops.jac_species(inc, k, y, env.ratioDust2HnucNum,
                                      env.SitesPerGrain))
    J_ad = np.asarray(jax.jacfwd(f)(y))
    # analytic assembly must agree with autodiff of the RHS
    scale = np.abs(J_ad).max()
    assert np.abs(J - J_ad).max() < 1e-9 * scale
