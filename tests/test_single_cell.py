"""End-to-end single-cell astrochemistry (BASELINE config 1).

Dark-cloud model: rate06 network + Garrod08 initial abundances evolved to
1e6 yr at 10 K.  Checks solver health, element conservation, and that the
classic dark-cloud chemistry (CO formation, freeze-out onto ice) emerges.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rac2d_tpu.io import umist
from rac2d_tpu.ops import bdf as bdfmod
from rac2d_tpu.ops import odesys
from rac2d_tpu.ops import rates as R

D2G_NUM = 2.8e-12  # dust/H number ratio: 0.1 um grains, 1% dust by mass


@pytest.fixture(scope="module")
def dark_cloud(network, ref_inp):
    y0 = umist.load_initial_abundances(
        network, str(ref_inp / "initial_condition_Garrod08_mod.dat"))
    ode = odesys.ChemicalODE(network)
    n_gas = 2e4
    env = R.CellEnv.default(
        Tgas=10.0, Tdust=10.0, n_gas=n_gas, Av_toISM=10.0, Av_toStar=10.0,
        G0_UV_toISM=1.0, GrainRadius_CGS=1e-5, sigdust_ave=np.pi * 1e-10,
        ndust_tot=D2G_NUM * n_gas, ratioDust2HnucNum=D2G_NUM,
        SitesPerGrain=4 * np.pi * 1e-10 * 1e15)
    rtol, atol = odesys.tolerance_ladder(network, 1, 1e-4, 1e-30, D2G_NUM)
    touts = jnp.asarray(bdfmod.log_output_times(1e-8, 1e6, 1.3))
    solve = jax.jit(lambda y, T: ode.solve(env, y, T, touts, rtol, atol,
                                           first_step=1e-8))
    res = solve(jnp.asarray(y0), jnp.asarray(10.0))
    return network, y0, res


def test_solver_completes(dark_cloud):
    net, y0, res = dark_cloud
    assert not bool(res.fail)
    assert float(res.t_final) == pytest.approx(1e6)
    assert int(res.n_steps) > 100


def test_element_conservation_over_evolution(dark_cloud):
    net, y0, res = dark_cloud
    yf = np.asarray(res.ys[-1][:net.n_species])
    drift = np.abs(umist.elemental_abundances(net, yf)
                   - umist.elemental_abundances(net, y0))
    # charge (index 0) and every real element conserved; the electron count
    # (index 1) legitimately changes with ionization state (the reference
    # audit also excludes it, src/chemistry.f90:1310-1313)
    assert drift[0] < 1e-12
    assert drift[2:].max() < 1e-10


def test_dark_cloud_chemistry(dark_cloud):
    net, y0, res = dark_cloud
    yf = np.asarray(res.ys[-1][:net.n_species])

    def x(name):
        return yf[net.species.index(name)]

    # H2 remains the hydrogen reservoir
    assert 0.49 < x("H2") < 0.501
    # CO forms (1e-6..1e-4 range at 1 Myr, partially frozen out at 10 K)
    assert 1e-6 < x("CO") < 2e-4
    # water ice is a major oxygen reservoir at 10 K
    assert x("gH2O") > 1e-5
    # CO ice exists
    assert x("gCO") > 1e-6
    # electron fraction in the classic dark-cloud range
    assert 1e-9 < x("E-") < 1e-6
    # everything finite, no large negatives
    assert np.isfinite(yf).all()
    assert yf.min() > -1e-12
