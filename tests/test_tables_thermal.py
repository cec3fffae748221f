"""Thermal balance, table accessors, and column/shielding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rac2d_tpu.io import tables
from rac2d_tpu.ops import columns


def test_visser_shielding_limits():
    v = tables.VisserCOShielding()
    assert abs(float(v.shielding(1.0, 1.0)) - 1.0) < 1e-6
    # monotone decline with CO column
    f1 = float(v.shielding(1e20, 1e14))
    f2 = float(v.shielding(1e20, 1e17))
    assert f2 < f1 < 1.0


def test_h2_self_shielding_limits():
    assert abs(float(columns.h2_self_shielding(0.0, 1e5)) - 1.0) < 1e-3
    assert float(columns.h2_self_shielding(1e22, 1e5)) < 1e-4


def test_neufeld_co_positive():
    co = tables.NeufeldCO()
    for T in (15.0, 80.0, 300.0, 1500.0):
        p = co.params(jnp.asarray(T), jnp.asarray(16.0))
        assert float(p.L0) > 0
        assert float(p.L_LTE) > 0


def test_ion_lut_monotone_T():
    import pathlib
    lut = tables.IonCoolingLUT(
        pathlib.Path(tables.DATA_DIR) / "N+_LUT.bin")
    c1 = float(lut.cooling_per_ion(10.0, 100.0))
    c2 = float(lut.cooling_per_ion(10.0, 1000.0))
    assert c1 > 0 and c2 > 0


def test_thermal_rates_finite(network):
    from rac2d_tpu.io import umist
    from rac2d_tpu.ops import thermal
    from rac2d_tpu.ops.rates import CellEnv, build_rate_tables, compute_rates

    tb = thermal.ThermalBalance(network)
    d2g = 2.8e-12
    env = CellEnv.default(Tgas=200.0, Tdust=80.0, n_gas=1e8,
                          G0_UV_toStar=1e4, zeta_Xray_H2=1e-17,
                          phflux_Lya=1e8, ratioDust2HnucNum=d2g,
                          ndust_tot=d2g * 1e8)
    tenv = thermal.ThermalEnv.default(
        n_dusts=jnp.array([d2g * 1e8, 0, 0, 0]),
        sig_dusts=jnp.array([np.pi * 1e-10, 0, 0, 0]),
        Tdusts=jnp.array([80.0, 0, 0, 0]))
    rng = np.random.default_rng(3)
    y = jnp.asarray(np.concatenate(
        [rng.uniform(1e-12, 1e-4, network.n_species), [200.0]]))
    tab = build_rate_tables(network)
    k = compute_rates(tab, env, env.Tgas)
    r = tb.rates(y, 200.0, env, tenv, k)
    for f in r._fields:
        assert np.isfinite(float(getattr(r, f))), f
    # all heating and cooling terms are non-negative
    for f in r._fields:
        if f != "cooling_gas_grain":   # can be negative (dust heats gas)
            assert float(getattr(r, f)) >= 0.0, f


def test_path_matrix_vertical_column():
    """ISM matrix of a simple grid: N_col equals the analytic overburden."""
    from rac2d_tpu.models.density import AndrewsDisk
    from rac2d_tpu.models.grid import GridConfig, make_grid
    from rac2d_tpu.ops import geometry

    a = AndrewsDisk(Md=0.01, rin=1.0, rout=50.0, rc=20.0, hc=5.0)
    g = make_grid(GridConfig(rmin=1.0, rmax=50.0, zmax=50.0, ncol=12), a)
    gi = geometry.build_grid_index(g)
    W_star, W_ism = columns.build_path_matrices(g, gi)
    from rac2d_tpu import constants as c
    N = np.asarray(W_ism.matvec(jnp.asarray(g.n0)))
    # pick a midplane cell; compare with direct sum over the column above
    icol = 6
    members = g.col_cells[g.col_ptr[icol]:g.col_ptr[icol + 1]]
    members = members[g.using[members]]
    bott = members[np.argmin(g.zmin[members])]
    # the ray starts at the corner closest to the target (top of the
    # cell), so the bottom cell's own thickness contributes ~nothing
    # (reference fromCellCenter=.false. semantics, disk.f90:2577-2616)
    above = members[g.zmin[members] >= g.zmax[bott] - 1e-9]
    expect = ((g.zmax[above] - g.zmin[above]) * g.n0[above]).sum() * c.AU2cm
    assert N[bott] == pytest.approx(expect, rel=0.15)
