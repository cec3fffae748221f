"""Thermal balance, table accessors, and column/shielding tests."""

import jax

import rac2d_tpu.constants as c
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


def test_thermal_tandem_and_dynamic_alpha(network):
    """Gas-dust tandem exchange + ambipolar alpha modes stay finite and
    move in the physical direction (hot gas warms dust -> smaller Tg-Td
    gap -> less gas-grain cooling than the frozen-Tdust value)."""
    from rac2d_tpu.ops import thermal
    from rac2d_tpu.ops.rates import CellEnv, build_rate_tables, compute_rates

    # synthetic monotone Tdust(energy) LUT: val ~ T^4 (gray body)
    Tds = np.linspace(1.0, 2000.0, 256)
    vals = (5.67e-5 / np.pi) * Tds ** 4
    lut = (Tds, vals[None, :])
    cfg = thermal.HcConfig(allow_gas_dust_en_exch=True,
                           tdust_iter_tandem=True,
                           use_fixed_alpha_visc=False)
    tb = thermal.ThermalBalance(network, config=cfg, tdust_lut=lut)
    tb0 = thermal.ThermalBalance(network)
    d2g = 2.8e-12
    n_gas = 1e10
    env = CellEnv.default(Tgas=300.0, Tdust=50.0, n_gas=n_gas,
                          ratioDust2HnucNum=d2g, ndust_tot=d2g * n_gas)
    kw = dict(
        n_dusts=jnp.array([d2g * n_gas, 0, 0, 0]),
        sig_dusts=jnp.array([np.pi * 1e-10, 0, 0, 0]),
        Tdusts=jnp.array([50.0, 0, 0, 0]),
        en_gains=jnp.array([1e-8, jnp.inf, jnp.inf, jnp.inf]),
        mdusts_cell=jnp.array([1e10, 0, 0, 0]),
        volume=1e40 / c.AU2cm ** 3, omega_Kepler=1e-8, alpha_viscosity=0.01)
    tenv = thermal.ThermalEnv.default(**kw)
    rng = np.random.default_rng(3)
    y = jnp.asarray(np.concatenate(
        [rng.uniform(1e-12, 1e-4, network.n_species), [300.0]]))
    tab = build_rate_tables(network)
    k = compute_rates(tab, env, env.Tgas)
    r = tb.rates(y, 300.0, env, tenv, k)
    r0 = tb0.rates(y, 300.0, env, tenv, k)
    for f in r._fields:
        assert np.isfinite(float(getattr(r, f))), f
    # dust thermalizes toward the gas -> the residual exchange is far
    # below the frozen-Tdust cooling, bounded below by the energy floor
    floor = -0.8 * 1e-8 / 1e40
    assert floor * 1.01 <= float(r.cooling_gas_grain) \
        < 0.01 * float(r0.cooling_gas_grain)
    # dynamic alpha with ions present is below base-alpha heating
    assert 0.0 <= float(r.heating_viscosity) <= float(r0.heating_viscosity)


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


def test_fill_blank_conserves_energy():
    """fill_blank redistributes energy of poorly-sampled channels without
    changing the window integral (reference disk.f90:1444-1479)."""
    from rac2d_tpu.ops.fields import fill_blank
    rng = np.random.default_rng(0)
    nlam = 60
    lam = np.linspace(1.0, 2.0, nlam)
    flux = rng.uniform(0.5, 1.5, (2, nlam))
    phc = np.full((2, nlam), 10)
    phc[0, 20:25] = 0            # a poorly-sampled gap in cell 0
    out = fill_blank(lam, flux, phc, nth=3)
    # cell 1 untouched
    assert np.array_equal(out[1], flux[1])
    # total energy conserved to roundoff in cell 0
    assert abs(out[0].sum() - flux[0].sum()) < 1e-10 * flux[0].sum()
    # the gap is no longer empty relative to neighbors
    assert out[0, 20:25].min() > 0


def test_xray_zeta_ncol_mode():
    """Ncol-attenuation zeta_X mode (reference disk.f90:1994-2001):
    matches the unattenuated 1/4pi d^2 estimate at Ncol=0 and decays
    monotonically with column."""
    import jax.numpy as jnp
    import rac2d_tpu.constants as c
    from rac2d_tpu.ops import columns

    lam = jnp.asarray(np.linspace(1.0, 13.0, 50))      # X-ray band, A
    vals = jnp.asarray(np.full(50, 1e28))              # erg/s/A
    is_xray = jnp.ones(50, bool)
    n = 4
    depl = jnp.ones(n)
    d2h = jnp.full(n, 2.8e-12)
    ga = jnp.full(n, 1e-5)
    Ncols = jnp.asarray([0.0, 1e22, 1e24, 1e26])
    r = jnp.full(n, 10.0)
    z = jnp.zeros(n)
    zeta = np.asarray(columns.xray_ionization_rate_ncol(
        lam, vals, is_xray, depl, d2h, ga, Ncols, r, z))
    assert (zeta > 0).all()
    assert (np.diff(zeta) < 0).all()          # more column -> less zeta
    # Ncol=0 case cross-check against a direct quadrature
    from rac2d_tpu.io import bethell
    E = np.asarray(c.hPlanck_CGS * c.SpeedOfLight_CGS
                   / (np.asarray(lam) * 1e-8) / c.keV2erg)
    sraw = np.asarray(bethell.sigma_dust_raw(jnp.asarray(E), jnp))
    f = np.asarray(bethell.dust_blanketing(
        jnp.asarray(sraw), jnp.full(50, 2.8e-12), jnp.full(50, 1e-5),
        jnp))
    sig = np.asarray(bethell.sigma_gas(jnp.asarray(E), jnp)) + f * sraw
    dlam = np.append(np.diff(np.asarray(lam)),
                     np.diff(np.asarray(lam))[-1])
    flux = 1e28 * dlam / (4 * np.pi * (10.0 * c.AU2cm) ** 2)
    z0 = (flux / (E * c.keV2erg) * sig * (E * 1e3 / 37.0)).sum()
    assert zeta[0] == pytest.approx(z0, rel=1e-10)


def test_ion_cooling_lut_matches_reference_spline():
    """VERDICT round-1 item 9: the on-device lookup must agree with the
    reference's 2D cubic spline (interpolation.f90:25) to <5%; the raw
    bilinear table was off by up to 21% on Fe+."""
    import jax.numpy as jnp
    from scipy.interpolate import RectBivariateSpline
    from rac2d_tpu import defaults
    from rac2d_tpu.io import tables

    for ion in ("N+", "Si+", "Fe+"):
        lut = tables.IonCoolingLUT(str(defaults.DATA / f"{ion}_LUT.bin"))
        raw = np.fromfile(str(defaults.DATA / f"{ion}_LUT.bin"),
                          dtype="<f8")
        ndim = int(raw[0]); dims = raw[1:1 + ndim].astype(int)
        nx, ny = int(dims[0]), int(dims[1]); o = 1 + ndim
        x = raw[o:o + nx]; y = raw[o + nx:o + nx + ny]
        v = raw[o + nx + ny:o + nx + ny + nx * ny].reshape((ny, nx)).T
        sp = RectBivariateSpline(x, y, v, kx=3, ky=3)
        xs = np.linspace(x[0], x[-1], 120)
        ys = np.linspace(y[0], y[-1], 120)
        Xs, Ys = np.meshgrid(xs, ys, indexing="ij")
        ours = np.asarray(lut.cooling_per_ion(
            jnp.asarray(10.0 ** Xs.ravel()),
            jnp.asarray(10.0 ** Ys.ravel()))).reshape(120, 120)
        ref = 10.0 ** sp(xs, ys)
        rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-300)
        assert rel.max() < 0.02, (ion, rel.max())


def test_neufeld_h2_rot_boltzmann_suppression():
    """The H2 rotational L0/L_LTE carry exp(-509/T) on top of the
    tabulated log10 values (reference load_Neufeld_cooling_H2.f90:
    101,112: exp(-log10_L*ln10 - 509/T)).  Round 4 found this factor
    missing — H2 cooling was overestimated by e^(509/T), freezing cold
    gas to T -> 0 in the coupled solve.  Expected values recomputed
    here from the stored table by the reference's own formula."""
    import numpy as np
    from rac2d_tpu.io import tables

    h2 = tables.NeufeldH2()
    for T in (6.0, 30.0, 100.0, 500.0, 2000.0):
        lt = np.log10(T)
        exp_L0 = 10.0 ** (-np.interp(lt, h2.logT, h2.L0)) \
            * np.exp(-509.0 / T)
        exp_LTE = 10.0 ** (-np.interp(lt, h2.logT, h2.L_LTE)) \
            * np.exp(-509.0 / T)
        p = h2.params(T)
        assert np.allclose(float(p.L0), exp_L0, rtol=1e-6), T
        assert np.allclose(float(p.L_LTE), exp_LTE, rtol=1e-6), T
    # the factor must actually bite at low T
    p6 = h2.params(6.0)
    p600 = h2.params(600.0)
    assert float(p6.L0) < 1e-30 * float(p600.L0)
