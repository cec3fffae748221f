"""Grid construction, AMR adapt, depletion, RADMC input, vertical balance."""

import numpy as np
import pytest

from rac2d_tpu import defaults
from rac2d_tpu.models.density import AndrewsDisk, hayashi_density
from rac2d_tpu.models.grid import GridConfig, make_grid
from rac2d_tpu.models import amr, depletion


@pytest.fixture(scope="module")
def small_grid():
    a = AndrewsDisk(Md=0.01, rin=1.0, rout=50.0, rc=20.0, hc=5.0)
    return make_grid(GridConfig(rmin=1.0, rmax=50.0, zmax=50.0, ncol=12), a), a


def test_grid_invariants(small_grid):
    g, a = small_grid
    assert (g.rmax > g.rmin).all()
    assert (g.zmax > g.zmin).all()
    # columns tile each radial annulus exactly
    for icol in range(g.n_columns):
        m = g.col_cells[g.col_ptr[icol]:g.col_ptr[icol + 1]]
        order = np.argsort(g.zmin[m])
        zs = g.zmin[m][order]
        ze = g.zmax[m][order]
        np.testing.assert_allclose(zs[1:], ze[:-1], rtol=1e-12)


def test_density_positive(small_grid):
    g, a = small_grid
    assert (g.n0 >= 0).all()
    assert a.density(10.0, 0.0) > a.density(10.0, 10.0)
    assert hayashi_density(1.0, 0.0) > 0


def test_amr_refine_roundtrip(small_grid):
    g, a = small_grid
    X = np.ones((4, g.n_cells))
    # force an abundance jump in one cell
    i0 = int(np.nonzero(g.using)[0][5])
    X[0, i0] = 1e3
    mask = amr.need_refine(g, X, np.array([0]), thresh=10.0)
    assert mask.any()
    new, parent = amr.adapt_grid(g, mask)
    assert new.n_cells == g.n_cells + mask.sum()
    (X2,) = amr.remap_state(parent, X)
    assert X2.shape[1] == new.n_cells
    # children inherit the parent abundance
    kids = np.nonzero(parent == i0)[0]
    assert len(kids) == 2
    assert (X2[0, kids] == 1e3).all()
    # merging those kids back shrinks the grid
    pairs = [(int(kids[0]), int(kids[1]))]
    new2, parent2 = amr.adapt_grid(new, np.zeros(new.n_cells, bool), pairs)
    assert new2.n_cells == new.n_cells - 1


def test_depletion_uniform(small_grid, network):
    g, a = small_grid
    from rac2d_tpu.io import umist
    y0 = umist.load_initial_abundances(network, defaults.INIT_ABUNDANCES)
    X = np.tile(y0[:, None], (1, g.n_cells))
    cfg = depletion.DepletionConfig(method="uniform", f_depl_O=0.1,
                                    f_depl_C=0.5)
    Tg = np.full(g.n_cells, 20.0)
    X_O_before = X[network.idx["O"]].copy() + X[network.idx["CO"]] \
        + X[network.idx["H2O"]] + X[network.idx["gH2O"]]
    depletion.apply_depletion(network, X, g, g.n0, Tg, cfg)
    X_O_after = X[network.idx["O"]] + X[network.idx["CO"]] \
        + X[network.idx["H2O"]] + X[network.idx["gH2O"]]
    assert (X_O_after < X_O_before).all()


def test_radmc_loader():
    from rac2d_tpu.io.radmc import RadmcData
    d = RadmcData.load(str(defaults.DATA / "radmc_example.dat"))
    assert d.n.shape == (150, 50)
    assert float(d.density(10.0, 0.0)) > 0
    assert float(d.density(1e4, 0.0)) == 0.0


def test_vertical_balance(small_grid):
    g, a = small_grid
    from rac2d_tpu.ops import vertical
    T = np.full(g.n_cells, 30.0)
    rho_d = (g.n0 * 1.4 * 1.67e-24 * 0.01)[None, :]
    m0 = vertical.disk_gas_mass(g, g.n0)
    n2, rd2, us2, mx, mn = vertical.pressure_gravity_balance(
        g, g.n0, T, rho_d, star_mass=0.6,
        disk_gas_mass_preset=m0)
    m1 = vertical.disk_gas_mass(
        g.__class__(**{**g.__dict__, "using": us2}), n2)
    # total mass preserved by the preset rescale
    assert m1 == pytest.approx(m0, rel=0.05)
    assert np.isfinite(n2).all()


def test_vertical_moving_grid(small_grid):
    """Moving-grid variant (reference vertical_structure.f90:354-518):
    iterating drives each cell's thermal pressure toward the weight of
    the column above it, columns stay contiguous, and per-column gas
    mass is conserved up to the top-cell stretch."""
    import rac2d_tpu.constants as c
    from rac2d_tpu.ops import vertical
    g, a = small_grid
    g = g.__class__(**{**g.__dict__})
    T = np.full(g.n_cells, 50.0)
    rho_d = (g.n0 * 1.4 * 1.67e-24 * 0.01)[None, :]
    ztop = float(g.zmax.max())
    col_mass0 = []
    for icol in range(g.n_columns):
        mem = g.col_cells[g.col_ptr[icol]:g.col_ptr[icol + 1]]
        col_mass0.append(((g.zmax[mem] - g.zmin[mem]) * g.n0[mem]).sum())
    n0, rho = g.n0.copy(), rho_d.copy()
    for _ in range(12):
        zmin_n, zmax_n, n0, rho, mx, mn = \
            vertical.pressure_gravity_balance_moving(
                g, n0, T, rho, star_mass=0.6, use_Tdust=False,
                zmax_dom=ztop)
        g.zmin, g.zmax = zmin_n, zmax_n
    # columns contiguous, all sharing the (possibly grown) domain top
    ztop_new = float(g.zmax.max())
    for icol in range(g.n_columns):
        mem = g.col_cells[g.col_ptr[icol]:g.col_ptr[icol + 1]]
        order = np.argsort(g.zmin[mem])
        mem = mem[order]
        np.testing.assert_allclose(g.zmax[mem][:-1], g.zmin[mem][1:],
                                   rtol=1e-10)
        assert g.zmax[mem][-1] == pytest.approx(ztop_new)
        m1 = ((g.zmax[mem] - g.zmin[mem]) * n0[mem]).sum()
        assert m1 == pytest.approx(col_mass0[icol], rel=1e-6)
    # near balance: P ~ weight of column above (within the damping)
    GM = c.GravitationConst_CGS * 0.6 * c.Msun_CGS
    mmw = 1.4 * c.mProton_CGS
    icol = g.n_columns // 2
    mem = g.col_cells[g.col_ptr[icol]:g.col_ptr[icol + 1]]
    mem = mem[np.argsort(g.zmin[mem])]
    if len(mem) >= 4 and g.using[mem].all():
        dz = (g.zmax[mem] - g.zmin[mem])
        zmid = 0.5 * (g.zmin[mem] + g.zmax[mem])
        rmid = 0.5 * (g.rmin[mem] + g.rmax[mem])
        gz = GM * zmid * c.AU2cm / ((rmid**2 + zmid**2)**1.5
                                    * c.AU2cm**3)
        w = n0[mem] * mmw * gz * dz * c.AU2cm
        W = np.cumsum(w[::-1])[::-1] - 0.5 * w
        P = n0[mem] * 50.0 * c.kBoltzmann_CGS
        mid = slice(1, len(mem) - 1)
        ratio = P[mid] / np.maximum(W[mid], 1e-300)
        assert (ratio > 0.2).all() and (ratio < 5.0).all(), ratio


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax-backed multi-host checkpoint path (single-host smoke)."""
    pytest.importorskip("orbax.checkpoint")
    from rac2d_tpu import checkpoint

    class FakeGrid:
        rmin = np.array([1.0]); rmax = np.array([2.0])
        zmin = np.array([0.0]); zmax = np.array([1.0])
        n0 = np.array([1e6])

    class FakeModel:
        grid = FakeGrid()
        X = np.random.default_rng(0).random((4, 1))
        Tgas = np.array([33.0]); Tdust = np.array([21.0])
        Tdusts = np.array([[21.0]]); quality = np.array([0])
        rho_dust = np.array([[1e-20]])

    m = FakeModel()
    p = tmp_path / "ck_orbax"
    checkpoint.save_state_orbax(p, m, iiter=3)
    m2 = FakeModel()
    m2.X = np.zeros_like(m.X)
    it = checkpoint.load_state_orbax(p, m2)
    assert it == 3
    np.testing.assert_allclose(m2.X, m.X)
    m2.grid = type("G", (), dict(FakeGrid.__dict__,
                                 rmax=np.array([2.5])))()
    with pytest.raises(ValueError):
        checkpoint.load_state_orbax(p, m2)


def test_load_watch_list(tmp_path, network):
    """Reference species_check_refine.dat format: 'name min_abun' rows
    (disk.f90:3908-3968); unknown species are skipped."""
    from rac2d_tpu.models import amr
    p = tmp_path / "watch.dat"
    p.write_text("H2          1.00E-6\n"
                 "! comment\n"
                 "H2O         1.00E-9\n"
                 "NOSUCHSPEC  1.0E-5\n"
                 "CO          1.00E-7\n")
    idx, mins = amr.load_watch_list(p, network)
    assert len(idx) == 3
    assert [network.species[i] for i in idx] == ["H2", "H2O", "CO"]
    assert mins.tolist() == [1e-6, 1e-9, 1e-7]
