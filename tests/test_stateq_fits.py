"""NLTE statistical equilibrium + FITS writer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rac2d_tpu import defaults
from rac2d_tpu.io import fits as fitsio
from rac2d_tpu.io import lamda
from rac2d_tpu.ops import stateq


@pytest.fixture(scope="module")
def co():
    mol = lamda.load_lamda(defaults.CO_LAMDA)
    return mol, stateq.build_mol_tables(mol)


def _env(mol, nH2, Tkin=30.0):
    nr = len(mol.Aul)
    np_part = len(mol.partners)
    return stateq.CellExcEnv(
        Tkin=jnp.asarray(Tkin), dv=jnp.asarray(3e4),
        length_scale=jnp.asarray(1e15),
        density_mol=jnp.asarray(1e-1),
        dens_partner=jnp.full(np_part, nH2),
        cont_alpha=jnp.zeros(nr), cont_J=jnp.zeros(nr))


def test_lamda_parse(co):
    mol, tab = co
    assert mol.n_level == 41
    assert len(mol.Aul) == 40
    # CO J=1-0 at 115.27 GHz
    assert mol.freq[0] == pytest.approx(115.27e9, rel=1e-3)
    # Einstein relation g_u B_ul = g_l B_lu
    np.testing.assert_allclose(mol.Bul * mol.g[mol.iup],
                               mol.Blu * mol.g[mol.ilow], rtol=1e-12)


def test_lte_limit(co):
    mol, tab = co
    f, err = stateq.solve_stateq(tab, _env(mol, 1e12))
    fb = stateq.boltzmann(tab, 30.0)
    assert float(jnp.abs(f - fb).max()) < 1e-6


def test_subthermal(co):
    mol, tab = co
    f, err = stateq.solve_stateq(tab, _env(mol, 1e2))
    fb = stateq.boltzmann(tab, 30.0)
    # J=3 level underpopulated relative to LTE at low density
    assert float(f[3]) < float(fb[3])
    assert abs(float(f.sum()) - 1.0) < 1e-10


def test_cooling_positive(co):
    mol, tab = co
    env = _env(mol, 1e4)
    f, _ = stateq.solve_stateq(tab, env)
    assert float(stateq.cooling_rate(tab, env, f)) > 0


def test_fits_roundtrip(tmp_path):
    cube = np.random.default_rng(0).normal(size=(8, 7, 5))
    freqs = 1e11 + np.arange(5) * 1e6
    path = tmp_path / "cube.fits"
    fitsio.write_cube_fits(str(path), cube, freqs=freqs,
                           tau_map=cube[:, :, 0],
                           header={"LINE": "CO 2-1"})
    data, hdr = fitsio.read_fits_image(str(path))
    assert data.shape == (5, 7, 8)
    np.testing.assert_allclose(np.transpose(data, (2, 1, 0)), cube)
    assert int(hdr["NAXIS"]) == 3
    # file is block-aligned
    assert path.stat().st_size % 2880 == 0
