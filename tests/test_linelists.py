"""HITRAN / CDMS line-list readers driven through excitation + cube
(VERDICT round-1 item 8: the readers existed but were never tested or
exercised end-to-end).

Reference behavior: src/hitran.f90:63-343 ``load_hitran_mol`` and
src/cdms.f90:21-340 ``load_cdms_mol`` — both produce LTE-only molecules
(no collision rates) consumed by the same excitation/cube machinery as
LAMDA molecules.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import rac2d_tpu.constants as c


def _hitran_record(wavnum, inten, A, Elow, gup, glo):
    """One synthetic 160-char HITRAN-2012 record matching the column
    layout the reader parses (Rothman et al. 2012 Table 1)."""
    s = [" "] * 160
    def put(lo, hi, text):
        t = text.rjust(hi - lo)
        s[lo:hi] = list(t[:hi - lo])
    put(0, 2, "5")                  # mol id
    put(2, 3, "1")                  # isotopologue
    put(3, 15, f"{wavnum:12.6f}")
    put(15, 25, f"{inten:10.3E}")
    put(25, 35, f"{A:10.4E}")
    put(45, 55, f"{Elow:10.4f}")
    put(67, 82, "X1/2".ljust(15))
    put(82, 97, "X1/2".ljust(15))
    put(97, 112, "  2".ljust(15))
    put(112, 127, "  1".ljust(15))
    put(146, 153, f"{gup:7.1f}")
    put(153, 160, f"{glo:7.1f}")
    return "".join(s)


@pytest.fixture()
def hitran_file(tmp_path):
    # two rotational-like lines of a fake diatomic: 2->1 and 3->2
    rows = [
        _hitran_record(3.845033, 1e-25, 7.2e-8, 0.0, 5.0, 3.0),
        _hitran_record(7.689919, 2e-25, 6.9e-7, 3.845033, 7.0, 5.0),
    ]
    p = tmp_path / "fake.par"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_hitran_reader(hitran_file):
    from rac2d_tpu.io import hitran
    mol = hitran.load_hitran(hitran_file)
    assert mol.n_level >= 3
    assert len(mol.Aul) == 2
    # frequency = c * wavnum
    np.testing.assert_allclose(
        sorted(mol.freq), sorted([3.845033 * c.SpeedOfLight_CGS,
                                  7.689919 * c.SpeedOfLight_CGS]),
        rtol=1e-4)   # freqs recomputed from merged level energies
    assert (mol.Aul > 0).all() and (mol.Bul > 0).all()
    # degeneracies carried through
    assert set(np.round(mol.g).astype(int)) >= {3, 5, 7}


def test_cdms_reader(ref_transitions):
    from rac2d_tpu.io import cdms
    mol = cdms.load_cdms(
        str(ref_transitions / "cdms_HD.dat"),
        partition_file=str(ref_transitions / "cdms_partition_functions.dat"))
    assert mol.n_level >= 2
    assert len(mol.Aul) >= 2
    # first catalog row: 2559396.8511 MHz
    assert np.isclose(mol.freq.min(), 2559396.8511e6, rtol=1e-6)
    assert (mol.Aul > 0).all()
    assert np.isfinite(mol.energy_K).all()


@pytest.mark.parametrize("database", ["hitran", "cdms"])
def test_linelist_lte_excitation_and_cube(database, hitran_file,
                                          ref_transitions):
    """LTE populations from the loaded molecule feed a (tiny) line cube —
    the same path models/imaging.py uses for non-LAMDA databases."""
    from rac2d_tpu.io import cdms, hitran
    from rac2d_tpu.ops import geometry, raytrace

    if database == "hitran":
        mol = hitran.load_hitran(hitran_file)
    else:
        mol = cdms.load_cdms(
            str(ref_transitions / "cdms_HD.dat"),
            partition_file=str(ref_transitions
                               / "cdms_partition_functions.dat"))
    itr = int(np.argmin(mol.freq))
    iu, il = int(mol.iup[itr]), int(mol.ilow[itr])
    T = 100.0
    boltz = mol.g * np.exp(-mol.energy_K / T)
    fpop = boltz / boltz.sum()

    f0 = float(mol.freq[itr])
    gi = geometry.GridIndex(
        r_edges=jnp.asarray([1.0, 3.0]),
        z_edges=jnp.asarray([[0.0, 1.0]]),
        cell_of=jnp.asarray([[0]], dtype=jnp.int32),
        n_z=jnp.asarray([1], jnp.int32),
        zmax_dom=1.0, rmin_dom=1.0, rmax_dom=3.0)
    nf = 15
    freqs = jnp.asarray(f0 * (1.0 + np.linspace(-3e-5, 3e-5, nf)))
    cells = raytrace.RtCells(
        rmin=jnp.asarray([1.0]), rmax=jnp.asarray([3.0]),
        zmin=jnp.asarray([0.0]), zmax=jnp.asarray([1.0]),
        using=jnp.ones(1, bool),
        Tdusts=jnp.zeros((1, 1)), rho_dust=jnp.zeros((1, 1)),
        n_mol=jnp.full(1, 1e2), f_up=jnp.full(1, float(fpop[iu])),
        f_low=jnp.full(1, float(fpop[il])), dv=jnp.full(1, 5e4))
    model = raytrace.RtModel(
        gi=gi, cells=cells, kext_dust=jnp.zeros((1, nf)),
        star_mass=0.6, f0=f0, Aul=float(mol.Aul[itr]),
        Bul=float(mol.Bul[itr]), Blu=float(mol.Blu[itr]))
    xs = np.linspace(-3, 3, 9)
    I, tau, Nu, Nl = raytrace.make_cube(model, 30.0, xs, xs, freqs,
                                        is_line=True)
    assert np.isfinite(I).all()
    assert I.max() > 0.0
