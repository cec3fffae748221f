"""MC dust-temperature parity vs the analytic optically-thin solution.

For gray dust in the optically thin limit, radiative equilibrium gives
Td(d) = T* sqrt(R*/(2 d)) independent of the opacity value — the expected
values come from Stefan-Boltzmann algebra, not from the code under test.
This pins the whole MC chain end-to-end: packet ladder normalization,
cone-emission energy scaling (driver convention, models/driver.py
run_mc), transport, continuous absorption estimator, and the
energy->Tdust LUT inversion.

Reference behavior replicated: src/montecarlo.f90:398-852 (walk +
dust_reemit/get_Tdust_from_LUT) with the Lucy-style per-pass temperature
update replacing immediate reemission.
"""

import numpy as np
import jax
import jax.numpy as jnp

import rac2d_tpu.constants as c
from rac2d_tpu.io.draine import DustMixture
from rac2d_tpu.models import star as starmod
from rac2d_tpu.ops import geometry, mcrt, optics


def _gray_mixture(kab=10.0):
    lam = np.logspace(2.5, 7.5, 400)   # 0.03 um .. 316 um
    n = len(lam)
    return DustMixture(lam=lam, kab=np.full(n, kab), ksc=np.zeros(n),
                       g=np.zeros(n), pmass=1e-14, rav=0.1, r2av=0.01,
                       r3av=1e-3, rho_material=3.0)


def _shell_grid(r_edges_AU, z_edges_AU):
    """Columns x z-layers grid index + per-cell bounds arrays."""
    nr = len(r_edges_AU) - 1
    nz = len(z_edges_AU) - 1
    rmin, rmax, zmin, zmax = [], [], [], []
    cell_of = np.zeros((nr, nz), dtype=np.int32)
    for i in range(nr):
        for j in range(nz):
            cell_of[i, j] = len(rmin)
            rmin.append(r_edges_AU[i])
            rmax.append(r_edges_AU[i + 1])
            zmin.append(z_edges_AU[j])
            zmax.append(z_edges_AU[j + 1])
    gi = geometry.GridIndex(
        r_edges=jnp.asarray(np.asarray(r_edges_AU) ** 1),
        z_edges=jnp.asarray(np.tile(z_edges_AU, (nr, 1))),
        cell_of=jnp.asarray(cell_of),
        n_z=jnp.full(nr, nz, jnp.int32),
        zmax_dom=float(z_edges_AU[-1]), rmin_dom=float(r_edges_AU[0]),
        rmax_dom=float(r_edges_AU[-1]))
    return gi, map(np.asarray, (rmin, rmax, zmin, zmax))


def _inv_d2_eff(r1, r2, z1, z2, maxw, n=400):
    """Volume-weighted <1/d^2 * [w < maxw]> over an annular cell plus the
    in-cone mass fraction, by quadrature.  Points above the emission cone
    (z/d > maxw) receive no direct starlight."""
    r = np.linspace(r1, r2, n)
    z = np.linspace(z1, z2, n)
    rr, zz = np.meshgrid(0.5 * (r[1:] + r[:-1]), 0.5 * (z[1:] + z[:-1]))
    w = np.outer(np.diff(z), np.diff(r) * 0.5 * (r[1:] + r[:-1]))
    d2 = rr ** 2 + zz ** 2
    incone = zz / np.sqrt(d2) < maxw
    return (float((w * incone / d2).sum() / w.sum()),
            float((w * incone).sum() / w.sum()))


def test_tdust_matches_analytic_optically_thin():
    mix = _gray_mixture()
    cfg = optics.McConfig(nlen_lut=256)
    tab = optics.build_tables([mix], cfg)

    r_edges = np.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0])
    z_edges = np.array([0.0, 8.0, 32.0])
    gi, (rmin, rmax, zmin, zmax) = _shell_grid(r_edges, z_edges)
    n = len(rmin)

    # tiny uniform dust density: max optical depth ~ kab*rho*31AU << 1
    rho = 1e-4 / (10.0 * 31.0 * c.AU2cm)
    vol = (np.pi * (rmax ** 2 - rmin ** 2) * (zmax - zmin)
           * c.AU2cm ** 3)
    cells = mcrt.McCells(
        rmin=jnp.asarray(rmin), rmax=jnp.asarray(rmax),
        zmin=jnp.asarray(zmin), zmax=jnp.asarray(zmax),
        using=jnp.ones(n, bool), n_gas=jnp.zeros(n), n_HI=jnp.zeros(n),
        n_H2O=jnp.zeros(n), Tgas=jnp.full(n, 100.0),
        rho_dust=jnp.full((1, n), rho),
        dust_depletion=jnp.ones(n), d2h=jnp.full(n, 1e-12),
        grain_a=jnp.full(n, 1e-5),
        Tdust=jnp.full((1, n), 20.0),
        mdust_cell=jnp.asarray((rho * vol)[None, :]),
        abso_wei=jnp.ones((1, n)))
    model = mcrt.McModel(tab=tab, gi=gi, cells=cells, star_mass=1.0)

    star = starmod.blackbody_star(4000.0, 1.0, mass=1.0)
    maxw = 0.95
    lam_pk, en_pk = starmod.packet_ladder(star, 40_000, 1.0, 1.0, 1.0)
    # driver emission-cone scaling (models/driver.py run_mc): upper-cone
    # launch carries maxw/2 of L (reference both-cone convention
    # montecarlo.f90:94 with minw=-maxw)
    en_pk = en_pk * (maxw / 2.0)
    en_scale = float(np.max(en_pk))
    en_norm = np.asarray(en_pk) / en_scale

    key = jax.random.PRNGKey(3)
    pk = mcrt.launch_packets(model, key, jnp.asarray(lam_pk),
                             jnp.asarray(en_norm), 0.0, maxw)
    tall = mcrt.McTallies.zeros(n, len(tab.lam), 1, 5)
    pk, tall = mcrt.mc_pass(model, key, pk, tall, use_mrw=False)
    tall = tall._replace(en_gain=tall.en_gain.astype(jnp.float64)
                         * en_scale)
    Td_mc = np.asarray(mcrt.update_tdust(tab, cells, tall))[0]

    # analytic gray-dust equilibrium at the cell's effective distance
    Rsun_AU = c.Rsun_CGS / c.AU2cm
    Td_ana = np.zeros(n)
    frac_in = np.zeros(n)
    for i in range(n):
        inv_d2, frac_in[i] = _inv_d2_eff(rmin[i], rmax[i], zmin[i],
                                         zmax[i], maxw)
        Td_ana[i] = 4000.0 * np.sqrt(
            Rsun_AU * np.sqrt(max(inv_d2, 1e-300)) / 2.0)

    rel = np.abs(Td_mc - Td_ana) / np.maximum(Td_ana, 1e-300)
    # fully-lit cells: tight agreement; cone-straddling cells: loose
    # (nonuniform illumination vs the mean-energy prediction); fully
    # shadowed cells must get (almost) no energy
    lit = frac_in > 0.9
    part = (frac_in > 0.1) & ~lit
    dark = frac_in <= 0.1
    assert lit.sum() >= 5
    assert rel[lit].max() < 0.05, list(zip(Td_mc[lit], Td_ana[lit]))
    if part.any():
        assert rel[part].max() < 0.20, list(zip(Td_mc[part], Td_ana[part]))
    if dark.any():
        # shadowed cells see only secondary (reemitted/scattered) light,
        # a ~tau fraction of the direct field plus rim leakage
        gain = np.asarray(tall.en_gain)[0]
        assert (gain[dark] < 0.1 * gain[lit].min()).all()
