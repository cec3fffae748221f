"""Column densities, self-shielding factors, X-ray ionization.

Rebuild of the reference per-cell ray walks (reference:
src/disk.f90:2526-2729 ``calc_Ncol_from_cell_to_point`` /
``calc_Ncol_to_ISM`` / ``calc_Ncol_to_Star``, :1823-1897
``update_params_above_alt`` and ``get_H2_self_shielding``, :1969-2010
``calc_Xray_ionization_rate``).

TPU inversion: the reference re-walks a ray through the pointer tree for
every cell and every species each iteration.  Here the geometry is static
between grid rebuilds, so we precompute, host-side, a sparse path matrix
W[i, j] = path length (cm) of cell i's ray through cell j, for the
star-directed and ISM-directed (vertical) rays.  Every column density is
then a sparse mat-vec N = W @ (n_gas * X), evaluated as one segment-sum —
the whole disk at once, for any number of species.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as c
from ..io.tables import VisserCOShielding


class PathMatrix(NamedTuple):
    """COO sparse [n_cells x n_cells] path-length matrix (cm)."""
    rows: jnp.ndarray     # [nnz] target cell
    cols: jnp.ndarray     # [nnz] crossed cell
    w: jnp.ndarray        # [nnz] path length in cm
    n_cells: int

    def matvec(self, v):
        """(W @ v) for per-cell values v."""
        vals = self.w * v[self.cols]
        return jax.ops.segment_sum(vals, self.rows,
                                   num_segments=self.n_cells,
                                   indices_are_sorted=True)


def _trace_ray(grid, gi_host, i, tx, tz):
    """Host-side: march from (near) cell i toward point (tx, tz), returning
    (cells crossed, lengths in AU).  Mirrors the reference's corner-start
    rule (disk.f90:2577-2616: start from the cell corner closest to the
    target)."""
    x0, x1 = grid.rmin[i], grid.rmax[i]
    y0, y1 = grid.zmin[i], grid.zmax[i]
    dx, dy = x1 - x0, y1 - y0
    sf = 1e-6
    corners = [(x0 + dx * sf, y0 + dy * sf), (x0 + dx * sf, y1 - dy * sf),
               (x1 - dx * sf, y0 + dy * sf), (x1 - dx * sf, y1 - dy * sf),
               (0.5 * (x0 + x1), 0.5 * (y0 + y1))]
    d2 = [(tx - cx) ** 2 + (tz - cz) ** 2 for cx, cz in corners]
    cx, cz = corners[int(np.argmin(d2))]
    vx = tx - cx
    vz = tz - cz
    t = np.hypot(vx, vz)
    if t < 1e-50:
        return [], []
    vx /= t
    vz /= t
    # march through cells; geometry in the (r, z) half-plane with y=0 so
    # cylinders reduce to vertical lines only when vx aligns radially —
    # use the full 3D formulas with y=0 for exactness
    x, y, z = cx, 0.0, cz
    cells, lens = [], []
    cur = i
    r_edges = np.asarray(gi_host.r_edges)
    for _ in range(4 * grid.n_columns + len(grid.rmin)):
        if cur < 0:
            break
        rm, rM = grid.rmin[cur], grid.rmax[cur]
        zm, zM = grid.zmin[cur], grid.zmax[cur]
        L = _exit_len(x, y, z, vx, 0.0, vz, rm, rM, zm, zM)
        if L is None:
            break
        cells.append(cur)
        lens.append(L)
        eps = min(rM - rm, zM - zm) * 1e-6
        x += vx * (L + eps)
        z += vz * (L + eps)
        r = np.hypot(x, y)
        cur = _locate_host(grid, gi_host, r, abs(z))
    return cells, lens


def _exit_len(x, y, z, vx, vy, vz, rmin, rmax, zmin, zmax):
    cands = []
    if abs(vz) > 1e-20:
        for zb in (zmin, zmax):
            L = (zb - z) / vz
            if L > 1e-30:
                rr = np.hypot(x + vx * L, y + vy * L)
                if rmin <= rr <= rmax:
                    cands.append(L)
    A = vx * vx + vy * vy
    if A > 1e-40:
        B = 2 * (x * vx + y * vy)
        for rb in (rmin, rmax):
            C = x * x + y * y - rb * rb
            D = B * B - 4 * A * C
            if D > 0:
                for L in ((-B + np.sqrt(D)) / (2 * A),
                          (-B - np.sqrt(D)) / (2 * A)):
                    if L > 1e-30:
                        zz = z + vz * L
                        if zmin <= zz <= zmax:
                            cands.append(L)
    return min(cands) if cands else None


def _locate_host(grid, gi_host, r, z_abs):
    r_edges = np.asarray(gi_host.r_edges)
    if r < r_edges[0] or r > r_edges[-1]:
        return -1
    ic = min(np.searchsorted(r_edges, r, side="right") - 1,
             len(r_edges) - 2)
    ic = max(ic, 0)
    zrow = np.asarray(gi_host.z_edges[ic])
    iz = int((zrow <= z_abs).sum()) - 1
    if iz < 0 or iz >= gi_host.cell_of.shape[1]:
        return -1
    cell = int(gi_host.cell_of[ic, iz])
    if cell < 0 or z_abs > zrow[iz + 1]:
        return -1
    return cell


def build_path_matrices(grid, gi_host, use_native=True):
    """Star-directed and ISM-directed (vertical, upward) path matrices."""
    if use_native:
        from ..io import native
        out_s = native.trace_path_matrix(grid, gi_host, to_ism=False)
        out_i = native.trace_path_matrix(grid, gi_host, to_ism=True)
        if out_s is not None and out_i is not None:
            def mk2(rows, cols, w):
                order = np.argsort(rows, kind="stable")
                return PathMatrix(
                    rows=jnp.asarray(rows[order]),
                    cols=jnp.asarray(cols[order]),
                    w=jnp.asarray(w[order] * c.AU2cm),
                    n_cells=grid.n_cells)

            return mk2(*out_s), mk2(*out_i)

    zfar = grid.zmax.max() * 2.0
    rows_s, cols_s, w_s = [], [], []
    rows_i, cols_i, w_i = [], [], []
    for i in range(grid.n_cells):
        if not grid.using[i]:
            continue
        cells, lens = _trace_ray(grid, gi_host, i, 0.0, 0.0)
        for cc, ll in zip(cells, lens):
            if grid.using[cc]:
                rows_s.append(i)
                cols_s.append(cc)
                w_s.append(ll * c.AU2cm)
        xm = 0.5 * (grid.rmin[i] + grid.rmax[i])
        cells, lens = _trace_ray(grid, gi_host, i, xm, zfar)
        for cc, ll in zip(cells, lens):
            if grid.using[cc]:
                rows_i.append(i)
                cols_i.append(cc)
                w_i.append(ll * c.AU2cm)

    def mk(rows, cols, w):
        order = np.argsort(np.asarray(rows), kind="stable")
        return PathMatrix(
            rows=jnp.asarray(np.asarray(rows)[order]),
            cols=jnp.asarray(np.asarray(cols)[order]),
            w=jnp.asarray(np.asarray(w)[order]),
            n_cells=grid.n_cells)

    return mk(rows_s, cols_s, w_s), mk(rows_i, cols_i, w_i)


def h2_self_shielding(N_H2, dv_turb):
    """Draine & Bertoldi 1996 eq 37 (reference disk.f90:1887-1897)."""
    x = N_H2 / 5e14
    b5 = dv_turb / 1e5
    t = jnp.sqrt(1.0 + x)
    return jnp.minimum(1.0, 0.965 / (1.0 + x / b5) ** 2
                       + 0.035 / t * jnp.exp(-8.5e-4 * t))


class ShieldingFactors(NamedTuple):
    """[5, n_cells] self-shielding arrays ordered (none,H2,CO,H2O,OH) for
    direct use as CellEnv.f_selfshielding_*."""
    toISM: jnp.ndarray
    toStar: jnp.ndarray
    Ncol_toISM: jnp.ndarray
    Ncol_toStar: jnp.ndarray
    colden_toISM: dict
    colden_toStar: dict


def compute_shielding(W_star: PathMatrix, W_ism: PathMatrix, n_gas, X,
                      idx: dict, dv_turb, visser: VisserCOShielding):
    """All shielding factors for all cells at once.

    X: [n_species, n_cells] abundances (or a dict-like gather per species);
    idx: species name -> row index.
    """
    def col(W, name):
        return W.matvec(n_gas * X[idx[name]])

    N_H2_s = col(W_star, "H2")
    N_H2_i = col(W_ism, "H2")
    N_CO_s = col(W_star, "CO")
    N_CO_i = col(W_ism, "CO")
    N_H2O_s = col(W_star, "H2O")
    N_H2O_i = col(W_ism, "H2O")
    N_OH_s = col(W_star, "OH")
    N_OH_i = col(W_ism, "OH")
    Ntot_s = W_star.matvec(n_gas)
    Ntot_i = W_ism.matvec(n_gas)

    ones = jnp.ones_like(Ntot_s)
    sh_co = jax.vmap(visser.shielding)
    toStar = jnp.stack([
        ones,
        h2_self_shielding(N_H2_s, dv_turb),
        jnp.clip(sh_co(N_H2_s, N_CO_s), 0.0, 1.0),
        jnp.minimum(1.0, jnp.exp(-N_H2O_s * c.LyAlpha_cross_H2O)),
        jnp.minimum(1.0, jnp.exp(-N_OH_s * c.LyAlpha_cross_OH))])
    toISM = jnp.stack([
        ones,
        h2_self_shielding(N_H2_i, dv_turb),
        jnp.clip(sh_co(N_H2_i, N_CO_i), 0.0, 1.0),
        jnp.minimum(1.0, jnp.exp(-N_H2O_i * c.LyAlpha_cross_H2O)),
        jnp.minimum(1.0, jnp.exp(-N_OH_i * c.LyAlpha_cross_OH))])
    return ShieldingFactors(
        toISM=toISM, toStar=toStar, Ncol_toISM=Ntot_i, Ncol_toStar=Ntot_s,
        colden_toISM={"H2": N_H2_i, "CO": N_CO_i, "H2O": N_H2O_i,
                      "OH": N_OH_i},
        colden_toStar={"H2": N_H2_s, "CO": N_CO_s, "H2O": N_H2O_s,
                       "OH": N_OH_s})


def xray_ionization_rate(lam_A, flux_cell_lam, is_xray, dust_depletion,
                         d2h, grain_a):
    """zeta_X per H [s^-1] from the local MC flux (reference
    disk.f90:1969-2010; 37 eV per ion pair)."""
    from ..io import bethell
    E = c.hPlanck_CGS * c.SpeedOfLight_CGS / (lam_A * 1e-8) / c.keV2erg
    # per-cell sigma with blanketing
    sraw = bethell.sigma_dust_raw(E, jnp)[None, :] * dust_depletion[:, None]
    f = bethell.dust_blanketing(sraw, d2h[:, None], grain_a[:, None], jnp)
    sig = bethell.sigma_gas(E, jnp)[None, :] + f * sraw
    en_erg = E * c.keV2erg
    contrib = flux_cell_lam / en_erg[None, :] * sig \
        * (E[None, :] * 1e3 / 37.0)
    return jnp.sum(jnp.where(is_xray[None, :], contrib, 0.0), axis=1)


def xray_ionization_rate_ncol(lam_A, star_vals, is_xray, dust_depletion,
                              d2h, grain_a, Ncol_toStar, r_AU, z_AU):
    """zeta_X per H [s^-1] from direct Ncol attenuation of the stellar
    X-ray spectrum (the calc_zetaXray_from_Ncol mode of reference
    disk.f90:1969-2010): flux = L_lam dlam exp(-sigma Ncol)/(4 pi d^2)
    instead of the MC-tallied local flux.  Use when the MC pass carries
    too few X-ray packets for a converged per-cell tally.

    lam_A/star_vals: the stellar spectrum on the master grid
    [nlam] (erg/s/A); per-cell arrays dust_depletion, d2h, grain_a,
    Ncol_toStar, r_AU, z_AU.
    """
    from ..io import bethell
    E = c.hPlanck_CGS * c.SpeedOfLight_CGS / (lam_A * 1e-8) / c.keV2erg
    sraw = bethell.sigma_dust_raw(E, jnp)[None, :] * dust_depletion[:, None]
    f = bethell.dust_blanketing(sraw, d2h[:, None], grain_a[:, None], jnp)
    sig = bethell.sigma_gas(E, jnp)[None, :] + f * sraw
    dlam = jnp.concatenate([jnp.diff(lam_A), jnp.diff(lam_A)[-1:]])
    d2 = (r_AU ** 2 + z_AU ** 2) * c.AU2cm ** 2
    flux = star_vals[None, :] * dlam[None, :] \
        * jnp.exp(-jnp.clip(sig * Ncol_toStar[:, None], 0.0, 500.0)) \
        / (4.0 * jnp.pi * d2[:, None])
    en_erg = E * c.keV2erg
    contrib = flux / en_erg[None, :] * sig * (E[None, :] * 1e3 / 37.0)
    return jnp.sum(jnp.where(is_xray[None, :], contrib, 0.0), axis=1)
