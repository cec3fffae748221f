"""Ray/cell geometry for annular (r, z) cells — vectorized, jittable.

Rebuild of the reference geometry kernel (reference:
src/ray_propagating.f90:365-504 ``calc_intersection_ray_cell`` — six
candidate surfaces: top/bottom planes and inner/outer cylinders, each with
two quadratic roots; :276-362 the mirror (z<0) variant; tree-based point
location :136-178).

TPU inversion: all six candidate lengths are evaluated branchlessly and
reduced with a masked min; point location uses two searchsorted lookups on
the columnwise grid (radial column edges, then the column's z-edge ladder)
instead of a pointer-tree walk.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# constants must stay representable in float32 (the MC walk runs in f32)
FL_BIG = 1e30
MIN_LEN = 1e-30
MIN_VZ = 1e-20
MIN_VXY = 1e-30
MIN_LEN_FRAC = 1e-6

# exit direction codes (reference dirtype):
# 1 top, 2 bottom, 3/4 inner cylinder, 5/6 outer cylinder
DIR_TOP, DIR_BOTTOM, DIR_INNER, DIR_OUTER = 1, 2, 3, 5


def ray_cell_exit(x, y, z, vx, vy, vz, rmin, rmax, zmin, zmax):
    """Distance to the first exit surface of the annular box.

    Returns (length, eps, dirtype, found).  All inputs may be batched.
    Mirrors reference calc_intersection_ray_cell semantics including the
    minimum-length cut and the eps nudge.
    """
    # top & bottom planes
    vz_ok = jnp.abs(vz) >= MIN_VZ
    L1 = jnp.where(vz_ok, (zmax - z) / jnp.where(vz_ok, vz, 1.0), -1.0)
    L2 = jnp.where(vz_ok, (zmin - z) / jnp.where(vz_ok, vz, 1.0), -1.0)

    def rr_at(L):
        tx = x + L * vx
        ty = y + L * vy
        return tx * tx + ty * ty

    rmin2 = rmin * rmin
    rmax2 = rmax * rmax
    L1 = jnp.where((L1 >= 0) & (rr_at(L1) >= rmin2) & (rr_at(L1) <= rmax2),
                   L1, -1.0)
    L2 = jnp.where((L2 >= 0) & (rr_at(L2) >= rmin2) & (rr_at(L2) <= rmax2),
                   L2, -1.0)

    # cylinders: A t^2 + B t + C = 0
    A = vx * vx + vy * vy
    B = 2.0 * (x * vx + y * vy)
    rr0 = x * x + y * y
    A_ok = jnp.abs(A) > MIN_VXY
    A_safe = jnp.where(A_ok, A, 1.0)

    def cyl_roots(r2):
        C = rr0 - r2
        D = B * B - 4.0 * A * C
        ok = (D > 0.0) & A_ok
        sq = jnp.sqrt(jnp.maximum(D, 0.0))
        La = (-B + sq) / (2.0 * A_safe)
        Lb = (-B - sq) / (2.0 * A_safe)

        def zcheck(L):
            zz = z + vz * L
            return (zz >= zmin) & (zz <= zmax)

        La = jnp.where(ok & zcheck(La), La, -1.0)
        Lb = jnp.where(ok & zcheck(Lb), Lb, -1.0)
        return La, Lb

    L3, L4 = cyl_roots(rmin2)
    L5, L6 = cyl_roots(rmax2)

    Ls = jnp.stack([L1, L2, L3, L4, L5, L6], axis=-1)
    valid = Ls > MIN_LEN
    Lm = jnp.where(valid, Ls, FL_BIG)
    # min + argmin reductions — NOT take_along_axis, which lowers to a
    # per-lane gather (~several ns/lane in the MC walk loop)
    idx = jnp.argmin(Lm, axis=-1)
    length = jnp.min(Lm, axis=-1)
    found = valid.any(axis=-1)
    # boundary-crossing nudge: cell-size fraction, floored by the ULP of
    # the position magnitude — in f32 a thin cell's 1e-6*dz nudge can be
    # below the representable step at |pos|, leaving the packet stuck ON
    # the boundary (found=False next step)
    ulp = 8.0 * jnp.finfo(jnp.asarray(x).dtype).eps
    pos_scale = jnp.abs(x) + jnp.abs(y) + jnp.abs(z) + length
    eps = jnp.maximum(
        jnp.minimum(rmax - rmin, zmax - zmin) * MIN_LEN_FRAC,
        pos_scale * ulp)
    dirtype = idx + 1
    return jnp.where(found, length, 0.0), eps, dirtype, found


def ray_cell_exit_mirror(x, y, z, vx, vy, vz, rmin, rmax, zmin, zmax):
    """Mirror-symmetric variant: the cell occupies zmin<=|z|<=zmax
    (reference calc_intersection_ray_cell_mirror, :276-362).  Assumes the
    point is inside the mirrored cell.

    The mirrored ray (x, y, -z, vx, vy, -vz) is the direct ray under
    (z, vz) -> (-z, -vz), so ONE ray_cell_exit call with the sign folded
    in replaces evaluating both and selecting — ray_cell_exit was ~34
    ns/lane in the walk loop, half of it the second evaluation.  Exit
    length / eps / found are reflection-invariant; dirtype is reported
    in the reflected frame exactly as the two-call version did."""
    direct = (z >= zmin) & (z <= zmax)
    sgn = jnp.where(direct, 1.0, -1.0).astype(jnp.asarray(z).dtype)
    return ray_cell_exit(x, y, z * sgn, vx, vy, vz * sgn,
                         rmin, rmax, zmin, zmax)


class GridIndex(NamedTuple):
    """Device-side point-location structure for the columnwise grid."""
    r_edges: jnp.ndarray        # [n_col + 1] column boundaries (AU)
    z_edges: jnp.ndarray        # [n_col, max_nz + 1] per-column z edges,
                                # padded with +inf
    cell_of: jnp.ndarray        # [n_col, max_nz] leaf index, -1 pad
    n_z: jnp.ndarray            # [n_col] cells per column
    zmax_dom: float
    rmin_dom: float
    rmax_dom: float
    # log-uniform radial lookup table: one gather + one correction
    # comparison replaces the per-step binary search over r_edges
    # (searchsorted is ~10 dependent gathers on TPU).  None -> fall back
    # to searchsorted (hand-built test fixtures).
    r_lut: jnp.ndarray = None   # [n_lut] int32: column of each slot edge
    r_lut_log0: float = 0.0     # ln(r_edges[0])
    r_lut_inv_d: float = 1.0    # n_lut / ln(r_max/r_min)
    # packed variants for the MC walk loop body, where every B-indexed
    # gather costs ~the same whether it reads 1 or 60 columns (latency/
    # transaction bound): locate needs only TWO row gathers —
    #   r_lut_pack[slot]  -> (ic0, r_edges[ic0], r_edges[ic0+1])
    #   zc_pack[ic]       -> (z_edges row .. cell_of row as f32)
    # instead of five separate indexed reads.  None -> unpacked path.
    r_lut_pack: jnp.ndarray = None   # [n_lut, 3] f32
    zc_pack: jnp.ndarray = None      # [n_col, 2*max_nz + 1] f32


def build_grid_index(grid) -> GridIndex:
    """Host-side: per-column sorted z-edge ladders + cell map."""
    ncol = grid.n_columns
    # the packed fast path stores column/cell ids as f32 (one row gather
    # in the walk loop); f32 integers are exact only below 2**24
    n_cells_tot = len(np.asarray(grid.zmin))
    if n_cells_tot >= (1 << 24) or ncol >= (1 << 24):
        raise ValueError(
            f"grid too large for the packed f32 locate tables "
            f"(n_cells={n_cells_tot}, ncol={ncol} must be < 2**24)")
    nz = np.diff(grid.col_ptr)
    max_nz = int(nz.max())
    z_edges = np.full((ncol, max_nz + 1), np.inf)
    cell_of = np.full((ncol, max_nz), -1, dtype=np.int32)
    r_edges = np.zeros(ncol + 1)
    for i in range(ncol):
        members = grid.col_cells[grid.col_ptr[i]:grid.col_ptr[i + 1]]
        order = np.argsort(grid.zmin[members])   # bottom -> top
        m = members[order]
        z_edges[i, :len(m)] = grid.zmin[m]
        z_edges[i, len(m)] = grid.zmax[m[-1]]
        cell_of[i, :len(m)] = m
        r_edges[i] = grid.rmin[m[0]]
        r_edges[i + 1] = grid.rmax[m[0]]
    # radial lookup table: slots fine enough that at most one column
    # boundary falls inside any slot (single +1 correction in locate)
    ln_r = np.log(r_edges)
    min_dlog = np.diff(ln_r).min()
    span = ln_r[-1] - ln_r[0]
    n_lut = int(min(max(4096, 4.0 * span / max(min_dlog, 1e-12)), 1 << 20))
    r_lut = None
    log0 = inv_d = 0.0
    if span / n_lut < min_dlog:
        slot_left = np.exp(ln_r[0] + span * np.arange(n_lut) / n_lut)
        r_lut = np.clip(np.searchsorted(r_edges, slot_left,
                                        side="right") - 1, 0, ncol - 1)
        log0 = float(ln_r[0])
        inv_d = float(n_lut / span)
    r_lut_pack = None
    if r_lut is not None:
        r_lut_pack = np.stack(
            [r_lut.astype(np.float32),
             r_edges[r_lut].astype(np.float32),
             r_edges[np.minimum(r_lut + 1, ncol)].astype(np.float32)],
            axis=1)
    zc_pack = np.concatenate(
        [z_edges.astype(np.float32), cell_of.astype(np.float32)], axis=1)
    return GridIndex(
        r_edges=jnp.asarray(r_edges), z_edges=jnp.asarray(z_edges),
        cell_of=jnp.asarray(cell_of), n_z=jnp.asarray(nz, dtype=jnp.int32),
        zmax_dom=float(grid.zmax.max()), rmin_dom=float(r_edges[0]),
        rmax_dom=float(r_edges[-1]),
        r_lut=None if r_lut is None else jnp.asarray(r_lut, jnp.int32),
        r_lut_log0=log0, r_lut_inv_d=inv_d,
        r_lut_pack=None if r_lut_pack is None else jnp.asarray(r_lut_pack),
        zc_pack=jnp.asarray(zc_pack))


def locate(gi: GridIndex, rsq, z_abs):
    """Leaf cell containing (r, |z|); -1 if outside the domain.

    Two binary searches on static arrays — the TPU replacement for the
    reference's pointer-tree walk (ray_propagating.f90:136-178)."""
    r = jnp.sqrt(rsq)
    ncol = gi.r_edges.shape[0] - 1
    max_nz = gi.cell_of.shape[1]
    if gi.r_lut_pack is not None and gi.zc_pack is not None \
            and jnp.asarray(r).dtype == jnp.float32:
        # packed f32 fast path (MC walk): TWO row gathers total.
        # f64 callers (ray tracer, launch) keep the full-precision path.
        n_lut = gi.r_lut_pack.shape[0]
        slot = jnp.clip(jnp.floor(
            (jnp.log(jnp.maximum(r, 1e-30)) - gi.r_lut_log0)
            * gi.r_lut_inv_d).astype(jnp.int32), 0, n_lut - 1)
        prow = gi.r_lut_pack[slot]                      # [..., 3]
        ic0 = prow[..., 0].astype(jnp.int32)
        # at most one boundary per slot by construction: +-1 correction
        # (the -1 guards f32 log round-off landing one slot high)
        ic = ic0 + (r >= prow[..., 2]).astype(jnp.int32) \
            - (r < prow[..., 1]).astype(jnp.int32)
        ic = jnp.clip(ic, 0, ncol - 1)
        zc = gi.zc_pack[ic]                  # [..., 2*max_nz + 1]
        zrow = zc[..., :max_nz + 1]
        iz = jnp.sum(zrow <= z_abs[..., None], axis=-1) - 1
        iz = jnp.clip(iz, 0, max_nz - 1)
        # cell id via a one-hot contraction over the already-gathered
        # row (elementwise; a take_along_axis here would be one more
        # indexed op in the walk loop)
        onehot = (jnp.arange(max_nz) == iz[..., None])
        cell = jnp.sum(jnp.where(onehot, zc[..., max_nz + 1:], 0.0),
                       axis=-1).astype(jnp.int32)
        z0 = zrow[..., 0]
    else:
        if gi.r_lut is not None:
            n_lut = gi.r_lut.shape[0]
            slot = jnp.clip(jnp.floor(
                (jnp.log(jnp.maximum(r, 1e-30)) - gi.r_lut_log0)
                * gi.r_lut_inv_d).astype(jnp.int32), 0, n_lut - 1)
            ic0 = gi.r_lut[slot]
            ic = ic0 + (r >= gi.r_edges[jnp.minimum(ic0 + 1, ncol)]
                        ).astype(jnp.int32) \
                - (r < gi.r_edges[ic0]).astype(jnp.int32)
            ic = jnp.clip(ic, 0, ncol - 1)
        else:
            ic = jnp.clip(
                jnp.searchsorted(gi.r_edges, r, side="right") - 1,
                0, ncol - 1)
        zrow = gi.z_edges[ic]                  # [..., max_nz + 1]
        # comparison-count "searchsorted" along the ragged z ladder (the
        # pad value +inf never counts); scalar or batched inputs
        iz = jnp.sum(zrow <= z_abs[..., None], axis=-1) - 1
        iz = jnp.clip(iz, 0, max_nz - 1)
        cell = gi.cell_of[ic, iz]
        z0 = zrow[..., 0]
    inside = (r >= gi.rmin_dom) & (r <= gi.rmax_dom) \
        & (z_abs <= gi.zmax_dom) & (z_abs >= z0) & (cell >= 0)
    return jnp.where(inside, cell, -1)
