"""Table interpolation, jittable.

Device-side replacements for reference src/interpolation.f90 (spline_1d_2d,
barycentric_1d_2d).  On TPU we precompute tables host-side (scipy is fine
there) and interpolate on device with linear/bilinear lookups, which
vectorize on the VPU.  Cubic-spline *construction* happens host-side in the
io loaders; what runs on device is evaluation over regular/rectilinear grids.
"""

import jax.numpy as jnp


def interp1(x, xp, fp):
    """Piecewise-linear interpolation with edge clamping ([...] -> [...])."""
    return jnp.interp(x, xp, fp)


def loglog_interp1(x, xp, fp, floor=1e-300):
    """Linear interpolation in log-log space (positive tables)."""
    lx = jnp.log(jnp.maximum(x, floor))
    lxp = jnp.log(jnp.maximum(xp, floor))
    lfp = jnp.log(jnp.maximum(fp, floor))
    return jnp.exp(jnp.interp(lx, lxp, lfp))


def _locate(x, grid):
    """Index i such that grid[i] <= x < grid[i+1], clamped to valid cells."""
    i = jnp.searchsorted(grid, x, side="right") - 1
    return jnp.clip(i, 0, grid.shape[0] - 2)


def bilinear(x, y, xgrid, ygrid, table):
    """Bilinear interpolation of table[len(xgrid), len(ygrid)] at (x, y).

    Clamps outside the grid (no extrapolation), matching the reference's
    table accessors.  x, y may be arrays (broadcast together).
    """
    i = _locate(x, xgrid)
    j = _locate(y, ygrid)
    x0, x1 = xgrid[i], xgrid[i + 1]
    y0, y1 = ygrid[j], ygrid[j + 1]
    tx = jnp.clip((x - x0) / (x1 - x0), 0.0, 1.0)
    ty = jnp.clip((y - y0) / (y1 - y0), 0.0, 1.0)
    f00 = table[i, j]
    f10 = table[i + 1, j]
    f01 = table[i, j + 1]
    f11 = table[i + 1, j + 1]
    return ((1 - tx) * (1 - ty) * f00 + tx * (1 - ty) * f10
            + (1 - tx) * ty * f01 + tx * ty * f11)


def trilinear(x, y, z, xg, yg, zg, table):
    """Trilinear interpolation of table[nx, ny, nz] with edge clamping."""
    i = _locate(x, xg)
    j = _locate(y, yg)
    k = _locate(z, zg)
    tx = jnp.clip((x - xg[i]) / (xg[i + 1] - xg[i]), 0.0, 1.0)
    ty = jnp.clip((y - yg[j]) / (yg[j + 1] - yg[j]), 0.0, 1.0)
    tz = jnp.clip((z - zg[k]) / (zg[k + 1] - zg[k]), 0.0, 1.0)
    out = 0.0
    for di, wx in ((0, 1 - tx), (1, tx)):
        for dj, wy in ((0, 1 - ty), (1, ty)):
            for dk, wz in ((0, 1 - tz), (1, tz)):
                out = out + wx * wy * wz * table[i + di, j + dj, k + dk]
    return out


def logspace(a, b, n):
    """log10-spaced grid from 10^a to 10^b inclusive (host helper)."""
    return jnp.logspace(a, b, n)
