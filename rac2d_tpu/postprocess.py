"""Post-processing and plotting helpers.

Role of the reference's ``utils_python`` package (SURVEY.md L11:
``draw/long_function_definitions.py`` loads iter_NNNN.dat tables and
plots quantities on the cell mesh; fits_image.py works with the cubes).
Operates on the npz tables written by models/output.py and the FITS cubes
from models/imaging.py.
"""

from __future__ import annotations

import numpy as np


def load_iter(path):
    from .models.output import load_iter_npz
    return load_iter_npz(path)


def cell_quads(table):
    """Matplotlib PolyCollection vertices for the cell rectangles."""
    r0, r1 = table["rmin"], table["rmax"]
    z0, z1 = table["zmin"], table["zmax"]
    return np.stack([
        np.stack([r0, z0], -1), np.stack([r1, z0], -1),
        np.stack([r1, z1], -1), np.stack([r0, z1], -1)], axis=1)


def plot_mesh(table, values, ax=None, log=True, mirror=False, vmin=None,
              vmax=None, cmap="viridis", label=None):
    """Color the cell mesh by a per-cell quantity (like the reference's
    iter_NNNN.dat maps).  Returns the matplotlib axis."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    from matplotlib.collections import PolyCollection
    from matplotlib.colors import LogNorm, Normalize

    if ax is None:
        _, ax = plt.subplots(figsize=(7, 4))
    vals = np.asarray(values, dtype=float)
    use = table.get("using", np.ones(len(vals), bool)).astype(bool)
    quads = cell_quads(table)[use]
    v = vals[use]
    if log:
        v = np.maximum(v, np.nanmin(v[v > 0]) if (v > 0).any() else 1e-300)
        norm = LogNorm(vmin=vmin or np.nanmin(v), vmax=vmax or np.nanmax(v))
    else:
        norm = Normalize(vmin=vmin, vmax=vmax)
    pc = PolyCollection(quads, array=v, cmap=cmap, norm=norm,
                        edgecolor="none")
    ax.add_collection(pc)
    if mirror:
        m = quads.copy()
        m[:, :, 1] *= -1
        pc2 = PolyCollection(m, array=v, cmap=cmap, norm=norm,
                             edgecolor="none")
        ax.add_collection(pc2)
    ax.set_xlim(table["rmin"].min(), table["rmax"].max())
    zmax = table["zmax"].max()
    ax.set_ylim(-zmax if mirror else 0, zmax)
    ax.set_xlabel("r [AU]")
    ax.set_ylabel("z [AU]")
    plt.colorbar(pc, ax=ax, label=label)
    return ax


def abundance(table, species):
    names = list(table["species"])
    return table["abundances"][names.index(species)]


def radial_profile(table, values, z_over_r_max=0.1):
    """Midplane-ish radial profile: per column, average the cells with
    z/r below the cut."""
    r = 0.5 * (table["rmin"] + table["rmax"])
    z = 0.5 * (table["zmin"] + table["zmax"])
    sel = (z < z_over_r_max * r) & table["using"].astype(bool)
    order = np.argsort(r[sel])
    return r[sel][order], np.asarray(values)[sel][order]


def spectrum_from_fits(path):
    """(freq, flux) from a cube file written by models/imaging.py."""
    from .io.fits import read_fits_image
    data, hdr = read_fits_image(path)
    f0 = float(hdr.get("CRVAL3", 0))
    df = float(hdr.get("CDELT3", 1))
    nf = data.shape[0]
    freqs = f0 + df * np.arange(nf)
    return freqs, data.sum(axis=(1, 2))
