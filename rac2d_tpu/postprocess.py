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


def vertical_cut(table, values, r0):
    """(z, values) through the column nearest r0 (reference
    long_function_definitions vertical-profile plots)."""
    r = np.round(0.5 * (table["rmin"] + table["rmax"]), 9)
    z = 0.5 * (table["zmin"] + table["zmax"])
    use = table["using"].astype(bool)
    cols = np.unique(r[use])
    rc = cols[np.argmin(np.abs(cols - r0))]
    sel = use & (r == rc)
    order = np.argsort(z[sel])
    return z[sel][order], np.asarray(values)[sel][order]


def column_density(table, species, direction="vertical"):
    """N(species) per column [cm^-2] integrated vertically (one side)."""
    import rac2d_tpu.constants as c
    X = abundance(table, species)
    n = table["n_gas"] * X
    dz = (table["zmax"] - table["zmin"]) * c.AU2cm
    r = 0.5 * (table["rmin"] + table["rmax"])
    use = table["using"].astype(bool)
    cols = {}
    for rr in np.unique(np.round(r[use], 6)):
        m = use & (np.round(r, 6) == rr)
        cols[rr] = (n[m] * dz[m]).sum()
    rs = np.array(sorted(cols))
    return rs, np.array([cols[rr] for rr in rs])


def iter_diff(table_a, table_b, species):
    """Relative abundance change between two iteration tables (the
    convergence visualization of the reference's notebook workflow)."""
    Xa = abundance(table_a, species)
    Xb = abundance(table_b, species)
    return np.abs(Xb - Xa) / np.maximum(np.abs(Xa) + np.abs(Xb), 1e-300)


# ---------------------------------------------------------------------------
# FITS cube tools (role of the reference's fits_handling.py/fits_image.py)

def load_cube(path):
    """(cube [nf, ny, nx], freqs, header) from a cube written by
    models/imaging.py."""
    from .io.fits import read_fits_image
    data, hdr = read_fits_image(path)
    f0 = float(hdr.get("CRVAL3", 0.0))
    df = float(hdr.get("CDELT3", 1.0))
    freqs = f0 + df * np.arange(data.shape[0])
    return data, freqs, hdr


def moment_maps(cube, freqs, restfreq=None, clip=0.0):
    """(mom0, mom1_velocity) maps.

    mom0: channel-integrated intensity; mom1: intensity-weighted mean
    LOS velocity [cm/s] relative to restfreq.
    """
    import rac2d_tpu.constants as c
    f0 = restfreq or 0.5 * (freqs[0] + freqs[-1])
    v = (1.0 - freqs / f0) * c.SpeedOfLight_CGS
    w = np.maximum(cube - clip, 0.0)
    df = abs(freqs[1] - freqs[0]) if len(freqs) > 1 else 1.0
    mom0 = w.sum(axis=0) * df
    denom = np.maximum(w.sum(axis=0), 1e-300)
    mom1 = (w * v[:, None, None]).sum(axis=0) / denom
    return mom0, mom1


def pv_cut(cube, axis_index=None):
    """Position-velocity diagram along the image x-axis through the
    middle row (classic edge-on disk diagnostic)."""
    ny = cube.shape[1]
    row = axis_index if axis_index is not None else ny // 2
    return cube[:, row, :]


def convolve_beam(img, fwhm_pix):
    """Gaussian-beam convolution of a 2D map (or per-channel of a cube)
    via FFT — the reference convolves cubes with the observing beam in
    fits_image.py."""
    img = np.asarray(img)
    if img.ndim == 3:
        return np.stack([convolve_beam(ch, fwhm_pix) for ch in img])
    ny, nx = img.shape
    sig = fwhm_pix / 2.3548
    ky = np.fft.fftfreq(ny)
    kx = np.fft.fftfreq(nx)
    G = np.exp(-2.0 * (np.pi * sig) ** 2
               * (ky[:, None] ** 2 + kx[None, :] ** 2))
    return np.real(np.fft.ifft2(np.fft.fft2(img) * G))


def load_sed(path):
    """(lam_A, flam [n_mu, nlam]) from out/sed.json."""
    import json
    with open(path) as f:
        d = json.load(f)
    return np.asarray(d["lam_A"]), np.asarray(d["flam_per_mu_bin"])


def parse_contributions(path):
    """Parse an ana/ per-point file written by ops.analysis back into
    {"header": {...}, species: {"produce": [(rate, frac, rxn)],
    "destroy": [...]}} (role of the reference's parse_ana.py)."""
    out = {"header": {}}
    cur = None
    mode = None
    with open(path) as f:
        for line in f:
            line = line.rstrip()
            st = line.strip()
            if st.startswith("== ") and " X = " in st:
                cur = st.split()[1]
                out[cur] = {"produce": [], "destroy": []}
                mode = None
            elif st.startswith("production"):
                mode = "produce"
            elif st.startswith("destruction"):
                mode = "destroy"
            elif "=" in st and cur is None and not st.startswith("#"):
                k, _, v = st.partition("=")
                try:
                    out["header"][k.strip()] = float(v.split()[0])
                except (ValueError, IndexError):
                    pass
            elif cur and mode and st:
                parts = st.split(None, 2)
                try:
                    rate = float(parts[0])
                    frac = float(parts[1].rstrip("%")) / 100.0
                except (ValueError, IndexError):
                    continue
                rxn = parts[2] if len(parts) > 2 else ""
                out[cur][mode].append((rate, frac, rxn))
    return out
