"""Line/continuum imaging pipeline: excitation + cube synthesis + FITS.

Glue layer reproducing the reference's second-phase workflow (reference:
src/ray_tracing.f90:975-1401 ``line_tran_prep``/``load_exc_molecule``/
``line_excitation_do``/``do_exc_calc``, :39-256 the cube loops, and
src/continuum_lookuptable.f90 ``make_local_cont_lut``): select
transitions by frequency window / upper-level energy / Aul, compute per-
cell level populations (LTE or batched NLTE), then synthesize
position-position-velocity cubes per transition per viewing angle and
write FITS.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as c
from ..io import fits as fitsio
from ..io import lamda
from ..ops import raytrace, stateq


@dataclasses.dataclass
class LineConfig:
    mol_file: str
    database: str = "lamda"       # lamda | hitran | cdms
    mole_name: str = ""
    abundance_factor: float = 1.0
    useLTE: bool = False
    # transition selection (reference raytracing_configure)
    freq_min: float = 0.0         # Hz
    freq_max: float = 1e99
    E_min: float = 0.0            # K
    E_max: float = 5000.0
    Aul_min: float = 0.0
    # cube geometry
    nx: int = 201
    ny: int = 201
    nf: int = 100
    view_thetas: tuple = (7.0,)
    vel_half_width: float = 6e5   # cm/s
    dist_pc: float = 100.0


class LineImaging:
    def __init__(self, disk, cfg: LineConfig):
        """disk: a prepared (and iterated) models.driver.DiskModel."""
        self.disk = disk
        self.cfg = cfg
        if cfg.database == "lamda":
            self.mol = lamda.load_lamda(cfg.mol_file)
        elif cfg.database == "hitran":
            from ..io import hitran
            self.mol = hitran.load_hitran(cfg.mol_file)
        elif cfg.database == "cdms":
            from ..io import cdms
            self.mol = cdms.load_cdms(cfg.mol_file)
        else:
            raise ValueError(cfg.database)
        self.tab = stateq.build_mol_tables(self.mol)
        # transitions to image
        keep = ((self.mol.freq >= cfg.freq_min)
                & (self.mol.freq <= cfg.freq_max)
                & (self.mol.Eup_K >= cfg.E_min)
                & (self.mol.Eup_K <= cfg.E_max)
                & (self.mol.Aul >= cfg.Aul_min))
        self.transitions = np.nonzero(keep)[0]
        # molecule abundance from the chemistry state
        name = cfg.mole_name or self.mol.name.strip()
        base = name.split("(")[0].strip()
        self.i_spe = disk.net.idx.get(base, -1)
        if self.i_spe < 0 and base in disk.net.species:
            self.i_spe = disk.net.species.index(base)
        if self.i_spe < 0:
            raise ValueError(f"species {base} not in network")
        self.fpop = None

    # ------------------------------------------------------------------
    def cont_J_at(self, lam_A):
        """Local continuum mean intensity at wavelength(s) from the MC
        flux (reference make_local_cont_lut,
        continuum_lookuptable.f90:25-42)."""
        d = self.disk
        lamg = np.asarray(d.tab.lam)
        flux = np.asarray(d.fields.flux)       # [n, nlam]
        dlam = np.diff(lamg)
        lam_mid = 0.5 * (lamg[1:] + lamg[:-1])
        Jlam = flux[:, :-1] / dlam[None, :] * lam_mid[None, :] ** 2 \
            * c.Angstrom2cm / c.SpeedOfLight_CGS / (4.0 * np.pi)
        out = np.zeros((flux.shape[0], len(np.atleast_1d(lam_A))))
        for k, la in enumerate(np.atleast_1d(lam_A)):
            j = np.clip(np.searchsorted(lam_mid, la), 0, len(lam_mid) - 1)
            out[:, k] = Jlam[:, j]
        return out

    def excitation(self):
        """Level populations for every using cell (LTE or NLTE batch)."""
        d = self.disk
        g = d.grid
        act = np.nonzero(g.using)[0]
        n_mol = g.n0 * d.X[self.i_spe] * self.cfg.abundance_factor
        Tg = np.maximum(d.Tgas, 2.73)
        fpop = np.zeros((self.mol.n_level, g.n_cells))
        if self.cfg.useLTE:
            for i in act:
                f = self.mol.g * np.exp(-self.mol.energy_K / Tg[i])
                fpop[:, i] = f / f.sum()
        else:
            cs = np.sqrt(c.kBoltzmann_CGS * Tg
                         / (c.mProton_CGS * 1.4 * 2.0))
            coh = cs / d.velo_grad
            nr = len(self.mol.Aul)
            cont_J = self.cont_J_at(self.mol.lam_A)        # [n, nr]
            # continuum extinction at the line wavelengths: dust only
            kext = np.zeros((g.n_cells, nr))
            for di, mx in enumerate(d.mixtures):
                ke = np.interp(self.mol.lam_A, mx.lam, mx.kab + mx.ksc)
                kext += d.rho_dust[di][:, None] * ke[None, :]
            # partner densities by name
            dens_map = {}
            X = d.X
            idx = d.net.idx
            nH2 = g.n0 * X[idx["H2"]]
            dens_map.update({
                "H2": nH2, "o-H2": 0.75 * nH2, "p-H2": 0.25 * nH2,
                "H": g.n0 * X[idx["H"]],
                "H+": g.n0 * X[idx["H+"]] if idx.get("H+", -1) >= 0 else 0 * nH2,
                "e": g.n0 * X[idx["E-"]],
            })
            dp = np.stack([dens_map.get(nm, np.zeros(g.n_cells))
                           for nm in self.tab.partner_names])
            envs = stateq.CellExcEnv(
                Tkin=jnp.asarray(Tg[act]),
                dv=jnp.asarray(cs[act]),
                length_scale=jnp.asarray(np.minimum(
                    coh[act], np.maximum(
                        np.asarray(d._shield.Ncol_toISM)[act]
                        / np.maximum(g.n0[act], 1e-30), 1e10))),
                density_mol=jnp.asarray(n_mol[act]),
                dens_partner=jnp.asarray(dp[:, act]).T,
                cont_alpha=jnp.asarray(kext[act]),
                cont_J=jnp.asarray(cont_J[act]))
            fs, errs = stateq.solve_stateq_batch(self.tab, envs)
            fpop[:, act] = np.asarray(fs).T
        self.fpop = fpop
        self.n_mol = n_mol
        return fpop

    # ------------------------------------------------------------------
    def rt_model(self, itr, freqs=None):
        d = self.disk
        g = d.grid
        mol = self.mol
        iu, il = int(mol.iup[itr]), int(mol.ilow[itr])
        Tg = np.maximum(d.Tgas, 2.73)
        dv = np.sqrt(c.kBoltzmann_CGS * Tg
                     / (c.mProton_CGS * mol.weight))
        # dust opacity evaluated at EACH channel's wavelength (the
        # reference interpolates per frequency, ray_tracing.f90:338-364;
        # a lam0-constant broadcast was round 1's shortcut — wrong for
        # wide velocity windows)
        if freqs is None:
            lam_ch = np.full(self.cfg.nf, mol.lam_A[itr])
        else:
            lam_ch = c.SpeedOfLight_CGS / (np.asarray(freqs)
                                           * c.Angstrom2cm)
        kext = np.stack([np.interp(lam_ch, m.lam, m.kab + m.ksc)
                         for m in d.mixtures])
        cells = raytrace.RtCells(
            rmin=jnp.asarray(g.rmin), rmax=jnp.asarray(g.rmax),
            zmin=jnp.asarray(g.zmin), zmax=jnp.asarray(g.zmax),
            using=jnp.asarray(g.using),
            Tdusts=jnp.asarray(d.Tdusts),
            rho_dust=jnp.asarray(d.rho_dust),
            n_mol=jnp.asarray(self.n_mol),
            f_up=jnp.asarray(self.fpop[iu]),
            f_low=jnp.asarray(self.fpop[il]),
            dv=jnp.asarray(dv))
        return raytrace.RtModel(
            gi=d.gi, cells=cells, kext_dust=jnp.asarray(kext),
            star_mass=d.cfg.star_mass, f0=float(mol.freq[itr]),
            Aul=float(mol.Aul[itr]), Bul=float(mol.Bul[itr]),
            Blu=float(mol.Blu[itr]))

    def make_cube(self, itr, theta, out_fits=None):
        cfg = self.cfg
        d = self.disk
        if self.fpop is None:
            self.excitation()
        f0 = float(self.mol.freq[itr])
        dfreq = f0 * cfg.vel_half_width / c.SpeedOfLight_CGS * 2 / cfg.nf
        freqs = f0 + (np.arange(cfg.nf) - cfg.nf / 2) * dfreq
        model = self.rt_model(itr, freqs=freqs)
        half = d.grid.rmax.max() * 1.05
        xs = np.linspace(-half, half, cfg.nx)
        ys = np.linspace(-half, half, cfg.ny)
        I, tau, Nu, Nl = raytrace.make_cube(model, theta, xs, ys, freqs,
                                            is_line=True)
        # flux spectrum in jansky at dist_pc (reference converts per pixel
        # solid angle; here summed over the image)
        pix_sr = ((xs[1] - xs[0]) * (ys[1] - ys[0]) * c.AU2cm ** 2
                  / (cfg.dist_pc * c.pc2cm) ** 2)
        spec = I.sum(axis=(0, 1)) * pix_sr / c.jansky2CGS
        int_map = (I - 0.5 * (I[:, :, :1] + I[:, :, -1:])).sum(-1) * dfreq
        if out_fits:
            # line metadata cards the reference records in every cube
            # (ray_tracing.f90:730-753) — the downstream batch analysis
            # (utils_python fits_proc.specline) keys on these by name
            mol = self.mol
            iu, il = int(mol.iup[itr]), int(mol.ilow[itr])
            jansky2SI = 1e-26
            base = np.linspace(spec[0], spec[-1], len(spec))
            df = abs(dfreq)
            fitsio.write_cube_fits(
                out_fits, I, freqs=freqs, tau_map=tau, int_map=int_map,
                ncol_up=Nu, ncol_low=Nl, spectrum=spec,
                header={"EXTNAME": "LineCube",
                        "LINE": mol.name.strip()[:18],
                        "MOL-DB": mol.name.strip()[:18],
                        "RESTFRQ": f0, "F0": f0,
                        "LAM0": float(mol.lam_A[itr]),
                        "EUP": float(mol.Eup_K[itr]),
                        "ELOW": float(mol.energy_K[il]),
                        "AUL": float(mol.Aul[itr]),
                        "BUL": float(mol.Bul[itr]),
                        "BLU": float(mol.Blu[itr]),
                        "QNUM": f"{iu}->{il}",
                        "MAXFLUX": float(np.max(spec)),
                        "MAXTAU": float(np.max(tau)),
                        "INTFLUX": float(np.sum(spec) * jansky2SI * df),
                        "INTFLUXL": float(np.sum(spec - base)
                                          * jansky2SI * df),
                        "THETA": float(theta),
                        "DIST": cfg.dist_pc,
                        # pixel solid angle: lets SpecLine rebuild the
                        # flux spectrum from the cube if the FLUXSPEC
                        # extension is ever absent
                        "PIXSR": float(pix_sr),
                        "CDELT1": float(xs[1] - xs[0]),
                        "CDELT2": float(ys[1] - ys[0])})
        return I, tau, Nu, Nl, spec


def make_continuum_cube(disk, lam_A, theta, nx=201, ny=201,
                        dist_pc=100.0, out_fits=None):
    """Dust continuum image at wavelengths lam_A (reference
    make_cubes_continuum, ray_tracing.f90:39-126)."""
    g = disk.grid
    lam_A = np.atleast_1d(np.asarray(lam_A, dtype=float))
    freqs = c.SpeedOfLight_CGS / (lam_A * c.Angstrom2cm)
    kext = np.stack([np.interp(lam_A, m.lam, m.kab + m.ksc)
                     for m in disk.mixtures])
    cells = raytrace.RtCells(
        rmin=jnp.asarray(g.rmin), rmax=jnp.asarray(g.rmax),
        zmin=jnp.asarray(g.zmin), zmax=jnp.asarray(g.zmax),
        using=jnp.asarray(g.using), Tdusts=jnp.asarray(disk.Tdusts),
        rho_dust=jnp.asarray(disk.rho_dust),
        n_mol=jnp.zeros(g.n_cells), f_up=jnp.zeros(g.n_cells),
        f_low=jnp.zeros(g.n_cells), dv=jnp.ones(g.n_cells))
    model = raytrace.RtModel(
        gi=disk.gi, cells=cells, kext_dust=jnp.asarray(kext),
        star_mass=disk.cfg.star_mass, f0=0.0, Aul=0.0, Bul=0.0, Blu=0.0)
    half = g.rmax.max() * 1.05
    xs = np.linspace(-half, half, nx)
    ys = np.linspace(-half, half, ny)
    I, tau, _, _ = raytrace.make_cube(model, theta, xs, ys, freqs,
                                      is_line=False)
    pix_sr = ((xs[1] - xs[0]) * (ys[1] - ys[0]) * c.AU2cm ** 2
              / (dist_pc * c.pc2cm) ** 2)
    spec = I.sum(axis=(0, 1)) * pix_sr / c.jansky2CGS
    if out_fits:
        fitsio.write_cube_fits(out_fits, I, freqs=freqs, tau_map=tau,
                               spectrum=spec,
                               header={"THETA": float(theta),
                                       "DIST": dist_pc,
                                       "PIXSR": float(pix_sr),
                                       "CDELT1": float(xs[1] - xs[0]),
                                       "CDELT2": float(ys[1] - ys[0])})
    return I, tau, spec
