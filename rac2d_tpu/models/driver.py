"""Disk model orchestration: the thermo-chemical fixed-point iteration.

Rebuild of the reference main loop (reference: src/disk.f90:224-394
``disk_iteration``, :1519 ``disk_iteration_prepare``, :1629
``calc_this_cell``, :1901-1933 convergence checks) as a host-side driver
over jitted stages:

    prepare -> [MC passes -> field reduction -> column/shielding update
               -> batched chemistry(+T) solve -> convergence check] x n_iter

Inversions for TPU: cells are solved as one vmapped batch per chunk
instead of column-serial sweeps; the per-cell retry ladder with relaxed
tolerances (reference nlocal_iter) becomes whole-batch re-solves of the
failed lanes; the Bjorkman-Wood temperature update becomes Lucy passes.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as c
from ..io import draine, umist
from ..ops import bdf as bdfmod
from ..ops import columns, fields, geometry, mcrt, odesys, optics, thermal
from ..ops.rates import CellEnv
from . import density, star as starmod
from .grid import Grid, GridConfig, make_grid


@dataclasses.dataclass
class DustComponent:
    opti_files: list[str]
    weights: list[float]
    rho_material: float = 2.0     # g/cm^3
    mrn_rmin: float = 0.01        # micron
    mrn_rmax: float = 1.0
    mrn_n: float = 3.5
    d2g_mass: float = 0.01        # mass ratio to gas
    andrews: density.AndrewsDisk | None = None   # None = follow gas


@dataclasses.dataclass
class DiskConfig:
    # star
    star_mass: float = 0.6
    star_radius: float = 1.0
    star_T: float = 4000.0
    star_spectrum_file: str | None = None
    lumi_Xray: float = 0.0
    T_Xray: float = 1e7
    # disk structure
    andrews: density.AndrewsDisk = None
    grid: GridConfig = None
    dust: list[DustComponent] = None
    # chemistry
    network_file: str = ""
    enthalpy_file: str | None = None
    init_abundances_file: str = ""
    h2o_cross_file: str | None = None
    # iteration control (reference iteration_configure defaults)
    n_iter: int = 4
    rtol_abun: float = 0.2
    atol_abun: float = 1e-12
    converged_fraction: float = 0.95
    evolT: bool = True
    t_max: float = 1e6
    dt_first: float = 1e-8
    ratio_tstep: float = 1.1
    rtol_chem: float = 1e-4
    atol_chem: float = 1e-30
    nlocal_iter: int = 4
    chem_chunk: int = 256
    # per-output-interval BDF round budget; lanes that cannot reach the
    # next output time within it are marked failed ("Premature finish",
    # reference chemistry.f90:480-491 wall-clock guard analogue)
    max_steps_per_interval: int = 500
    # wall-clock budget per chemistry chunk, seconds; 0 = unlimited
    # (reference max_runtime_allowed was 60 s per CELL time-step — here
    # one chunk solves the whole batch, so the budget is per chunk)
    chunk_wall_s: float = 0.0
    # pool-refill chemistry sweep (single-device path): the whole active
    # cell list streams through ONE constant-width window with per-lane
    # ladder retries — finished lanes retire and refill immediately, so
    # no chunk waits on its slowest lane (round 5; the sharded
    # multi-device path keeps the chunked sweep)
    chem_stream: bool = True
    # MC control
    mc: optics.McConfig = None
    n_mc_passes: int = 3
    nph_per_pass: int = 200_000
    maxw: float = 0.95
    UV_G0_background: float = 1.0
    zeta_cosmicray_H2: float = 1.36e-17
    base_alpha: float = 0.01
    minimum_Tdust: float = 1.0
    dust_depletion: float = 1.0
    # heating/cooling switches incl. gas-dust exchange + dynamic alpha
    hc: thermal.HcConfig = dataclasses.field(default_factory=thermal.HcConfig)
    # hydrostatic vertical structure (reference
    # do_vertical_struct_with_Tdust, disk.f90:984-1093) and in-loop
    # re-balancing every k-th iteration (disk.f90:224-394 main loop)
    do_vertical_with_Tdust: bool = False
    n_vert_iter_tdust: int = 4
    do_vertical_every: int = 0        # 0 = off
    # moving-grid hydrostatic variant (reference
    # vertical_pressure_gravity_balance + shift_and_scale_above,
    # vertical_structure.f90:354-518) instead of the fixed-grid _alt path
    vertical_moving: bool = False
    disk_gas_mass_preset: float | None = None
    # AMR refine/merge during iteration (reference do_refine/merge_cells,
    # disk.f90:3646-4033)
    do_refine: bool = False
    do_merge: bool = False
    refine_watch_species: tuple = ("H2", "H2O", "CO", "E-")
    # reference-format watch-list file ('name min_abun' per line,
    # species_check_refine.dat, disk.f90:3908-3968); overrides
    # refine_watch_species when set
    refine_watch_file: str | None = None
    refine_threshold: float = 10.0
    merge_tol: float = 1.5
    # ad-hoc O/C(/N) depletion of the initial abundances (reference
    # deplete_oxygen_carbon_adhoc, disk.f90:2150-2420); None = off
    depletion: object = None
    # shard chemistry chunks over the device mesh when >1 device is
    # visible.  The sharded path jits one whole-integration scan program
    # (no host_loop) — fastest on real multi-chip, but its compile is
    # heavy; disable to use the bounded per-interval host loop instead.
    shard_chemistry: bool = True
    # compute zeta_X from stellar-spectrum Ncol attenuation instead of
    # the MC local-flux tally (reference calc_zetaXray_from_Ncol mode,
    # disk.f90:1994-2001) — useful when too few X-ray packets survive
    calc_zetaXray_from_Ncol: bool = False
    # dust albedo entering the CR-induced-photon rate correction
    # (reference cell_params_ini%omega_albedo, a config constant 0.5 in
    # template_configure.dat:233 — "only for chemistry")
    cell_omega_albedo: float = 0.5


class DiskModel:
    """Holds all prepared state; run() drives the fixed-point loop."""

    def __init__(self, cfg: DiskConfig):
        self.cfg = cfg
        self.log = []
        # when set, say() streams each line here immediately (the
        # reference tees to logs/log.dat as it runs, sub_trivials.f90:1088)
        self.log_path = None

    def say(self, msg):
        self.log.append(msg)
        print(msg, flush=True)
        if self.log_path is not None:
            with open(self.log_path, "a") as f:
                f.write(msg + "\n")

    # ------------------------------------------------------------------
    def prepare(self):
        cfg = self.cfg
        t0 = time.time()
        self.say("loading chemical network...")
        self.net = umist.load_network(cfg.network_file, cfg.enthalpy_file)
        self.y0 = umist.load_initial_abundances(
            self.net, cfg.init_abundances_file)
        self.thermal = thermal.ThermalBalance(self.net, config=cfg.hc)
        self.ode = odesys.ChemicalODE(self.net, thermal=self.thermal)

        self.say("loading dust optics...")
        self.mixtures = []
        for dc in cfg.dust:
            raws = [draine.load_opti(f) for f in dc.opti_files]
            raw = draine.mix_raw(raws, dc.weights) if len(raws) > 1 else raws[0]
            self.mixtures.append(draine.mrn_average(
                raw, dc.mrn_rmin, dc.mrn_rmax, dc.mrn_n, dc.rho_material))

        self.say("building grid...")
        self.grid: Grid = make_grid(cfg.grid, cfg.andrews)
        self.gi = geometry.build_grid_index(self.grid)
        self.say(f"  {self.grid.n_cells} cells, "
                 f"{int(self.grid.using.sum())} active")

        self.say("building optics tables...")
        h2o_lam = h2o_sig = None
        if cfg.h2o_cross_file:
            h2o_lam, h2o_sig = draine.load_h2o_cross_section(
                cfg.h2o_cross_file)
        self.mc_cfg = cfg.mc or optics.McConfig(nph=cfg.nph_per_pass)
        self.tab = optics.build_tables(self.mixtures, self.mc_cfg,
                                       h2o_lam, h2o_sig)
        if cfg.hc.tdust_iter_tandem or cfg.hc.dust_gas_linear_couple:
            # gas-dust exchange modes need the Tdust(energy) LUT, which
            # only exists once the optics tables are built
            self.thermal = thermal.ThermalBalance(
                self.net, config=cfg.hc,
                tdust_lut=(self.tab.lut_Tds, self.tab.lut_vals))
            self.ode = odesys.ChemicalODE(self.net, thermal=self.thermal)

        self.say("preparing star...")
        if cfg.star_spectrum_file:
            # blackbody range tied to the aligned opacity-table lambda
            # grid (reference disk.f90:465-468), padded so the packet
            # ladder's band edges stay inside
            self.star = starmod.load_star_spectrum(
                cfg.star_spectrum_file, mass=cfg.star_mass,
                radius=cfg.star_radius, T=cfg.star_T,
                lam0=min(100.0, float(self.tab.lam[0])),
                lam1=max(1e8, float(self.tab.lam[-1])))
        else:
            self.star = starmod.blackbody_star(
                cfg.star_T, cfg.star_radius, mass=cfg.star_mass)
        self.star.lumi_Xray = cfg.lumi_Xray
        self.star.T_Xray = cfg.T_Xray
        self.star = starmod.merge_xray(self.star)
        A = 1.0 / c.Angstrom2micron
        self.lumi_UV0 = self.star.luminosity(
            c.lam_range_UV[0] * A, c.lam_range_UV[1] * A)
        self.lumi_Lya = self.star.luminosity(
            c.lam_range_LyA[0] * A, c.lam_range_LyA[1] * A)
        self.lumi_H2phd = self.star.luminosity(
            c.lam_range_UV_H2phd[0] * A, c.lam_range_UV_H2phd[1] * A)

        self.say("tracing column-density rays...")
        self.W_star, self.W_ism = columns.build_path_matrices(
            self.grid, self.gi)

        # --- per-cell static state ---
        g = self.grid
        n = g.n_cells
        self.n_dust = len(self.mixtures)
        mu = 1.4 * c.mProton_CGS
        rho_gas = g.n0 * mu
        self.rho_dust = np.stack([rho_gas * dc.d2g_mass
                                  for dc in cfg.dust])
        self.pmass = np.array([m.pmass for m in self.mixtures])
        self.sig_dusts = np.array([np.pi * m.r2av for m in self.mixtures]) \
            * c.micron2cm ** 2
        self.r2av = np.array([m.r2av for m in self.mixtures])
        self._derive_cell_state()

        # --- evolving state ---
        self.X = np.tile(self.y0[:, None], (1, n))        # [nS, n]
        self.Tgas = np.full(n, 0.0)
        self.Tdust = np.full(n, cfg.minimum_Tdust)
        self.Tdusts = np.zeros((self.n_dust, n))
        self.fields = None
        self.quality = np.zeros(n, dtype=np.int64)
        self.say(f"prepare done in {time.time() - t0:.1f}s")

    # ------------------------------------------------------------------
    def adopt_grid(self, new_grid, rho_dust=None):
        """Swap in a different grid (checkpoint restore of an
        AMR-refined mesh, reference use_backup_grid_data) and rebuild
        every geometry-dependent structure.  Caller supplies matching
        per-cell state afterwards (or rho_dust here)."""
        self.grid = new_grid
        if rho_dust is not None:
            self.rho_dust = rho_dust
        elif self.rho_dust.shape[1] != new_grid.n_cells:
            # keep shapes coherent until the caller restores the real
            # per-cell state
            self.rho_dust = np.zeros((self.n_dust, new_grid.n_cells))
        self.gi = geometry.build_grid_index(new_grid)
        self.W_star, self.W_ism = columns.build_path_matrices(
            new_grid, self.gi)
        self._derive_cell_state()
        self.fields = None

    # ------------------------------------------------------------------
    def _derive_cell_state(self):
        """Per-cell quantities derived from (grid, rho_dust); re-run after
        any density (vertical balance) or geometry (AMR) change."""
        cfg = self.cfg
        g = self.grid
        n = g.n_cells
        n_dusts = self.rho_dust / self.pmass[:, None]
        sig_nd = n_dusts * self.sig_dusts[:, None]
        self.abso_wei = sig_nd / np.maximum(sig_nd.sum(0), 1e-300)
        self.n_dusts = n_dusts
        self.vol = g.volumes_cm3()
        self.d2h = n_dusts.sum(0) / np.maximum(g.n0, 1e-300)
        self.grain_a = np.full(n, np.sqrt(
            sum(m.r2av for m in self.mixtures) / self.n_dust) * c.micron2cm)
        rc, zc = g.centers()
        self.r_cells = rc
        self.z_cells = zc
        # sweep-level shielding/Av caches are stale after any density or
        # geometry change
        self._shield = None
        self.omega_K = np.sqrt(c.GravitationConst_CGS * cfg.star_mass
                               * c.Msun_CGS / (rc * c.AU2cm) ** 3)
        self.velo_grad = 0.5 * np.sqrt(
            c.GravitationConst_CGS * cfg.star_mass * c.Msun_CGS
            / (rc * c.AU2cm)) / (rc * c.AU2cm)

    def vertical_adjust(self):
        """Hydrostatic re-balance of the gas column using the current
        Tdust (reference vertical_structure.f90 `_alt` fixed-grid path,
        or the moving-grid variant `_balance`/`shift_and_scale_above`
        when cfg.vertical_moving; called from the Tdust bootstrap and
        every do_vertical_every iterations)."""
        from ..ops import vertical
        cfg = self.cfg
        m_before = vertical.disk_gas_mass(self.grid, self.grid.n0)
        if cfg.vertical_moving:
            zmin_n, zmax_n, n_new, rho_d_new, maxf, minf = \
                vertical.pressure_gravity_balance_moving(
                    self.grid, self.grid.n0,
                    np.maximum(self.Tdust, cfg.minimum_Tdust),
                    self.rho_dust, cfg.star_mass, use_Tdust=True,
                    zmax_dom=cfg.grid.zmax)
            self.grid.zmin = zmin_n
            self.grid.zmax = zmax_n
            self.grid.n0 = n_new
            self.rho_dust = rho_d_new
            # the grid MOVED: rebuild geometry index + path matrices
            self.gi = geometry.build_grid_index(self.grid)
            self.W_star, self.W_ism = columns.build_path_matrices(
                self.grid, self.gi)
            using_new = self.grid.using
        else:
            n_new, rho_d_new, using_new, maxf, minf = \
                vertical.pressure_gravity_balance(
                    self.grid, self.grid.n0,
                    np.maximum(self.Tdust, cfg.minimum_Tdust),
                    self.rho_dust,
                    cfg.star_mass, use_Tdust=True, pmass=self.pmass,
                    disk_gas_mass_preset=cfg.disk_gas_mass_preset)
        self.grid.n0 = n_new
        self.grid.using = using_new
        self.rho_dust = rho_d_new
        self._derive_cell_state()
        m_after = vertical.disk_gas_mass(self.grid, self.grid.n0)
        self.say(f"  vertical balance: gas mass {m_before:.4e} -> "
                 f"{m_after:.4e} Msun, rescale range [{minf:.3g}, {maxf:.3g}]")
        # reference convergence test (disk.f90:1082-1085): all per-pair
        # rescale factors within [0.5, 2]
        return (maxf <= 2.0) and (minf >= 0.5)

    def vertical_bootstrap(self):
        """Alternate MC + hydrostatic passes until the gas mass settles
        (reference do_vertical_struct_with_Tdust, disk.f90:984-1093)."""
        cfg = self.cfg
        for j in range(cfg.n_vert_iter_tdust):
            self.say(f"vertical-structure pass {j + 1}/"
                     f"{cfg.n_vert_iter_tdust}")
            self.run_mc(seed=1000 + j)
            if self.vertical_adjust() and j >= 1:
                self.say("  vertical structure converged (with Tdust)")
                break

    def amr_step(self):
        """Refine/merge the vertical grid on chemistry fronts, then remap
        all per-cell state and rebuild geometry-dependent structures
        (reference do_refine/merge_cells + remake_index,
        disk.f90:3646-4033,3887)."""
        from . import amr
        cfg = self.cfg
        if cfg.refine_watch_file:
            watch, min_abun = amr.load_watch_list(cfg.refine_watch_file,
                                                  self.net)
        else:
            watch = np.asarray([self.net.idx[s]
                                for s in cfg.refine_watch_species
                                if s in self.net.idx])
            min_abun = 1e-15
        mask = amr.need_refine(self.grid, self.X, watch,
                               thresh=cfg.refine_threshold,
                               min_abun=min_abun,
                               min_dz=cfg.grid.smallest_cell_size)
        pairs = []
        if cfg.do_merge and self.fields is not None:
            pairs = amr.need_merge(
                self.grid, self.grid.n0, self.Tdust,
                np.asarray(self.fields.Av_toStar), tol=cfg.merge_tol)
            # never merge a pair involving a refine-marked cell
            pairs = [(a, b) for a, b in pairs if not (mask[a] or mask[b])]
        if not mask.any() and not pairs:
            return False
        self.say(f"  AMR: refining {int(mask.sum())} cells, "
                 f"merging {len(pairs)} pairs")
        new_grid, parent = amr.adapt_grid(self.grid, mask, pairs)
        self.grid = new_grid
        self.gi = geometry.build_grid_index(new_grid)
        self.W_star, self.W_ism = columns.build_path_matrices(
            new_grid, self.gi)
        # remap evolving per-cell state from parents
        self.X = self.X[:, parent]
        self.Tgas = self.Tgas[parent]
        self.Tdust = self.Tdust[parent]
        self.Tdusts = self.Tdusts[:, parent]
        self.quality = self.quality[parent]
        self.rho_dust = self.rho_dust[:, parent]
        self._derive_cell_state()
        # radiation fields are stale on the new mesh; the next MC pass
        # rebuilds them
        self.fields = None
        self.say(f"  AMR: grid now {new_grid.n_cells} cells, "
                 f"{int(new_grid.using.sum())} active")
        return True

    # ------------------------------------------------------------------
    def mc_cells(self) -> mcrt.McCells:
        g = self.grid
        i_HI = self.net.idx["H"]
        i_H2O = self.net.idx["H2O"]
        return mcrt.McCells(
            rmin=jnp.asarray(g.rmin), rmax=jnp.asarray(g.rmax),
            zmin=jnp.asarray(g.zmin), zmax=jnp.asarray(g.zmax),
            using=jnp.asarray(g.using), n_gas=jnp.asarray(g.n0),
            n_HI=jnp.asarray(g.n0 * self.X[i_HI]),
            n_H2O=jnp.asarray(g.n0 * self.X[i_H2O]),
            # Lya Voigt width at the ACTUAL cell Tgas (reference
            # update_gl_optical_OTF(c%par%Tgas), montecarlo.f90:374);
            # before the first chemistry sweep Tgas is unset -> fall
            # back to Tdust (the bootstrap MC has no gas solution yet)
            Tgas=jnp.asarray(np.where(
                self.Tgas > 0.0, np.maximum(self.Tgas, 1.0),
                np.maximum(self.Tdust, 1.0))),
            rho_dust=jnp.asarray(self.rho_dust),
            dust_depletion=jnp.full(g.n_cells, self.cfg.dust_depletion),
            d2h=jnp.asarray(self.d2h),
            grain_a=jnp.asarray(self.grain_a),
            Tdust=jnp.asarray(self.Tdusts),
            mdust_cell=jnp.asarray(self.rho_dust * self.vol[None, :]),
            abso_wei=jnp.asarray(self.abso_wei))

    def run_mc(self, n_passes=None, seed=0, nph=None):
        """Lucy-iterated Monte Carlo: repeat passes, freezing Tdust within
        each pass and updating it from the absorbed-energy tallies."""
        cfg = self.cfg
        n_passes = n_passes or cfg.n_mc_passes
        lam_pk, en_pk = starmod.packet_ladder(
            self.star, nph or cfg.nph_per_pass, self.mc_cfg.refine_UV,
            self.mc_cfg.refine_LyA, self.mc_cfg.refine_Xray)
        # symmetric-emission energy scaling.  The reference samples BOTH
        # cones w in (-maxw, maxw) with luminosity (maxw-minw)/4 = maxw/2
        # of L (get_mc_stellar_par, montecarlo.f90:82-106 with
        # minw=-maxw, disk.f90:413-414); downward packets reflect
        # instantly at the z=0 mirror.  We launch the upper cone only, so
        # the equivalent energy is maxw/2 (NOT maxw/4 — that under-lit
        # the disk by 2x; caught by tests/test_parity_tdust.py).
        en_pk = en_pk * (cfg.maxw / 2.0)
        # the f32 transport wants O(1) packet energies: normalize here,
        # scale the energy tallies back to physical units after the pass
        en_scale = float(np.max(en_pk)) or 1.0
        en_norm = np.asarray(en_pk) / en_scale
        # pad the packet axis to a device-count multiple so the sharded
        # MC path always engages (zero-energy packets contribute nothing)
        nd = jax.device_count()
        if nd > 1 and len(lam_pk) % nd:
            pad = nd - len(lam_pk) % nd
            lam_pk = np.concatenate([lam_pk, np.full(pad, lam_pk[-1])])
            en_norm = np.concatenate([en_norm, np.zeros(pad)])
        nlam = len(self.tab.lam)
        # walk the ladder in fixed-size slices: one compiled program
        # shape, bounded device memory, bounded program runtime (TPU
        # watchdog); each slice's tallies accumulate into the same
        # buffers.  Pad the final slice with zero-energy PADDING lanes.
        mb = self.mc_cfg.max_batch
        n_slices = max(1, -(-len(lam_pk) // mb))
        if n_slices > 1 and len(lam_pk) % mb:
            pad = n_slices * mb - len(lam_pk)
            lam_pk = np.concatenate([lam_pk, np.full(pad, lam_pk[-1])])
            en_norm = np.concatenate([en_norm, np.zeros(pad)])
        lam_d = jnp.asarray(lam_pk)
        en_d = jnp.asarray(en_norm)
        for ip in range(n_passes):
            t0 = time.time()
            cells = self.mc_cells()
            model = mcrt.McModel(tab=self.tab, gi=self.gi, cells=cells,
                                 star_mass=cfg.star_mass)
            key = jax.random.PRNGKey(seed * 1000 + ip)
            tall = mcrt.McTallies.zeros(self.grid.n_cells, nlam,
                                        self.n_dust, 5)
            mc_kw = dict(
                n_quantile=self.mc_cfg.n_quantile,
                nmax_encounter=self.mc_cfg.nmax_encounter,
                use_mrw=self.mc_cfg.use_mrw,
                mrw_gamma=self.mc_cfg.mrw_gamma,
                mrw_lam_min=self.mc_cfg.mrw_lam_min,
                save_dir=self.mc_cfg.save_dir_flux,
                save_counts=(self.mc_cfg.save_counts
                             or self.mc_cfg.do_fill_blank))
            fates = {}
            if jax.device_count() > 1 \
                    and len(lam_pk) % jax.device_count() == 0:
                for isl in range(n_slices):
                    ksl = jax.random.fold_in(key, isl)
                    sl = slice(isl * mb, isl * mb + min(mb, len(lam_pk)))
                    pk = mcrt.launch_packets(model, ksl, lam_d[sl],
                                             en_d[sl], 0.0, cfg.maxw)
                    # packet axis sharded over the device mesh, tallies
                    # all-reduced (SURVEY.md §2 parallelism item 1).
                    # hosted: bounded device programs — required on real
                    # TPU, where one whole-pass while_loop trips the
                    # device watchdog (ADVICE r2)
                    from ..parallel import mesh as meshmod
                    pk, tall, f_sl = meshmod.mc_pass_sharded(
                        meshmod.make_mesh(), model, ksl, pk, tall,
                        hosted=True,
                        steps_per_call=self.mc_cfg.steps_per_call,
                        **mc_kw)
                    for k2, v in f_sl.items():
                        fates[k2] = fates.get(k2, 0) + v
            else:
                # single device: constant-width streamed pass — the
                # batch is topped up from the packet pool as lanes
                # terminate, so occupancy stays >= 50% for the whole
                # pool instead of paying a lock-step tail per slice
                # (round-4's measured ~8x pass-level loss, VERDICT r4
                # missing #4)
                _, tall, fates = mcrt.mc_pass_streamed(
                    model, key, lam_pk, en_norm, 0.0, cfg.maxw, tall,
                    max_batch=mb,
                    steps_per_call=self.mc_cfg.steps_per_call,
                    **mc_kw)
            tall = tall._replace(**{
                f: getattr(tall, f).astype(jnp.float64) * en_scale
                for f in ("flux", "dir_flux", "en_gain", "en_gain_abso",
                          "ab_en_water", "collector", "collector_img",
                          "mrw_path")})
            self.tallies = tall
            if self.mc_cfg.do_fill_blank:
                sm = fields.fill_blank(
                    self.tab.lam, np.asarray(tall.flux),
                    np.asarray(tall.phc),
                    nth=self.mc_cfg.fill_blank_threshold)
                tall = tall._replace(flux=jnp.asarray(sm))
            fld = fields.reduce_fields(
                self.tab, cells, tall, self.vol, self.r2av,
                self.lumi_UV0, self.lumi_Lya, self.lumi_H2phd,
                jnp.asarray(self.r_cells), jnp.asarray(self.z_cells),
                cfg.UV_G0_background, cfg.minimum_Tdust)
            self.fields = fld
            self.Tdusts = np.asarray(fld.Tdusts)
            self.Tdust = np.asarray(fld.Tdust)
            # packet-fate bookkeeping (reference counts these,
            # montecarlo.f90:502-504); the hosted pass aggregates fates
            # across compactions itself
            self.mc_counts = fates
            self.say(f"  MC pass {ip + 1}/{n_passes}: "
                     f"{len(lam_pk)} packets in {time.time() - t0:.1f}s; "
                     f"Tdust {self.Tdust[self.grid.using].min():.1f}.."
                     f"{self.Tdust[self.grid.using].max():.1f} K; "
                     f"esc {self.mc_counts['escaped']} "
                     f"destr {self.mc_counts['destructed']} "
                     f"prem {self.mc_counts['premature']}")

    # ------------------------------------------------------------------
    def sed(self, dist_pc=100.0):
        """Observed SED per viewing-angle bin from the escape collector.

        Role of the reference photon collector output
        (save_collected_photons_iter, montecarlo.f90:1869-2097): the
        escaped-packet energy tally [erg/s] per (mu, lambda) bin becomes
        F_lambda [erg s^-1 cm^-2 A^-1] at the given distance, assuming
        each mu bin's energy spreads over its solid-angle annulus (x2 for
        the mirrored lower hemisphere).
        """
        coll = np.asarray(self.tallies.collector)   # [n_mu, nlam]
        lam = np.asarray(self.tab.lam)
        dlam = np.diff(lam)
        n_mu = coll.shape[0]
        dmu = 1.0 / n_mu
        d2 = (dist_pc * c.pc2cm) ** 2
        # solid angle of one |mu| bin, both hemispheres: 2 x 2 pi dmu
        omega_bin = 4.0 * np.pi * dmu
        F = coll[:, :-1] / dlam[None, :] / (omega_bin * d2)
        return 0.5 * (lam[1:] + lam[:-1]), F

    # ------------------------------------------------------------------
    def prepare_sweep_fields(self):
        """Full-disk column/shielding quantities, computed ONCE per
        chemistry sweep from the previous iterate (the per-chunk
        recomputation of round 1 redid O(whole disk) work per chunk;
        using the sweep-start state is the prescribed TPU design,
        SURVEY.md §2 parallelism item 2 — the reference instead walks
        rays against the live state cell by cell,
        disk.f90:1823 update_params_above_alt; difference cataloged in
        PARITY.md)."""
        g = self.grid
        t_sh = time.time()
        dv = np.sqrt(c.kBoltzmann_CGS * np.maximum(self.Tgas, 10.0)
                     / (c.mProton_CGS * 1.4 * 2.0))
        sh = columns.compute_shielding(
            self.W_star, self.W_ism, jnp.asarray(g.n0),
            jnp.asarray(self.X), self.net.idx, jnp.asarray(dv),
            self.thermal_visser())
        self._shield = sh
        # Av to ISM: dust column scaled by the geometric cross section x2
        # (reference mode -6 of calc_Ncol_from_cell_to_point,
        # disk.f90:2691-2700, applied at disk.f90:1430)
        Ncol_dust_ism = np.asarray(self.W_ism.matvec(
            jnp.asarray(self.n_dusts.sum(0))))
        self._Av_ism = 1.086 * Ncol_dust_ism * np.pi \
            * self.grain_a ** 2 * 2.0
        self._zetaX_ncol = None
        if self.cfg.calc_zetaXray_from_Ncol:
            sv = np.interp(np.asarray(self.tab.lam), self.star.lam,
                           self.star.vals, left=0.0, right=0.0)
            lam = jnp.asarray(self.tab.lam)
            xr_lo = c.lam_range_Xray[0] / c.Angstrom2micron
            xr_hi = c.lam_range_Xray[1] / c.Angstrom2micron
            is_xray = (lam >= xr_lo) & (lam <= xr_hi)
            self._zetaX_ncol = np.asarray(
                columns.xray_ionization_rate_ncol(
                    lam, jnp.asarray(sv), is_xray,
                    jnp.full(g.n_cells, self.cfg.dust_depletion),
                    jnp.asarray(self.d2h), jnp.asarray(self.grain_a),
                    jnp.asarray(np.asarray(sh.Ncol_toStar)),
                    jnp.asarray(self.r_cells), jnp.asarray(self.z_cells)))

        self._t_shield = time.time() - t_sh

    def assemble_envs(self, idx):
        """CellEnv/ThermalEnv for the cells in index array idx (uses the
        sweep-level fields from prepare_sweep_fields)."""
        cfg = self.cfg
        g = self.grid
        f = self.fields
        if not hasattr(self, "_shield") or self._shield is None:
            self.prepare_sweep_fields()
        sh = self._shield
        Av_ism = self._Av_ism
        take = lambda a: jnp.asarray(np.asarray(a)[idx])
        take2 = lambda a: jnp.asarray(np.asarray(a)[:, idx]).T  # [B, 5]
        env = CellEnv(
            Tgas=take(self.Tgas),
            Tdust=take(self.Tdust),
            n_gas=take(g.n0),
            zeta_cosmicray_H2=jnp.full(len(idx), cfg.zeta_cosmicray_H2),
            zeta_Xray_H2=take(self._zetaX_ncol)
            if self._zetaX_ncol is not None else take(f.zeta_Xray),
            Ncol_toISM=take(np.asarray(sh.Ncol_toISM)),
            Av_toISM=take(Av_ism),
            Av_toStar=take(f.Av_toStar),
            G0_UV_toISM=jnp.full(len(idx), cfg.UV_G0_background),
            G0_UV_toStar=take(f.G0_UV_toStar),
            G0_UV_H2phd=take(f.G0_UV_H2phd),
            G0_UV_toStar_photoDesorb=take(f.G0_UV_toStar_photoDesorb),
            phflux_Lya=take(f.phflux_Lya),
            omega_albedo=jnp.full(len(idx), cfg.cell_omega_albedo),
            f_selfshielding_toISM=take2(sh.toISM),
            f_selfshielding_toStar=take2(sh.toStar),
            GrainRadius_CGS=take(self.grain_a),
            sigdust_ave=jnp.asarray(
                (self.sig_dusts[:, None] * self.n_dusts).sum(0)[idx]
                / np.maximum(self.n_dusts.sum(0)[idx], 1e-300)),
            ndust_tot=take(self.n_dusts.sum(0)),
            ratioDust2HnucNum=take(self.d2h),
            SitesPerGrain=jnp.asarray(
                4.0 * np.pi * self.grain_a[idx] ** 2 * c.SitesDensity_CGS),
        )
        cs = np.sqrt(c.kBoltzmann_CGS * np.maximum(self.Tgas[idx], 1.0)
                     / (c.mProton_CGS * 1.4 * 2.0))
        tenv = thermal.ThermalEnv(
            PAH_abundance=jnp.full(len(idx), c.PAH_abundance_0),
            MeanMolWeight=jnp.full(len(idx), 1.4),
            alpha_viscosity=jnp.full(len(idx), cfg.base_alpha),
            omega_Kepler=take(self.omega_K),
            velo_width_turb=jnp.asarray(cs),
            coherent_length=jnp.asarray(cs / self.velo_grad[idx]),
            Ncol_toStar=take(np.asarray(sh.Ncol_toStar)),
            Neufeld_G=jnp.ones(len(idx)),
            Neufeld_dv_dz=jnp.asarray(self.velo_grad[idx] * 1e-5),
            n_dusts=jnp.asarray(self.n_dusts[:, idx]).T @ jnp.eye(self.n_dust, 4),
            sig_dusts=jnp.tile(jnp.asarray(self.sig_dusts), (len(idx), 1))
            @ jnp.eye(self.n_dust, 4),
            Tdusts=jnp.asarray(self.Tdusts[:, idx]).T @ jnp.eye(self.n_dust, 4),
            en_gains=jnp.asarray(
                np.asarray(self.tallies.en_gain)[:, idx]).T
            @ jnp.eye(self.n_dust, 4) + jnp.where(
                jnp.arange(4) >= self.n_dust, jnp.inf, 0.0),
            mdusts_cell=jnp.asarray(
                (self.n_dusts[:, idx] * self.vol[None, idx])
                * np.array([m.pmass for m in self.mixtures])[:, None]).T
            @ jnp.eye(self.n_dust, 4),
            # AU^3 (range-safe on the TPU backend's
            # f32-exponent f64 emulation; ThermalEnv.volume)
            volume=take(self.vol / c.AU2cm ** 3),
        )
        return env, tenv

    def thermal_visser(self):
        from ..io import tables
        if not hasattr(self, "_visser"):
            self._visser = tables.VisserCOShielding()
        return self._visser

    # ------------------------------------------------------------------
    def _solve_chunk(self, idx, n_real, level, touts):
        """Solve one padded cell chunk at the given tolerance level and
        scatter successful results back into (X, Tgas).  Returns
        (ok mask over the first n_real lanes, total accepted steps)."""
        cfg = self.cfg
        nS = self.net.n_species
        t_env0 = time.time()
        env, tenv = self.assemble_envs(idx)
        # accumulated per sweep; surfaced in the stage-timing line so a
        # host-side env-assembly regression is visible next to solve time
        self._t_envs = getattr(self, "_t_envs", 0.0) \
            + (time.time() - t_env0)
        y0b = jnp.asarray(self.X[:, idx].T)
        T0b = jnp.asarray(self.Tgas[idx])
        rtol, atol = odesys.tolerance_ladder(
            self.net, level, cfg.rtol_chem, cfg.atol_chem,
            float(self.d2h.mean()))
        rtol_b = jnp.tile(rtol, (len(idx), 1))
        atol_b = jnp.tile(atol, (len(idx), 1))
        if cfg.shard_chemistry and jax.device_count() > 1 \
                and len(idx) % jax.device_count() == 0:
            # shard the cell batch across the device mesh (pure data
            # parallelism; SURVEY.md §2 parallelism item 2)
            from ..parallel import mesh as meshmod
            res = meshmod.sharded_chemistry_solve(
                meshmod.make_mesh(), self.ode, env, tenv, y0b,
                T0b, touts, rtol_b, atol_b, cfg.dt_first, cfg.evolT,
                max_steps_per_interval=cfg.max_steps_per_interval)
        else:
            # host_loop: one compiled record serves every chunk (envs
            # are traced args), device programs stay bounded, and the
            # wall guard can fire mid-solve
            res = self.ode.solve_batched(
                env, y0b, T0b, touts, rtol_b, atol_b,
                first_step=cfg.dt_first, evolT=cfg.evolT, tenvs=tenv,
                max_steps_per_interval=cfg.max_steps_per_interval,
                host_loop=True, max_wall_s=cfg.chunk_wall_s or None,
                progress_cb=lambda i, s: (
                    self.say(f"      ...interval {i}")
                    if i and i % 16 == 0 else None))
        ok = ~np.asarray(res.fail)[:n_real]
        idx = idx[:n_real]
        yf = np.asarray(res.ys[:n_real, -1, :])
        self.X[:, idx[ok]] = yf[ok, :nS].T
        if cfg.evolT:
            self.Tgas[idx[ok]] = yf[ok, nS]
        else:
            # equilibrium-temperature update by bracketed bisection
            # (reference solve_bisect_T mode,
            # heating_cooling.f90:1273-1403)
            yb_full = jnp.asarray(
                np.concatenate([yf[:, :nS],
                                self.Tgas[idx][:, None]], axis=1))
            env_r = jax.tree.map(lambda a: a[:n_real], env)
            tenv_r = jax.tree.map(lambda a: a[:n_real], tenv)
            Teq, brk = jax.vmap(
                lambda y, e, te, T0: self.thermal.solve_equilibrium_T(
                    y, e, te, T0, self.ode.tab))(
                yb_full, env_r, tenv_r,
                jnp.asarray(np.maximum(self.Tgas[idx], 2.0)))
            brk_m = np.asarray(brk) & ok
            self.Tgas[idx[brk_m]] = np.asarray(Teq)[brk_m]
        return ok, int(np.asarray(res.n_steps)[:n_real].sum())

    # ------------------------------------------------------------------
    def _pool_sweep(self, act, touts):
        """Stream ALL active cells through one constant-width solver
        window (odesys.solve_pool): finished lanes retire and refill
        from the pool, the per-lane tolerance ladder replaces the
        chunk-level re-solve ladder.  Returns the indices of cells that
        failed every ladder level."""
        cfg = self.cfg
        nS = self.net.n_species
        t_env0 = time.time()
        env, tenv = self.assemble_envs(act)
        self._t_envs = getattr(self, "_t_envs", 0.0) \
            + (time.time() - t_env0)
        y0b = jnp.asarray(self.X[:, act].T)
        T0b = jnp.asarray(self.Tgas[act])
        d2g = float(self.d2h.mean())
        rtol, atol = odesys.tolerance_ladder(
            self.net, 1, cfg.rtol_chem, cfg.atol_chem, d2g)
        retry = self.ode.retry_ladder(
            max(cfg.nlocal_iter - 1, 0), cfg.rtol_chem, cfg.atol_chem,
            d2g) or None
        W = min(cfg.chem_chunk, len(act))
        n_chunks = -(-len(act) // W)
        wall = (cfg.chunk_wall_s * n_chunks * cfg.nlocal_iter) or None
        t0 = time.time()
        res = self.ode.solve_pool(
            env, y0b, T0b, touts, rtol, atol, width=W,
            first_step=cfg.dt_first, evolT=cfg.evolT, tenvs=tenv,
            max_steps_per_interval=cfg.max_steps_per_interval,
            retry_tols=retry, max_wall_s=wall,
            progress_cb=lambda k, st: (
                self.say(f"      ...pool call {k}")
                if k and k % 32 == 0 else None))
        ok = ~np.asarray(res.fail)
        yf = np.asarray(res.ys[:, -1, :])
        self.X[:, act[ok]] = yf[ok, :nS].T
        if cfg.evolT:
            self.Tgas[act[ok]] = yf[ok, nS]
        else:
            # equilibrium-temperature update by bracketed bisection, in
            # fixed-width padded chunks (one compiled shape)
            for lo in range(0, len(act), W):
                idx = act[lo:lo + W]
                n_real = len(idx)
                if n_real < W:
                    idx = np.concatenate(
                        [idx, np.repeat(idx[-1:], W - n_real)])
                yb_full = jnp.asarray(np.concatenate(
                    [np.asarray(self.X[:, idx].T),
                     self.Tgas[idx][:, None]], axis=1))
                env_r, tenv_r = self.assemble_envs(idx)
                Teq, brk = jax.vmap(
                    lambda y, e, te, T00: self.thermal.solve_equilibrium_T(
                        y, e, te, T00, self.ode.tab))(
                    yb_full, env_r, tenv_r,
                    jnp.asarray(np.maximum(self.Tgas[idx], 2.0)))
                brk_m = np.asarray(brk)[:n_real] & ok[lo:lo + n_real]
                self.Tgas[idx[:n_real][brk_m]] = \
                    np.asarray(Teq)[:n_real][brk_m]
        lvl = np.asarray(res.retry_level) if res.retry_level is not None \
            else np.zeros(len(act))
        self.say(f"    pool sweep: {len(act)} cells, width {W}, "
                 f"{int(np.asarray(res.n_steps).sum())} steps, "
                 f"{int((~ok).sum())} failed, "
                 f"ladder levels {np.bincount(lvl.astype(int), minlength=4).tolist()}, "
                 f"{time.time() - t0:.1f}s")
        return act[~ok]

    # ------------------------------------------------------------------
    def chemistry_step(self, iiter=1):
        """One full-disk chemistry(+T) sweep, batched over cells.

        Cells are ordered by density so each vmapped chunk contains
        similarly-stiff lanes (lock-step batches pay for their slowest
        lane)."""
        cfg = self.cfg
        act = np.nonzero(self.grid.using)[0]
        act = act[np.argsort(self.grid.n0[act])]
        touts = jnp.asarray(bdfmod.log_output_times(
            cfg.dt_first, cfg.t_max, cfg.ratio_tstep))
        # initial Tgas guess (reference set_initial_condition_4solver,
        # disk.f90:2014-2047): slightly above Tdust on first iteration
        if iiter == 1:
            self.Tgas = np.maximum(self.Tdust * 1.1 + 10.0, self.Tgas)
            if cfg.depletion is not None:
                from . import depletion as depl
                self.say("  applying O/C depletion to initial abundances")
                self.X = depl.apply_depletion(
                    self.net, self.X, self.grid, self.grid.n0, self.Tgas,
                    cfg.depletion, star_mass=cfg.star_mass,
                    t_evol=cfg.t_max)
        nS = self.net.n_species
        abun_prev = self.X.copy()
        self.prepare_sweep_fields()
        # level-1 sweep over all active cells; failed lanes are COMPACTED
        # into retry batches at relaxed tolerances (the reference relaxes
        # only the failing cell, chemistry.f90:272-387 — round 1 re-solved
        # whole chunks, discarding converged lanes' work)
        use_shard = cfg.shard_chemistry and jax.device_count() > 1
        if cfg.chem_stream and not use_shard and len(act):
            # pool-refill streaming sweep (in-lane ladder; single
            # compiled window shape)
            pending = self._pool_sweep(act, touts)
        else:
            pending = self._chunked_sweep(act, touts)
        self.quality[pending] += 512
        if len(pending):
            self.say(f"  {len(pending)} cells failed all "
                     f"{cfg.nlocal_iter} tolerance levels (quality +512)")
        # convergence bookkeeping on the 10 key species (reference
        # check_convergency_cell, disk.f90:1901-1915)
        ki = self.net.key_species_idx
        d = np.abs(self.X[ki][:, act] - abun_prev[ki][:, act])
        tol = cfg.atol_abun + cfg.rtol_abun * np.abs(
            self.X[ki][:, act] + abun_prev[ki][:, act])
        self.converged_cells = (d <= tol).all(axis=0)
        frac = self.converged_cells.mean() if len(act) else 1.0
        self.say(f"  converged cells: {self.converged_cells.sum()}"
                 f"/{len(act)} ({frac * 100:.1f}%)")
        return frac

    # ------------------------------------------------------------------
    def _chunked_sweep(self, act, touts):
        """Chunked sweep with chunk-level tolerance ladder (the sharded
        multi-device path; also the fallback when chem_stream=False)."""
        cfg = self.cfg
        pending = act
        n_done = 0
        for level in range(1, cfg.nlocal_iter + 1):
            if len(pending) == 0:
                break
            if level > 1:
                self.say(f"  retry level {level}: "
                         f"{len(pending)} cells at relaxed tolerances")
            failed = []
            for lo in range(0, len(pending), cfg.chem_chunk):
                idx = pending[lo:lo + cfg.chem_chunk]
                t_chunk = time.time()
                # pad to full width: one compiled shape for the entire
                # sweep, and the batch stays divisible by the device mesh
                n_real = len(idx)
                if n_real < cfg.chem_chunk:
                    idx = np.concatenate(
                        [idx, np.repeat(idx[-1:], cfg.chem_chunk - n_real)])
                ok, steps = self._solve_chunk(idx, n_real, level, touts)
                n_done += int(ok.sum())
                failed.append(idx[:n_real][~ok])
                self.say(f"    chunk {lo // cfg.chem_chunk} "
                         f"(level {level}): {n_real} cells, "
                         f"{steps} steps, {int((~ok).sum())} failed, "
                         f"{time.time() - t_chunk:.1f}s; "
                         f"done {n_done}/{len(act)}")
            pending = np.concatenate(failed) if failed else \
                np.array([], dtype=np.int64)
        return pending

    # ------------------------------------------------------------------
    def run(self, n_iter=None, save_dir=None):
        """save_dir: if given, dump the per-cell state table after every
        iteration (reference iter_NNNN.dat, disk.f90:2745-3074)."""
        n_iter = self.cfg.n_iter if n_iter is None else n_iter
        if self.cfg.do_vertical_with_Tdust:
            self.vertical_bootstrap()
        self.say("initial Monte Carlo (Tdust bootstrap)...")
        self.run_mc()
        for it in range(1, n_iter + 1):
            self.say(f"=== iteration {it}/{n_iter} ===")
            stage_t = {}
            t_st = time.time()
            if it > 1:
                self.run_mc(seed=it)
            stage_t["mc"] = time.time() - t_st
            t_st = time.time()
            self._t_envs = 0.0
            frac = self.chemistry_step(iiter=it)
            stage_t["chemistry"] = time.time() - t_st
            stage_t["shielding"] = getattr(self, "_t_shield", 0.0)
            stage_t["env-assembly"] = getattr(self, "_t_envs", 0.0)
            if save_dir is not None:
                from . import output as outmod
                import pathlib
                p = pathlib.Path(save_dir) / f"iter_{it:04d}.npz"
                outmod.save_iter_npz(p, self, it)
                self.say(f"  saved {p}")
            if frac >= self.cfg.converged_fraction:
                self.say("converged.")
                break
            t_st = time.time()
            if self.cfg.do_vertical_every > 0 \
                    and it % self.cfg.do_vertical_every == 0 and it < n_iter:
                self.vertical_adjust()
            stage_t["vertical"] = time.time() - t_st
            t_st = time.time()
            if self.cfg.do_refine and it < n_iter:
                self.amr_step()
            stage_t["amr"] = time.time() - t_st
            # per-stage timing summary (role of the reference my_timer
            # wall-clock lines, sub_trivials.f90:1-88 / main.f90:56,114)
            self.say("  stage timing: " + "  ".join(
                f"{k} {v:.1f}s" for k, v in stage_t.items()))
        return self
