"""Gas thermal balance: 11 heating + 17 cooling processes, jittable.

TPU-native rebuild of the reference heating/cooling stack
(reference: src/heating_cooling.f90:179-1269).  Every process is a pure
function of (abundance vector, Tgas, cell environment); the full
``heating_minus_cooling`` evaluates them all as vector ops so it can sit
inside the chemistry ODE right-hand side (as the dT/dt equation,
reference src/disk.f90:4653-4657,4739) and be vmapped over cells.

The nested-NLTE cooling paths of the reference (CII/OI solved with an
embedded level-population solver inside the ODE RHS,
src/heating_cooling.f90:885-933) are replaced by the analytic and LUT
paths the reference itself prefers by default (use_analytical_CII_OI and
IonCoolingWithLut are .true. in type_heating_cooling_config,
src/heating_cooling.f90:17,38); full NLTE cooling is available outside
the RHS via ops/stateq.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .. import constants as c
from ..io import tables
from ..io.umist import ChemNet
from .rates import CellEnv, RateTables, build_rate_tables

TINY = 1e-100
FRAC_DUST_LOSE_EN = 0.8


@dataclasses.dataclass(frozen=True)
class HcConfig:
    """Static switches/efficiencies (reference heating_cooling_configure
    namelist defaults, src/heating_cooling.f90:16-39)."""
    use_analytical_CII_OI: bool = True
    use_mygasgraincooling: bool = True
    use_chemicalheatingcooling: bool = True
    use_Xray_heating: bool = True
    use_phdheating_H2: bool = True
    use_phdheating_H2OOH: bool = True
    heating_eff_chem: float = 1.0
    heating_eff_H2form: float = 0.1
    heating_eff_phd_H2: float = 1.0
    heating_eff_phd_H2O: float = 0.1
    heating_eff_phd_OH: float = 0.1
    cooling_gg_coeff: float = 0.3
    # when False, alpha_viscosity in ThermalEnv is the *base* alpha and the
    # effective value is modulated by the ambipolar-diffusion MRI fit from
    # the instantaneous ion fraction (reference src/disk.f90:30,3415-3427)
    use_fixed_alpha_visc: bool = True
    # gas<->dust energy-exchange modes (reference a_disk flags
    # src/disk.f90:31,35 + tandem Tdust re-solve src/disk.f90:4702-4721);
    # both need a Tdust(energy) LUT passed to ThermalBalance(tdust_lut=...)
    allow_gas_dust_en_exch: bool = False
    tdust_iter_tandem: bool = False
    dust_gas_linear_couple: bool = False


class ThermalEnv(NamedTuple):
    """Extra per-cell fields beyond CellEnv that thermal balance needs
    (reference stores all of these in the same per-cell struct,
    src/data_struct.f90:316-442)."""
    PAH_abundance: jnp.ndarray
    MeanMolWeight: jnp.ndarray
    alpha_viscosity: jnp.ndarray
    omega_Kepler: jnp.ndarray
    velo_width_turb: jnp.ndarray      # cm/s
    coherent_length: jnp.ndarray      # cm
    Ncol_toStar: jnp.ndarray
    Neufeld_G: jnp.ndarray
    Neufeld_dv_dz: jnp.ndarray        # km s-1 cm-1
    # per-dust-component data (fixed-width arrays, padded with zeros)
    n_dusts: jnp.ndarray              # [4]
    sig_dusts: jnp.ndarray            # [4]
    Tdusts: jnp.ndarray               # [4]
    en_gains: jnp.ndarray             # [4] erg/s absorbed per cell (MC)
    mdusts_cell: jnp.ndarray          # [4] dust mass per cell, g
    volume: jnp.ndarray               # AU^3 (NOT cm^3: cell volumes in
    #   cm^3 reach ~1e42, beyond the f32 EXPONENT RANGE that this TPU
    #   backend's extended-precision f64 emulation carries — they read
    #   back as inf and poison the gas-grain clamp with inf/inf.  All
    #   use sites multiply by AU2cm^3 in a range-safe order.)

    @staticmethod
    def default(**kw):
        d = dict(
            PAH_abundance=c.PAH_abundance_0, MeanMolWeight=1.4,
            alpha_viscosity=0.0, omega_Kepler=0.0, velo_width_turb=1e5,
            coherent_length=1e14, Ncol_toStar=0.0, Neufeld_G=1.0,
            Neufeld_dv_dz=1e-9,
            n_dusts=jnp.zeros(4), sig_dusts=jnp.zeros(4),
            Tdusts=jnp.zeros(4), en_gains=jnp.full(4, jnp.inf),
            mdusts_cell=jnp.zeros(4), volume=1.0)
        d.update(kw)
        return ThermalEnv(**{k: jnp.asarray(v, dtype=jnp.float64)
                             for k, v in d.items()})


class HeatingCoolingRates(NamedTuple):
    """All individual rates [erg cm^-3 s^-1] (reference
    type_heating_cooling_rates_list, src/data_struct.f90:489-520)."""
    heating_photoelectric: jnp.ndarray
    heating_formation_H2: jnp.ndarray
    heating_cosmic_ray: jnp.ndarray
    heating_vibrational_H2: jnp.ndarray
    heating_ionization_CI: jnp.ndarray
    heating_photodissociation_H2: jnp.ndarray
    heating_photodissociation_H2O: jnp.ndarray
    heating_photodissociation_OH: jnp.ndarray
    heating_Xray: jnp.ndarray
    heating_viscosity: jnp.ndarray
    heating_chem: jnp.ndarray
    cooling_photoelectric: jnp.ndarray
    cooling_vibrational_H2: jnp.ndarray
    cooling_gas_grain: jnp.ndarray
    cooling_OI: jnp.ndarray
    cooling_CII: jnp.ndarray
    cooling_H2O_rot: jnp.ndarray
    cooling_H2O_vib: jnp.ndarray
    cooling_CO_rot: jnp.ndarray
    cooling_CO_vib: jnp.ndarray
    cooling_H2_rot: jnp.ndarray
    cooling_LymanAlpha: jnp.ndarray
    cooling_free_bound: jnp.ndarray
    cooling_free_free: jnp.ndarray
    cooling_NII: jnp.ndarray
    cooling_SiII: jnp.ndarray
    cooling_FeII: jnp.ndarray
    cooling_OH_rot: jnp.ndarray

    def net(self):
        h = (self.heating_photoelectric + self.heating_formation_H2
             + self.heating_cosmic_ray + self.heating_vibrational_H2
             + self.heating_ionization_CI + self.heating_photodissociation_H2
             + self.heating_photodissociation_H2O
             + self.heating_photodissociation_OH + self.heating_Xray
             + self.heating_viscosity + self.heating_chem)
        l = (self.cooling_photoelectric + self.cooling_vibrational_H2
             + self.cooling_gas_grain + self.cooling_OI + self.cooling_CII
             + self.cooling_H2O_rot + self.cooling_H2O_vib
             + self.cooling_CO_rot + self.cooling_CO_vib
             + self.cooling_H2_rot + self.cooling_LymanAlpha
             + self.cooling_free_bound + self.cooling_free_free
             + self.cooling_NII + self.cooling_SiII + self.cooling_FeII
             + self.cooling_OH_rot)
        return h - l


def _pos(x):
    return jnp.maximum(x, 0.0)


def _exp(x):
    return jnp.exp(jnp.clip(x, -c.max_exp, c.max_exp))


class ThermalBalance:
    """Holds static data (tables, species indices, reaction heats)."""

    def __init__(self, net: ChemNet, config: HcConfig = HcConfig(),
                 data_dir: str | None = None, tdust_lut=None):
        self.cfg = config
        self.net = net
        # (lut_Tds [nT], lut_vals [n_dust, nT]) from ops.optics.McTables:
        # the cumulative kappa_abs*B integral used by get_Tdust_from_LUT
        # (reference montecarlo.f90:1487-1526); enables the tandem and
        # linear-couple gas-dust exchange modes
        self.tdust_lut = None
        if tdust_lut is not None:
            self.tdust_lut = (jnp.asarray(tdust_lut[0], jnp.float64),
                              jnp.asarray(tdust_lut[1], jnp.float64))
        ddir = pathlib.Path(data_dir) if data_dir else tables.DATA_DIR
        self.neufeld_h2 = tables.NeufeldH2()
        self.neufeld_h2o = tables.NeufeldH2O()
        self.neufeld_co = tables.NeufeldCO()
        self.lut_NII = tables.IonCoolingLUT(ddir / "N+_LUT.bin")
        self.lut_SiII = tables.IonCoolingLUT(ddir / "Si+_LUT.bin")
        self.lut_FeII = tables.IonCoolingLUT(ddir / "Fe+_LUT.bin")

        ix = net.idx
        self.i = {k: int(v) for k, v in ix.items()}
        # reactions contributing chemical heating (itype 5, with enthalpy
        # data; reference chem_get_reaction_heat, src/chemistry.f90:2083)
        if net.reac_heat is not None:
            sel = np.nonzero(net.has_heat)[0]
            self.heat_reac1 = jnp.asarray(np.clip(net.reac[sel, 0], 0, None))
            self.heat_reac2 = jnp.asarray(np.clip(net.reac[sel, 1], 0, None))
            self.heat_idx = jnp.asarray(sel)
            self.heat_val = jnp.asarray(net.reac_heat[sel])
        else:
            self.heat_idx = jnp.zeros(0, dtype=jnp.int64)
        # the H2-formation surface reaction (gH + gH -> gH2)
        tab = build_rate_tables(net)
        gh63 = np.nonzero(np.asarray(tab.is_gH_63))[0]
        self.i_gH63 = int(gh63[0]) if len(gh63) else -1
        # positive charge per species, for the dynamic-alpha ion fraction
        # (reference get_ion_charge_y, src/disk.f90:3446-3460)
        self.pos_charge = jnp.asarray(
            np.clip(net.elements[:, 0], 0, None).astype(float))

    # -- helpers ----------------------------------------------------------
    def _chi_uv(self, env: CellEnv):
        return (env.G0_UV_toISM * _exp(-c.UVext2Av * env.Av_toISM)
                + env.G0_UV_toStar * _exp(-c.UVext2Av * env.Av_toStar))

    def _chi_h2(self, env: CellEnv):
        return (env.G0_UV_toISM * _exp(-c.UVext2Av * env.Av_toISM)
                * env.f_selfshielding_toISM[1]
                + env.G0_UV_H2phd * env.f_selfshielding_toStar[1])

    def _lut_Td(self, vals_j, val):
        """Energy-per-dust-mass -> Tdust (forward interp on the cumulative
        emission LUT, reference get_Tdust_from_LUT montecarlo.f90:856)."""
        Tds = self.tdust_lut[0]
        nT = vals_j.shape[0]
        i = jnp.clip(jnp.searchsorted(vals_j, val), 1, nT - 1)
        t = (val - vals_j[i - 1]) / jnp.maximum(vals_j[i] - vals_j[i - 1],
                                                1e-300)
        Tv = Tds[i - 1] + jnp.clip(t, 0.0, 1.0) * (Tds[i] - Tds[i - 1])
        Tv = jnp.where(val <= vals_j[0],
                       Tds[0] * val / jnp.maximum(vals_j[0], 1e-300), Tv)
        return jnp.where(val >= vals_j[-1], Tds[-1], Tv)

    def _lut_val(self, vals_j, Td):
        """Tdust -> energy per dust mass (inverse of _lut_Td)."""
        Tds = self.tdust_lut[0]
        nT = Tds.shape[0]
        i = jnp.clip(jnp.searchsorted(Tds, Td), 1, nT - 1)
        t = (Td - Tds[i - 1]) / jnp.maximum(Tds[i] - Tds[i - 1], 1e-300)
        return vals_j[i - 1] + jnp.clip(t, 0.0, 1.0) \
            * (vals_j[i] - vals_j[i - 1])

    def _tandem_tdusts(self, Tg, coeff_i, tenv: ThermalEnv):
        """Re-solve each component's Tdust with the gas-collision energy
        included: Td = LUT((en_gain + en_exchange(Tg,Td)) / 4 pi m_dust),
        damped-Newton with secant slope, fixed iteration count
        (reference solve_a_Tdust, src/disk.f90:4536-4548)."""
        import jax
        Tds, vals = self.tdust_lut
        nd = vals.shape[0]
        gains = tenv.en_gains[:nd]
        gains = jnp.where(jnp.isfinite(gains), gains, 0.0)
        inv4pm = 1.0 / jnp.maximum(
            4.0 * jnp.pi * tenv.mdusts_cell[:nd], TINY)
        active = (tenv.n_dusts[:nd] > 1e-20) \
            & (tenv.mdusts_cell[:nd] > TINY)

        def en_ex(Td):
            per_vol = coeff_i[:nd] * (Tg - Td)
            # (per_vol * AU2cm^3) first: keeps every intermediate
            # within the f32 exponent range (see ThermalEnv.volume)
            return jnp.maximum((per_vol * c.AU2cm ** 3) * tenv.volume,
                               -FRAC_DUST_LOSE_EN * gains)

        def body(_, Td):
            Ts1 = jax.vmap(self._lut_Td)(vals, (gains + en_ex(Td)) * inv4pm)
            dTd = 1e-2 * Td + 1e-1
            Ts2 = jax.vmap(self._lut_Td)(
                vals, (gains + en_ex(Td + dTd)) * inv4pm)
            kk = (Ts2 - Ts1) / dTd
            prop = jnp.where(jnp.abs(1.0 - kk) <= 1e-15, Td,
                             (Ts1 - kk * Td) / (1.0 - kk))
            # damped + clamped: when the exchange term saturates the LUT,
            # the undamped Newton ping-pongs between the LUT endpoints;
            # halving the step makes it contract instead
            prop = jnp.clip(prop, 0.0, Tds[-1])
            Td_new = 0.5 * (Td + prop)
            ok = active & (Td_new > 0.0) & jnp.isfinite(Td_new)
            return jnp.where(ok, Td_new, Td)

        import jax.lax as lax
        Td = lax.fori_loop(0, 16, body, tenv.Tdusts[:nd])
        return tenv.Tdusts.at[:nd].set(Td)

    def _demit_dtd(self, Td_i, tenv: ThermalEnv):
        """d(emitted power per volume)/dTdust per component from the LUT
        slope (reference get_dEmit_dTd, src/disk.f90:4550-4562)."""
        import jax
        Tds, vals = self.tdust_lut
        nd = vals.shape[0]
        Td = Td_i[:nd]
        dT = 1e-2 * Td + 1e-2
        e1 = jax.vmap(self._lut_val)(vals, Td)
        e2 = jax.vmap(self._lut_val)(vals, Td + dT)
        slope = (e2 - e1) / dT * 4.0 * jnp.pi \
            * (tenv.mdusts_cell[:nd] / c.AU2cm ** 3) \
            / jnp.maximum(tenv.volume, TINY)
        out = jnp.zeros_like(Td_i)
        return out.at[:nd].set(jnp.maximum(slope, 0.0))

    def h2_form_rate(self, k_gH63_per_sec, X_gH, X_HI, n_gas):
        """dn(H2)/dt from grain surface (reference disk.f90:4302-4315,
        H2_form_use_moeq = false path)."""
        if self.i["gH"] >= 0:
            return k_gH63_per_sec * X_gH * X_gH * n_gas
        return k_gH63_per_sec * X_HI * n_gas

    # -- main entry -------------------------------------------------------
    def rates(self, y, Tgas, env: CellEnv, tenv: ThermalEnv,
              k=None) -> HeatingCoolingRates:
        """All heating/cooling rates [erg cm^-3 s^-1].

        y: abundance vector [n_species(+1)]; k: optional precomputed rate
        vector (yr^-1 units, as from compute_rates) used for chemical
        heating and the H2 formation rate.
        """
        cfg = self.cfg
        i = self.i
        T = Tgas
        Tpos = jnp.maximum(T, 1e-30)
        n = env.n_gas

        def X(name):
            return y[i[name]] if i[name] >= 0 else jnp.zeros(())

        X_H2, X_HI, X_E = X("H2"), X("H"), X("E-")
        X_CI, X_CII, X_OI = X("C"), X("C+"), X("O")
        X_CO, X_H2O, X_OH = X("CO"), X("H2O"), X("OH")
        X_Hplus, X_Heplus = X("H+"), X("He+")
        X_NII, X_SiII, X_FeII = X("N+"), X("Si+"), X("Fe+")
        X_gH = X("gH")

        chi_pe = self._chi_uv(env)
        chi_h2 = self._chi_h2(env)
        n_e = X_E * n

        # ---- heating ----
        # 1. photoelectric on small grains (Bakes & Tielens via Wolfire 95)
        tmp = chi_pe * jnp.sqrt(Tpos) / (n_e + TINY)
        t1 = jnp.where(tmp > 0, tmp ** 0.73, 0.0)
        t2 = (1e-4 * Tpos) ** 0.70
        h_pe = jnp.where(
            (X_E > 0) & (T > 0),
            1e-24 * chi_pe * n * tenv.PAH_abundance / c.PAH_abundance_0
            * (4.87e-2 / (1.0 + 4e-3 * t1) + 3.65e-2 * t2 / (1.0 + 2e-4 * tmp)),
            0.0)

        # 2. H2 formation (1/3 of 4.5 eV per event)
        if k is not None and self.i_gH63 >= 0:
            kcoeff = k[self.i_gH63] / c.SecondsPerYear
        else:
            kcoeff = jnp.zeros(())
        r_h2form = self.h2_form_rate(kcoeff, X_gH, X_HI, n)
        h_h2form = 2.4e-12 * r_h2form * cfg.heating_eff_H2form

        # 3. cosmic ray (Bruderer 2009)
        h_cr = 1.5e-11 * env.zeta_cosmicray_H2 * n * _exp(
            -env.Ncol_toISM / c.cosmicray_attenuate_N)

        # 4. H2 vibrational pumping (Rollig 2006 C.2-C.3)
        gamma_10 = 5.4e-13 * jnp.sqrt(Tpos)
        h_vibH2 = jnp.where(
            T > 0,
            (n * X_H2) * chi_h2 * 9.4e-22
            / (1.0 + (1.9e-6 + chi_h2 * 4.7e-10) / (n * gamma_10)),
            0.0)

        # 5. CI ionization (Tielens 2005 eq 3.8)
        h_ci = 2.2e-22 * X_CI * n * chi_pe

        # 6. H2 photodissociation (Tielens 2005 eq 3.18-3.19)
        h_phd_h2 = (4e-14 * (n * X_H2) * 3.4e-10 * chi_h2
                    * cfg.heating_eff_phd_H2) if cfg.use_phdheating_H2 else \
            jnp.zeros(())

        # 7/8. H2O & OH photodissociation by Lyman-alpha
        if cfg.use_phdheating_H2OOH:
            h_phd_h2o = (8.07e-12 * cfg.heating_eff_phd_H2O * n * X_H2O
                         * c.LyAlpha_cross_H2O
                         * env.phflux_Lya * env.f_selfshielding_toStar[3])
            h_phd_oh = (9.19e-12 * cfg.heating_eff_phd_OH * n * X_OH
                        * c.LyAlpha_cross_OH
                        * env.phflux_Lya * env.f_selfshielding_toStar[4])
        else:
            h_phd_h2o = h_phd_oh = jnp.zeros(())

        # 9. X-ray heating per ion pair (Glassgold 2012 table 4)
        if cfg.use_Xray_heating:
            gam1 = jnp.where(T > 0, 1e-12 * jnp.sqrt(Tpos) * _exp(-1000.0 / Tpos), 0.0)
            gam2 = jnp.where(T > 0, 1.4e-12 * jnp.sqrt(Tpos)
                             * _exp(-18100.0 / (Tpos + 1200.0)), 0.0)
            Xep = jnp.maximum(X_E, 0.0)
            pos = X_E > 0
            t2_ = jnp.where(pos, 7.95 * Xep ** 0.678, 0.0)
            t3_ = jnp.where(pos, 2.17 * Xep ** 0.366, 0.0)
            t4_ = jnp.where(pos, 22.0 * Xep ** 0.574, 0.0)
            t5_ = jnp.where(pos, 23500.0 * Xep ** 0.955, 0.0)
            t6_ = jnp.where(pos, 10700.0 * Xep ** 0.907, 0.0)
            t7_ = jnp.where(pos, 7.09 * Xep ** 0.779, 0.0)
            t8_ = jnp.where(pos, 6.88 * Xep ** 0.802, 0.0)
            eta_H = 1.0 - (1.0 - 0.117) / (1.0 + t2_)
            eta_H2 = 1.0 - (1.0 - 0.055) / (1.0 + t3_)
            fH2 = X_H2 / jnp.maximum(X_H2 + X_HI, TINY)
            Q_el_rot = 37.0 * (X_HI * eta_H + X_H2 * eta_H2) \
                / jnp.maximum(X_HI + X_H2, TINY)
            Q_diss = 2.14 * fH2 / (1.0 + t4_)
            eps1 = 7.81 * (1.0 + t5_)
            eps2 = 109.0 * (1.0 + t6_)
            Q_dirvib = 19.0 * fH2 * (1.0 / eps1 + 2.0 / eps2)
            epsB = 117.0 * (1.0 + t7_)
            epsC = 132.0 * (1.0 + t8_)
            Q_BCvib = 147.0 * fH2 * (1.0 / epsB + 1.0 / epsC)
            denom = gam1 * X_HI + gam2 * X_H2
            n_crit = jnp.where(denom > 0, 2e-7 / jnp.maximum(denom, TINY), jnp.inf)
            Q_vib = jnp.where(denom > 0,
                              n / (n + n_crit) * (Q_dirvib + Q_BCvib), 0.0)
            h_xray = env.zeta_Xray_H2 * n * c.eV2erg * (Q_el_rot + Q_diss + Q_vib)
        else:
            h_xray = jnp.zeros(())

        # 10. viscous (alpha-disk)
        rho = n * c.mProton_CGS * tenv.MeanMolWeight
        c2 = c.kBoltzmann_CGS * Tpos / (c.mProton_CGS * tenv.MeanMolWeight)
        if cfg.use_fixed_alpha_visc:
            alpha = tenv.alpha_viscosity
        else:
            # ambipolar-diffusion-modulated MRI alpha from the current ion
            # fraction (reference src/disk.f90:3391-3427,4737; the 2e-9
            # ion-neutral collision beta is src/disk.f90:191)
            ysp = y[:self.net.n_species]
            ion = jnp.sum(jnp.where(ysp >= 1e-30, ysp, 0.0)
                          * self.pos_charge)
            am = n * ion * 2e-9 / jnp.maximum(tenv.omega_Kepler, TINY)
            la = jnp.log(jnp.maximum(am, 1e-20))
            fmri = 0.5 / jnp.sqrt(2500.0 * jnp.exp(-2.4 * la)
                                  + (8.0 * jnp.exp(-0.3 * la) + 1.0) ** 2)
            alpha = jnp.where(am <= 1e-20, 0.0, fmri) * tenv.alpha_viscosity
        h_visc = jnp.where(
            T > 0,
            2.25 * alpha * rho * c2 * tenv.omega_Kepler
            * _pos(1.0 - T / 2e4),
            0.0)

        # 11. chemical reaction heat
        if cfg.use_chemicalheatingcooling and k is not None \
                and self.heat_idx.shape[0] > 0:
            kr = k[self.heat_idx]
            h_chem = jnp.sum(kr * y[self.heat_reac1] * y[self.heat_reac2]
                             * self.heat_val)
            h_chem = jnp.where(T > 0,
                               h_chem * n / c.SecondsPerYear
                               * cfg.heating_eff_chem, 0.0)
        else:
            h_chem = jnp.zeros(())

        # ---- cooling ----
        # 1. photoelectric recombination (Bakes 1994 eq 44)
        t0l = jnp.log(Tpos)
        c_pe = jnp.where(
            (X_E > 0) & (T > 0) & (tmp > 0),
            tenv.PAH_abundance / c.PAH_abundance_0 * 3.49e-30
            * _exp(0.944 * t0l)
            * _exp(0.735 * _exp(-0.068 * t0l) * jnp.log(jnp.maximum(tmp, TINY)))
            * n_e * n,
            0.0)

        # 2. H2 vibrational
        A10, D1 = 8.6e-7, 2.6e-11
        c_vibH2 = jnp.where(
            T > 0,
            8.26e-13 * gamma_10 * _exp(-5988.0 / Tpos) * (n * n * X_H2)
            * (A10 + chi_h2 * D1) / (gamma_10 * n + A10 + chi_h2 * D1),
            0.0)

        # 3. gas-grain collisions (per dust component, reference
        #    "my own formula" path, heating_cooling.f90:758-786)
        f_a = cfg.cooling_gg_coeff
        cs_H = jnp.sqrt((8.0 / jnp.pi * c.kBoltzmann_CGS / c.mProton_CGS) * Tpos)
        cs_H2 = cs_H / jnp.sqrt(2.0)
        base = 2.0 * c.kBoltzmann_CGS * f_a * n * (
            cs_H * (X_HI + X_Hplus) + cs_H2 * X_H2)
        coeff_i = base * tenv.sig_dusts * tenv.n_dusts
        if cfg.allow_gas_dust_en_exch and cfg.tdust_iter_tandem \
                and self.tdust_lut is not None:
            Td_i = self._tandem_tdusts(Tpos, coeff_i, tenv)
        else:
            Td_i = tenv.Tdusts
        dT_i = T - Td_i
        if cfg.dust_gas_linear_couple and self.tdust_lut is not None:
            # damp the gas-dust temperature difference by how fast dust
            # emission responds (reference heating_cooling.f90:775-777
            # with dEmit_dTd from src/disk.f90:4550-4562; here the slope
            # comes directly from the Tdust LUT instead of an FD on the
            # operating point — same quantity, no statefulness)
            demit = self._demit_dtd(Td_i, tenv)
            dT_i = dT_i * demit / jnp.maximum(demit + coeff_i, TINY)
        # the inf sentinel ("unlimited dust heating budget") must not
        # enter arithmetic: inf/const is NaN under the TPU backend's
        # extended-precision f64 emulation
        eg_fin = jnp.isfinite(tenv.en_gains)
        eg = jnp.where(eg_fin, tenv.en_gains, 0.0)
        clamp = jnp.where(
            eg_fin,
            -FRAC_DUST_LOSE_EN * (eg / c.AU2cm ** 3)
            / jnp.maximum(tenv.volume, TINY),
            -1e30)
        en_ex = jnp.maximum(coeff_i * dT_i, clamp)
        c_gg = jnp.where(T > 0, jnp.sum(en_ex), 0.0)

        # 4. OI fine structure + 6300A (Rollig 2006 A.5/A.6, Tielens 2.69)
        Ncol_min = jnp.minimum(jnp.minimum(env.Ncol_toISM, tenv.Ncol_toStar),
                               n * tenv.coherent_length)
        Z_O = X_OI / 3.2e-4
        from ..utils.planck import tau2beta
        beta63 = tau2beta(Ncol_min * Z_O / 4.9e20)
        beta146 = tau2beta(Ncol_min * Z_O / 3.7e20)
        t2o = Tpos ** 0.45
        t3o = Tpos ** 0.66
        # normalized by n (u1,u2) and n^2 (tmp5n): the raw reference
        # expression's intermediates (n^3 * exp(98/T) etc.) exceed the
        # f32 exponent range of the TPU backend's f64 emulation at
        # midplane densities and turn into inf/inf = NaN; algebraically
        # identical to heating_cooling.f90:936-1026
        u1 = 1.0 + beta63 * 1.66e-5 / (1.35e-11 * t2o * n)
        u2 = 1.0 + beta146 * 8.46e-5 / (4.37e-12 * t3o * n)
        tmp3 = _exp(98.0 / Tpos)
        tmp4 = _exp(228.0 / Tpos)
        tmp5n = 1.0 + tmp3 * u1 * (3.0 + tmp4 * 5.0 * u2)
        cool_63 = 3.15e-14 * 8.46e-5 * beta63 * Z_O * 3.2e-4 * n * tmp3 \
            * 3.0 * u1 / tmp5n
        cool_146 = 1.35e-14 * 1.66e-5 * beta146 * Z_O * 3.2e-4 * n / tmp5n
        n_cr_E = 1.3e6 * (Tpos / 1e4) ** (-0.58)
        # 6.63e-34 (SI Planck constant) reproduced verbatim from the
        # reference (heating_cooling.f90:986 uses phy_hPlanck_SI)
        cool_6300 = 6.62606896e-34 * 4.7e14 * (6.5e-3 + 2.1e-3) * X_OI * (
            X_E / n_cr_E + X_HI / 6.6e9) * n * n
        c_oi = jnp.where(T > 0, cool_63 + cool_146 + cool_6300, 0.0)

        # 5. CII 158 um (Rollig 2006 A.2)
        Z_C = X_CII / 1.4e-4
        beta158 = tau2beta(Ncol_min * Z_C / 6.5e20)
        c_cii = jnp.where(
            T > 0,
            4.04e-24 * n * Z_C * beta158
            / (1.0 + 0.5 * _exp(92.0 / Tpos) * (1.0 + 2600.0 * beta158 / n)),
            0.0)

        # 6-10. Neufeld LVG molecular cooling
        vturb_kms = tenv.velo_width_turb * 1e-5

        def log10N_of(n_M):
            return jnp.log10(jnp.maximum(jnp.minimum(
                tenv.Neufeld_G * n_M / (tenv.Neufeld_dv_dz + TINY),
                n_M * env.Ncol_toISM / n / (9.0 * vturb_kms)), TINY))

        n_H2 = n * X_H2

        def rot_cool(p: tables.NeufeldParams, n_M):
            L0 = p.L0 + TINY
            L_LTE = p.L_LTE + TINY
            n12 = p.n_12 + TINY
            t1_ = (n_H2 / n12) ** p.alpha
            denom = 1.0 / L0 + n_H2 / L_LTE \
                + 1.0 / L0 * t1_ * (1.0 - n12 * L0 / L_LTE)
            return n_H2 * n_M / denom

        n_h2o = n * X_H2O
        p = self.neufeld_h2o.params(Tpos, log10N_of(n_h2o))
        c_h2o_rot = jnp.where((X_H2O > 0) & (X_H2 > 0) & (T > 0),
                              rot_cool(p, n_h2o), 0.0)
        L0v, LTEv = self.neufeld_h2o.vib_params(Tpos, log10N_of(n_h2o))
        c_h2o_vib = jnp.where(
            (X_H2O > 0) & (X_H2 > 0) & (T > 0),
            n_H2 * n_h2o / (1.0 / (L0v + TINY) + n_H2 / (LTEv + TINY)), 0.0)

        n_co = n * X_CO
        p = self.neufeld_co.params(Tpos, log10N_of(n_co))
        c_co_rot = jnp.where((X_CO > 0) & (X_H2 > 0) & (T > 0),
                             rot_cool(p, n_co), 0.0)
        L0v, LTEv = self.neufeld_co.vib_params(Tpos, log10N_of(n_co))
        c_co_vib = jnp.where(
            (X_CO > 0) & (X_H2 > 0) & (T > 0),
            n_H2 * n_co / (1.0 / (L0v + TINY) + n_H2 / (LTEv + TINY)), 0.0)

        # the exp(-509/T) Boltzmann factor is factored OUT of the
        # 1/L0 division chain (C = boltz * n^2 / D with D built from the
        # unsuppressed L values): the suppressed L0/L_LTE underflow the
        # TPU backend's f32-exponent f64 emulation at low T and the
        # chain becomes 0/0 (see NeufeldH2.params_scaled)
        ph2, h2_boltz = self.neufeld_h2.params_scaled(Tpos)
        L0 = ph2.L0 + TINY
        L_LTE = ph2.L_LTE + TINY
        t1h2 = jnp.where(ph2.alpha > 0,
                         (n_H2 / ph2.n_12) ** ph2.alpha
                         * (1.0 - ph2.n_12 * L0 / L_LTE) / L0,
                         0.0)
        c_h2_rot = jnp.where(
            (X_H2 > 0) & (T > 0),
            h2_boltz * n_H2 * n_H2
            / (1.0 / L0 + n_H2 / L_LTE + t1h2), 0.0)

        # 11. Lyman-alpha (collisional excitation of H)
        c_lya = jnp.where(T > 0, 7.3e-19 * n * n * X_HI * X_E
                          * _exp(-118400.0 / Tpos), 0.0)

        # 12. free-bound (Draine 2011 eq 14.5/27.22-23)
        T4l = jnp.log(Tpos / 1e4)
        alpha_A = 4.13e-13 * _exp(T4l * (-0.7131 - 0.0115 * T4l))
        c_fb = jnp.where(
            T > 0,
            (n * X_E) * (n * X_Hplus) * alpha_A
            * (0.787 - 0.0230 * T4l) * c.kBoltzmann_CGS * Tpos, 0.0)

        # 13. free-free
        c_ff = jnp.where(
            T > 0,
            1.4e-27 * jnp.sqrt(Tpos) * 1.3 * (n * X_E)
            * (n * (X_Hplus + X_Heplus)), 0.0)

        # 14-16. NII / SiII / FeII from (ne, T) lookup tables
        def ion_cool(lut, Xion):
            ok = (Xion > 1e-15) & (X_E > 0) & (T > 0)
            return jnp.where(ok, Xion * n * lut.cooling_per_ion(n_e, Tpos), 0.0)

        c_nii = ion_cool(self.lut_NII, X_NII)
        c_siii = ion_cool(self.lut_SiII, X_SiII)
        c_feii = ion_cool(self.lut_FeII, X_FeII)

        # 17. OH rotational (Gorti 2004 appendix D)
        A0, E0, sig_oh, eta = 7.6e-4, 5.4, 8e-16, 10.0
        N_OH = X_OH * n * tenv.coherent_length
        N_tau = 1.18e7 * vturb_kms * E0 ** 3 / A0
        tau_oh = 4.0 * N_OH / N_tau / (eta * Tpos / E0)
        ctau = tau_oh * jnp.sqrt(
            2.0 * jnp.pi * jnp.log(2.13 + (tau_oh / jnp.e) ** 2))
        v_T = jnp.sqrt((8.0 / jnp.pi * c.kBoltzmann_CGS / c.mProton_CGS) * Tpos)
        tmp_oh = 4.0 * (Tpos / E0) * A0 / (
            n * jnp.maximum(1.0 - X_H2, TINY) * sig_oh * v_T)
        ym = jnp.log(1.0 + ctau / (1.0 + 10.0 * tmp_oh))
        tmp1_oh = (2.0 + ym + 0.6 * ym ** 2) \
            / (1.0 + ctau + tmp_oh + 1.5 * jnp.sqrt(tmp_oh))
        L_oh = 2.0 * c.kBoltzmann_CGS * Tpos ** 2 * A0 / E0 * tmp1_oh
        c_oh = jnp.where((X_OH > 0) & (X_H2 >= 0) & (X_H2 < 1.0) & (T > 0),
                         L_oh * n * X_OH, 0.0)

        if not cfg.use_analytical_CII_OI:
            raise NotImplementedError(
                "NLTE CII/OI cooling inside the RHS is replaced by the "
                "analytic path; use ops/stateq for NLTE level populations")

        return HeatingCoolingRates(
            heating_photoelectric=h_pe, heating_formation_H2=h_h2form,
            heating_cosmic_ray=h_cr, heating_vibrational_H2=h_vibH2,
            heating_ionization_CI=h_ci, heating_photodissociation_H2=h_phd_h2,
            heating_photodissociation_H2O=h_phd_h2o,
            heating_photodissociation_OH=h_phd_oh, heating_Xray=h_xray,
            heating_viscosity=h_visc, heating_chem=h_chem,
            cooling_photoelectric=c_pe, cooling_vibrational_H2=c_vibH2,
            cooling_gas_grain=c_gg, cooling_OI=c_oi, cooling_CII=c_cii,
            cooling_H2O_rot=c_h2o_rot, cooling_H2O_vib=c_h2o_vib,
            cooling_CO_rot=c_co_rot, cooling_CO_vib=c_co_vib,
            cooling_H2_rot=c_h2_rot, cooling_LymanAlpha=c_lya,
            cooling_free_bound=c_fb, cooling_free_free=c_ff,
            cooling_NII=c_nii, cooling_SiII=c_siii, cooling_FeII=c_feii,
            cooling_OH_rot=c_oh)

    def net_rate(self, y, Tgas, env, tenv, k=None):
        """Gamma - Lambda [erg cm^-3 s^-1]."""
        return self.rates(y, Tgas, env, tenv, k).net()

    def solve_equilibrium_T(self, y, env, tenv, T0, tab: RateTables,
                            n_expand=60, n_bisect=80, rtol=1e-5, atol=1e-1,
                            diff2des=0.5, h2_form_use_moeq=False):
        """Equilibrium Tgas from Gamma(T) = Lambda(T) by bracketed bisection.

        Jittable/vmappable replacement for the reference ``solve_bisect_T``
        (src/heating_cooling.f90:1273-1403): expand a bracket around T0
        until the net rate changes sign, then bisect.  Returns (T,
        converged).
        """
        import jax

        from .rates import compute_rates

        def fnet(T):
            k = compute_rates(tab, env, T, diff2des, h2_form_use_moeq)
            yT = y.at[-1].set(T) if y.shape[0] == self.net.n_species + 1 else y
            return self.net_rate(yT, T, env, tenv, k)

        x1 = T0 / 1.1
        x2 = T0 * 1.1
        f1 = fnet(x1)
        f2 = fnet(x2)

        def expand_body(st):
            x1, x2, f1, f2, i = st
            move1 = jnp.abs(f1) < jnp.abs(f2)
            x1n = jnp.where(move1, jnp.maximum(1.0, x1 + 0.5 * (x1 - x2)), x1)
            x2n = jnp.where(move1, x2, jnp.maximum(1.0, x2 + 0.5 * (x2 - x1)))
            f1n = jnp.where(move1, fnet(x1n), f1)
            f2n = jnp.where(move1, f2, fnet(x2n))
            return (x1n, x2n, f1n, f2n, i + 1)

        def expand_cond(st):
            x1, x2, f1, f2, i = st
            return (f1 * f2 > 0.0) & (i < n_expand)

        x1, x2, f1, f2, _ = jax.lax.while_loop(
            expand_cond, expand_body, (x1, x2, f1, f2, 0))
        bracketed = f1 * f2 <= 0.0

        def bisect_body(st):
            x1, x2, f1, f2, i = st
            xm = 0.5 * (x1 + x2)
            fm = fnet(xm)
            lo = fm * f1 < 0.0
            x1n = jnp.where(lo, x1, xm)
            f1n = jnp.where(lo, f1, fm)
            x2n = jnp.where(lo, xm, x2)
            f2n = jnp.where(lo, fm, f2)
            return (x1n, x2n, f1n, f2n, i + 1)

        def bisect_cond(st):
            x1, x2, f1, f2, i = st
            return ((x2 - x1) > (rtol * 0.5 * (x1 + x2) + atol)) \
                & (i < n_bisect)

        x1, x2, f1, f2, _ = jax.lax.while_loop(
            bisect_cond, bisect_body, (x1, x2, f1, f2, 0))
        T = 0.5 * (x1 + x2)
        return jnp.where(bracketed, T, T0), bracketed

    def dTdt(self, y, T, env, tenv, k):
        """dT/dt [K/yr] given a precomputed rate vector k (reference
        realtime_heating_cooling_rate, disk.f90:4664-4741; the K/yr
        conversion is disk.f90:4739)."""
        net = self.net_rate(y, T, env, tenv, k)
        return net * c.SecondsPerYear / (env.n_gas * c.kBoltzmann_CGS)

    def make_thermal_fn(self, tab: RateTables, diff2des=0.5,
                        h2_form_use_moeq=False):
        """dT/dt closure [K/yr] recomputing rates internally (standalone
        use; the ODE system passes k explicitly via dTdt)."""
        from .rates import compute_rates

        def thermal_fn(y, env, tenv):
            T = y[-1]
            k = compute_rates(tab, env, T, diff2des, h2_form_use_moeq)
            return self.dTdt(y, T, env, tenv, k)

        return thermal_fn
