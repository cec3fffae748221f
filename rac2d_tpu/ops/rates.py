"""Vectorized reaction-rate coefficients.

TPU-native rebuild of the reference's per-reaction rate loop
(reference: src/chemistry.f90:591-966 ``chem_cal_rates``).  The reference
iterates over ~5830 reactions with a select-case per reaction; here every
itype's formula is evaluated for all its reactions at once as masked vector
ops on [n_reactions] arrays, with all per-reaction discrete decisions
(which reactant is the ion, H2 special-casing, self-shielding species,
duplicate groups) resolved host-side into static index arrays by
:func:`build_rate_tables`.

The result k[i] is in yr^-1 (1-body) or yr^-1 per unit fractional abundance
(2-body, already multiplied by n_gas), exactly like the reference
(src/chemistry.f90:936-942).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as c
from ..io.umist import ChemNet, COSMICRAY_INTENSITY_0, \
    COSMIC_DESORP_PREFACTOR, COSMIC_DESORP_GRAIN_T


class CellEnv(NamedTuple):
    """Per-cell physical environment entering the rate formulas.

    Mirrors the fields of the reference's ``chem_params``
    (type_cell_rz_phy_basic, src/data_struct.f90:316-442) that
    ``chem_cal_rates`` actually reads.  All entries are scalars for one
    cell; batch by vmap or by passing [n_cells] arrays.
    """
    Tgas: jnp.ndarray
    Tdust: jnp.ndarray
    n_gas: jnp.ndarray
    zeta_cosmicray_H2: jnp.ndarray
    zeta_Xray_H2: jnp.ndarray
    Ncol_toISM: jnp.ndarray
    Av_toISM: jnp.ndarray
    Av_toStar: jnp.ndarray
    G0_UV_toISM: jnp.ndarray
    G0_UV_toStar: jnp.ndarray
    G0_UV_H2phd: jnp.ndarray
    G0_UV_toStar_photoDesorb: jnp.ndarray
    phflux_Lya: jnp.ndarray
    omega_albedo: jnp.ndarray
    # self-shielding factors, order [none, H2, CO, H2O, OH]
    f_selfshielding_toISM: jnp.ndarray    # [5]
    f_selfshielding_toStar: jnp.ndarray   # [5]
    GrainRadius_CGS: jnp.ndarray
    sigdust_ave: jnp.ndarray
    ndust_tot: jnp.ndarray
    ratioDust2HnucNum: jnp.ndarray
    SitesPerGrain: jnp.ndarray

    @staticmethod
    def default(**kw):
        """A neutral single-cell environment; override fields via kw."""
        d = dict(
            Tgas=10.0, Tdust=10.0, n_gas=1e5,
            zeta_cosmicray_H2=1.36e-17, zeta_Xray_H2=0.0,
            Ncol_toISM=0.0, Av_toISM=10.0, Av_toStar=10.0,
            G0_UV_toISM=1.0, G0_UV_toStar=0.0, G0_UV_H2phd=0.0,
            G0_UV_toStar_photoDesorb=0.0, phflux_Lya=0.0,
            omega_albedo=0.5,
            f_selfshielding_toISM=jnp.ones(5),
            f_selfshielding_toStar=jnp.ones(5),
            GrainRadius_CGS=1e-5, sigdust_ave=jnp.pi * 1e-10,
            ndust_tot=1e5 * 2.8 * c.mProton_CGS * 0.01
            / (4.0 / 3.0 * jnp.pi * 1e-15 * 2.0),
            ratioDust2HnucNum=0.0, SitesPerGrain=4e5,
        )
        d.update(kw)
        if "ratioDust2HnucNum" not in kw:
            d["ratioDust2HnucNum"] = d["ndust_tot"] / d["n_gas"]
        return CellEnv(**{k: jnp.asarray(v, dtype=jnp.float64)
                          for k, v in d.items()})


class RateTables(NamedTuple):
    """Static per-reaction data for rate evaluation (device arrays)."""
    abc: jnp.ndarray           # [nR, 3]
    T_range: jnp.ndarray       # [nR, 2]
    itype: jnp.ndarray         # [nR]
    # masks / codes
    is_two_body_gas: jnp.ndarray   # [nR] bool: n_reac==2 and itype<60
    shield_code: jnp.ndarray       # [nR] 0 none, 1 H2, 2 CO, 3 H2O, 4 OH
    is_H2_photo: jnp.ndarray       # [nR] bool (itype 3 with reac1 == H2)
    ion_mass: jnp.ndarray          # [nR] mass of non-grain reactant (itype 21)
    ion_neg_posi: jnp.ndarray      # [nR] bool: charge product == -1 (itype 21)
    mass1: jnp.ndarray             # [nR] mass_num of reac1
    vib1: jnp.ndarray              # [nR] vib freq of reac1 (0 where undef)
    edes1: jnp.ndarray             # [nR] Edesorb of reac1
    vib2: jnp.ndarray              # [nR]
    edes2: jnp.ndarray             # [nR]
    mass2: jnp.ndarray             # [nR]
    is_gH_63: jnp.ndarray          # [nR] bool: itype 63 with reac1 == gH
    i_desorb_gH: int               # reaction index of gH desorption (-1 if none)
    i_adsorb_H: int                # reaction index of H adsorption (-1 if none)
    dupli_group: jnp.ndarray       # [nR] (-1 no group)
    n_dupli_groups: int
    reac1: jnp.ndarray             # [nR] species idx (clipped >= 0)
    reac2: jnp.ndarray


SHIELD_SPECIES = {"H2": 1, "CO": 2, "H2O": 3, "OH": 4}

# The reference's chem_cal_rates does NOT clamp exp() arguments (f64 exp
# underflows to 0 gracefully); phy_max_exp=222 is only used elsewhere.
# Clamp below at the true f64 underflow limit (exp(-745) ~ 5e-324) so the
# result is bit-compatible with unclamped f64 exp, and above at +222 as an
# overflow guard for insane inputs.
_EXP_LO = -745.0


def _exp(x):
    return jnp.exp(jnp.clip(x, _EXP_LO, c.max_exp))


def build_rate_tables(net: ChemNet) -> RateTables:
    nR = net.n_reactions
    itype = net.itype
    is_two_body_gas = (net.n_reac == 2) & (itype < 60)

    shield_code = np.zeros(nR, dtype=np.int64)
    is_H2_photo = np.zeros(nR, dtype=bool)
    for i in range(nR):
        # self-shielding applies only to photo (PH) / Lyman-alpha (LA)
        # reactions (reference src/chemistry.f90:1007-1063)
        if net.ctype[i] in ("PH", "LA"):
            name = net.species[net.reac[i, 0]] if net.reac[i, 0] >= 0 else ""
            shield_code[i] = SHIELD_SPECIES.get(name, 0)
        if itype[i] == 3 and net.reac[i, 0] >= 0 \
                and net.species[net.reac[i, 0]] == "H2":
            is_H2_photo[i] = True

    # itype 21: which reactant is the ion/neutral (non-grain) partner
    ion_mass = np.zeros(nR)
    ion_neg_posi = np.zeros(nR, dtype=bool)
    for i in range(nR):
        if itype[i] != 21:
            continue
        id1, id2 = net.reac[i, 0], net.reac[i, 1]
        if net.elements[id1, 2] == 0:
            id3 = id1
        elif net.elements[id2, 2] == 0:
            id3 = id2
        else:
            raise ValueError(f"type-21 reaction {i} has no non-grain reactant")
        ion_mass[i] = net.mass_num[id3]
        ch = net.elements[id1, 0] * net.elements[id2, 0]
        if ch == -1:
            ion_neg_posi[i] = True
        elif ch != 0:
            raise ValueError(f"type-21 reaction {i} charge problem")

    r1 = np.clip(net.reac[:, 0], 0, None)
    r2 = np.clip(net.reac[:, 1], 0, None)
    mass1 = net.mass_num[r1]
    mass2 = net.mass_num[r2]
    vib1 = np.nan_to_num(net.vib_freq[r1])
    edes1 = np.nan_to_num(net.Edesorb[r1])
    vib2 = np.nan_to_num(net.vib_freq[r2])
    edes2 = np.nan_to_num(net.Edesorb[r2])

    i_gH = net.idx.get("gH", -1)
    is_gH_63 = (itype == 63) & (net.reac[:, 0] == i_gH)
    i_H = net.idx.get("H", -1)
    i_desorb_gH = -1
    i_adsorb_H = -1
    for i in range(nR):
        if itype[i] == 62 and net.reac[i, 0] == i_gH:
            i_desorb_gH = i
        if itype[i] == 61 and net.reac[i, 0] == i_H:
            i_adsorb_H = i

    f = lambda a: jnp.asarray(a)
    return RateTables(
        abc=f(net.abc), T_range=f(net.T_range), itype=f(itype),
        is_two_body_gas=f(is_two_body_gas), shield_code=f(shield_code),
        is_H2_photo=f(is_H2_photo), ion_mass=f(ion_mass),
        ion_neg_posi=f(ion_neg_posi), mass1=f(mass1), vib1=f(vib1),
        edes1=f(edes1), vib2=f(vib2), edes2=f(edes2), mass2=f(mass2),
        is_gH_63=f(is_gH_63), i_desorb_gH=int(i_desorb_gH),
        i_adsorb_H=int(i_adsorb_H), dupli_group=f(net.dupli_group),
        n_dupli_groups=int(net.dupli_group.max()) + 1,
        reac1=f(r1), reac2=f(r2),
    )


def _sticking_coeff(mass_num, T):
    """Chaabouni 2012-style sticking coefficient.

    Reference src/chemistry.f90:1068-1086 (``getStickingCoeff``):
    S = S0 (1 + beta r) / (1 + r)^beta with beta=2.5, r = T / (m * T0_H),
    T0_H = (52 + 25) / 2.
    """
    T0 = mass_num * 38.5
    r = T / T0
    return (1.0 + 2.5 * r) / ((1.0 + r) ** 2 * jnp.sqrt(1.0 + r))


def _mobility(vibfreq, mass_num, Edesorb, Tdust, diff2des):
    """Surface hopping rate: thermal hop or tunneling, whichever is faster.

    Reference src/chemistry.f90:1542-1568 (``getMobility``); barrier width
    1 Angstrom.
    """
    tunnel = -2e-8 / c.hbarPlanck_CGS * jnp.sqrt(
        2.0 * mass_num * (c.mProton_CGS * c.kBoltzmann_CGS * diff2des)
        * jnp.maximum(Edesorb, 0.0))
    arg = jnp.maximum(-Edesorb * diff2des / Tdust, tunnel)
    out = vibfreq * jnp.exp(jnp.clip(arg, _EXP_LO, 0.0))
    return jnp.nan_to_num(out)


def _branching_ratio(abc, T_range, Tdust):
    """Reaction-barrier branching ratio with tunneling.

    Reference src/chemistry.f90:1571-1590 (``getBranchingRatio``):
    ABC(1)=prefactor, ABC(2)=barrier width in Angstrom, ABC(3)=barrier K,
    T_range(1) stores the reduced mass for these surface reactions.
    """
    A, B, C0 = abc[:, 0], abc[:, 1], abc[:, 2]
    tunnel = -2.0 * B * 1e-8 / c.hbarPlanck_CGS * jnp.sqrt(
        2.0 * T_range[:, 0] * c.mProton_CGS * c.kBoltzmann_CGS
        * jnp.maximum(C0, 0.0))
    arg = jnp.maximum(-C0 / Tdust, tunnel)
    br = jnp.where(C0 != 0.0, A * jnp.exp(jnp.clip(arg, _EXP_LO, 0.0)), A)
    return jnp.nan_to_num(br)


def _dupli_select(k, d_endpoint, group, n_groups):
    """Winner-takes-all inside each duplicate-reaction group.

    Reference src/chemistry.f90:944-964: among duplicated reactions only the
    one whose T_range endpoint lies closest to the current Tgas keeps its
    rate; ties resolve to the earliest reaction.
    """
    if n_groups == 0:
        return k
    nR = k.shape[0]
    idx = jnp.arange(nR)
    seg = jnp.where(group >= 0, group, n_groups)  # dump ungrouped
    dmin = jax.ops.segment_min(d_endpoint, seg, num_segments=n_groups + 1)
    is_min = (group >= 0) & (d_endpoint == dmin[seg])
    cand_idx = jnp.where(is_min, idx, nR)
    winner_idx = jax.ops.segment_min(cand_idx, seg, num_segments=n_groups + 1)
    keep = (group < 0) | (idx == winner_idx[seg])
    return jnp.where(keep, k, 0.0)


# Precision of the rate-formula evaluation.  f32 was tried for the TPU
# (where f64 exp/pow are software-emulated) but the network's dynamic
# range genuinely exceeds f32: negative-barrier reactions clamped to
# their T_range produce exp arguments up to +222 (k ~ 1e90), and
# borderline ice-desorption rates live at 1e-32..1e-35 /yr — both outside
# f32.  Keep f64; the fixed-temperature solve path avoids the cost by
# computing k once per solve (see odesys.ChemicalODE.solve_batched).
RATES_DTYPE = "f64"


def _rates_dtype():
    return jnp.float32 if RATES_DTYPE == "f32" else jnp.float64


def compute_rates(tab: RateTables, env: CellEnv, Tgas, diff2des=0.5,
                  h2_form_use_moeq: bool = False,
                  dtype=None) -> jnp.ndarray:
    """Rate coefficient vector k[nR] for one cell at gas temperature Tgas.

    Pure function of (tables, environment, T); jit/vmap-friendly.  The
    formulas follow reference src/chemistry.f90:591-966 case by case.
    Returns f64; intermediate transcendentals run in `dtype`
    (default: _rates_dtype()).
    """
    dt = dtype or _rates_dtype()
    if dt == jnp.float32:
        cast = lambda a: a.astype(jnp.float32) \
            if jnp.issubdtype(a.dtype, jnp.floating) else a
        tab = jax.tree.map(lambda a: cast(a)
                           if isinstance(a, jnp.ndarray) else a, tab)
        env = jax.tree.map(cast, env)
        Tgas = jnp.asarray(Tgas).astype(jnp.float32)
        diff2des = jnp.float32(diff2des)
    T = jnp.maximum(Tgas, 1e-30)
    Td = jnp.maximum(env.Tdust, 1e-30)
    A, B, C0 = tab.abc[:, 0], tab.abc[:, 1], tab.abc[:, 2]
    Tl, Tu = tab.T_range[:, 0], tab.T_range[:, 1]
    it = tab.itype
    T300 = T / 300.0

    def arrh(Te):
        return A * (Te / 300.0) ** B * _exp(-C0 / Te)

    # Pagani 2009 Coulomb-focusing factors (reference :603-620)
    Tred = c.kBoltzmann_SI * T / (
        c.elementaryCharge_SI ** 2 * 8.9875517873681764e9
        / (env.GrainRadius_CGS * 1e-2))
    JNegaPosi = (1.0 + 1.0 / Tred) * (1.0 + jnp.sqrt(2.0 / (2.0 + Tred)))
    JChargeNeut = 1.0 + jnp.sqrt(jnp.pi / 2.0 / Tred)

    sig_dust = env.sigdust_ave
    cr_rel = env.zeta_cosmicray_H2 / COSMICRAY_INTENSITY_0 * jnp.exp(
        -env.Ncol_toISM / c.cosmicray_attenuate_N)
    xr_rel = env.zeta_Xray_H2 / COSMICRAY_INTENSITY_0

    # --- itype 5: modified Arrhenius with T-range clamping for C<0 ---
    Tc = jnp.where(C0 < 0.0,
                   jnp.where(Tl > T, Tl, jnp.where(Tu < T, Tu, T)), T)
    k5 = A * (Tc / 300.0) ** B * _exp(-C0 / Tc)

    # --- itype 6: strict T range ---
    k6 = jnp.where((Tl > T) | (Tu < T), 0.0, arrh(T))

    # --- itype 1 / 2,20 (cosmic-ray) ---
    k1 = A * (cr_rel + xr_rel)
    k2 = A * (C0 / (1.0 - env.omega_albedo) * cr_rel + xr_rel)

    # --- itype 3: photo-reactions ---
    fss_ism = env.f_selfshielding_toISM[tab.shield_code]
    fss_star = env.f_selfshielding_toStar[tab.shield_code]
    term_ism = env.G0_UV_toISM * _exp(-C0 * env.Av_toISM) * fss_ism
    term_star = jnp.where(
        tab.is_H2_photo,
        env.G0_UV_H2phd * fss_star,
        env.G0_UV_toStar * _exp(-C0 * env.Av_toStar) * fss_star)
    k3 = A * (term_ism + term_star)

    # --- itype 13: Lyman-alpha driven ---
    k13 = env.phflux_Lya * A * fss_star

    # --- itype 21: ion/neutral + grain ---
    vth21 = jnp.sqrt(8.0 * c.kBoltzmann_CGS / jnp.pi * T
                     / (jnp.maximum(tab.ion_mass, 1e-30) * c.mProton_CGS))
    k21 = vth21 * sig_dust * jnp.where(tab.ion_neg_posi, JNegaPosi, JChargeNeut)

    # --- itype 0: parametric H2 formation on grains ---
    stick1 = _sticking_coeff(jnp.maximum(tab.mass1, 1e-30), T)
    vthH = jnp.sqrt(8.0 / jnp.pi * c.kBoltzmann_CGS * T / c.mProton_CGS)
    k0 = 0.5 * stick1 * sig_dust * vthH * env.ratioDust2HnucNum

    # --- itype 61: adsorption ---
    vth1 = jnp.sqrt(8.0 / jnp.pi * c.kBoltzmann_CGS * T
                    / (jnp.maximum(tab.mass1, 1e-30) * c.mProton_CGS))
    k61 = stick1 * A * sig_dust * env.ndust_tot * vth1

    # --- itype 62: thermal + cosmic-ray desorption ---
    kdes = tab.vib1 * (
        _exp(-C0 / Td)
        + COSMIC_DESORP_PREFACTOR * cr_rel
        * jnp.exp(-C0 / COSMIC_DESORP_GRAIN_T))
    # top-layer-only correction (reference :848-851); the uncorrected
    # coefficient is what enters the moment-equation H2 formation.
    k62 = kdes * (env.SitesPerGrain * env.ratioDust2HnucNum)

    # --- itype 63/64: Langmuir-Hinshelwood surface reactions ---
    mob1 = _mobility(tab.vib1, tab.mass1, tab.edes1, Td, diff2des)
    mob2 = _mobility(tab.vib2, tab.mass2, tab.edes2, Td, diff2des)
    br = _branching_ratio(tab.abc, tab.T_range, Td)
    tmp63 = mob1 / env.SitesPerGrain
    k63 = tmp63 / env.ratioDust2HnucNum * br
    if h2_form_use_moeq and tab.i_desorb_gH >= 0 and tab.i_adsorb_H >= 0:
        kdes_gH = kdes[tab.i_desorb_gH]
        kads_H = k61[tab.i_adsorb_H]
        k63_moeq = tmp63 / (tmp63 + kdes_gH) * kads_H / env.ratioDust2HnucNum
        k63 = jnp.where(tab.is_gH_63, k63_moeq, k63)
    k64 = (mob1 + mob2) / (env.SitesPerGrain * env.ratioDust2HnucNum) * br

    # --- itype 75: photodesorption ---
    photoyield = A + B * Td
    k75 = (env.G0_UV_toStar_photoDesorb * c.Habing_photon_flux_CGS
           + env.G0_UV_toISM * c.Habing_photon_flux_CGS
           * _exp(-c.UVext2Av * env.Av_toISM)) \
        * sig_dust * env.ratioDust2HnucNum * photoyield

    k = jnp.zeros_like(A)
    for ityp, kv in ((5, k5), (6, k6), (1, k1), (2, k2), (20, k2), (3, k3),
                     (13, k13), (21, k21), (0, k0), (61, k61), (62, k62),
                     (63, k63), (64, k64), (75, k75)):
        k = jnp.where(it == ityp, kv, k)

    # dust-dependent rates vanish when there is no dust (reference checks
    # sig_dust <= 1e-30 inside cases 0,21,61,62,63(gH),64,75)
    dustless = sig_dust <= 1e-30
    dust_types = (it == 0) | (it == 21) | (it == 61) | (it == 62) \
        | (it == 64) | (it == 75) | (tab.is_gH_63 & h2_form_use_moeq)
    k = jnp.where(dustless & dust_types, 0.0, k)

    # seconds -> years; two-body gas rates scale with n_gas
    k = k * c.SecondsPerYear
    k = jnp.where(tab.is_two_body_gas, k * env.n_gas, k)

    # duplicate-reaction resolution by T-range proximity
    d_end = jnp.minimum(jnp.abs(Tl - T), jnp.abs(Tu - T))
    k = _dupli_select(k, d_end, tab.dupli_group, tab.n_dupli_groups)
    return k.astype(jnp.float64)
