"""Independent plain-numpy chemistry oracle for parity testing.

This module deliberately re-derives the reference's rate formulas and ODE
right-hand side (reference src/chemistry.f90:591-966 ``chem_cal_rates``,
src/disk.f90:4569-4659 ``chem_ode_f``) directly from the parsed network
tables, WITHOUT using any code from rac2d_tpu.ops: rates are vectorized
numpy expressions, the RHS/Jacobian are assembled with per-reaction
``np.add.at`` loops, and integration is scipy's BDF.  Agreement between
this path and rac2d_tpu.ops.{rates,network,odesys,bdf} is the chemistry
parity evidence (expected values do not come from the code under test).
"""

import numpy as np

# pinned to the reference's values (src/sub_global_variables.f90:12-25)
kB = 1.3806503e-16          # erg/K (CGS)
mP = 1.67262158e-24         # g
hbar = 1.054571628e-27      # erg s
kB_SI = 1.3806503e-23
qe_SI = 1.602176487e-19
coulomb_SI = 8.9875517873681764e9
SECONDS_PER_YEAR = 3600.0 * 24.0 * 365.0
CR0 = 1.36e-17
CR_ATTEN_N = 5.75e25        # const_cosmicray_attenuate_N
COS_DESORP_PREFACTOR = 3.16e-19
COS_DESORP_T = 70.0
HABING_PHOTON_FLUX = 6e7
UVEXT2AV = 2.6


def sticking(mass_num, T):
    # Chaabouni 2012 eq 1: S = (1 + 2.5 r) / (1+r)^2.5, r = T/(m*38.5)
    r = T / (mass_num * 0.5 * (52.0 + 25.0))
    return (1.0 + 2.5 * r) / ((1.0 + r) ** 2 * np.sqrt(1.0 + r))


def mobility(vibfreq, mass_num, Edes, Tdust, diff2des):
    a = -Edes * diff2des / Tdust
    b = -2e-8 / hbar * np.sqrt(
        2.0 * mass_num * (mP * kB * diff2des) * np.maximum(Edes, 0.0))
    out = vibfreq * np.exp(np.maximum(a, b))
    return np.nan_to_num(out)


def oracle_rates(net, env, Tgas, diff2des=0.5):
    """k[nR] in yr^-1 (per-X for 2-body), plain numpy.

    env is a dict with the same field meanings as ops.rates.CellEnv.
    """
    nR = net.n_reactions
    T = Tgas
    Td = env["Tdust"]
    A = net.abc[:, 0].copy()
    B = net.abc[:, 1].copy()
    C = net.abc[:, 2].copy()
    Tl = net.T_range[:, 0]
    Tu = net.T_range[:, 1]
    k = np.zeros(nR)

    Tred = kB_SI * T / (qe_SI ** 2 * coulomb_SI / (env["GrainRadius_CGS"] * 1e-2))
    J_np = (1.0 + 1.0 / Tred) * (1.0 + np.sqrt(2.0 / (2.0 + Tred)))
    J_cn = 1.0 + np.sqrt(np.pi / 2.0 / Tred)
    sig = env["sigdust_ave"]
    cr = env["zeta_cosmicray_H2"] / CR0 * np.exp(
        -env.get("Ncol_toISM", 0.0) / CR_ATTEN_N)
    xr = env.get("zeta_Xray_H2", 0.0) / CR0
    fss_ism = env.get("fss_ism", {})     # species name -> factor
    fss_star = env.get("fss_star", {})

    for i in range(nR):
        it = int(net.itype[i])
        r1name = net.species[net.reac[i, 0]] if net.reac[i, 0] >= 0 else ""
        if it == 5:
            Te = T
            if C[i] < 0.0:
                if Tl[i] > T:
                    Te = Tl[i]
                elif Tu[i] < T:
                    Te = Tu[i]
            k[i] = A[i] * (Te / 300.0) ** B[i] * np.exp(-C[i] / Te)
        elif it == 6:
            if Tl[i] <= T <= Tu[i]:
                k[i] = A[i] * (T / 300.0) ** B[i] * np.exp(-C[i] / T)
        elif it == 1:
            k[i] = A[i] * (cr + xr)
        elif it in (2, 20):
            k[i] = A[i] * (C[i] / (1.0 - env["omega_albedo"]) * cr + xr)
        elif it == 3:
            si = fss_ism.get(r1name, 1.0)
            ss = fss_star.get(r1name, 1.0)
            if r1name == "H2":
                k[i] = A[i] * (
                    env["G0_UV_toISM"] * np.exp(-C[i] * env["Av_toISM"]) * si
                    + env["G0_UV_H2phd"] * ss)
            else:
                k[i] = A[i] * (
                    env["G0_UV_toISM"] * np.exp(-C[i] * env["Av_toISM"]) * si
                    + env["G0_UV_toStar"]
                    * np.exp(-C[i] * env["Av_toStar"]) * ss)
        elif it == 13:
            k[i] = env["phflux_Lya"] * A[i] * fss_star.get(r1name, 1.0)
        elif it == 21:
            id1, id2 = net.reac[i, 0], net.reac[i, 1]
            id3 = id1 if net.elements[id1, 2] == 0 else id2
            m = net.mass_num[id3] * mP
            J = J_np if net.elements[id1, 0] * net.elements[id2, 0] == -1 \
                else J_cn
            k[i] = np.sqrt(8.0 * kB / np.pi * T / m) * sig * J
            if sig <= 1e-30:
                k[i] = 0.0
        elif it == 0:
            s = sticking(net.mass_num[net.reac[i, 0]], T)
            v = np.sqrt(8.0 / np.pi * kB * T / mP)
            k[i] = 0.5 * s * sig * v * env["ratioDust2HnucNum"]
            if sig <= 1e-30:
                k[i] = 0.0
        elif it == 61:
            i1 = net.reac[i, 0]
            s = sticking(net.mass_num[i1], T)
            m = net.mass_num[i1] * mP
            k[i] = s * A[i] * sig * env["ndust_tot"] \
                * np.sqrt(8.0 / np.pi * kB * T / m)
            if sig <= 1e-30:
                k[i] = 0.0
        elif it == 62:
            i1 = net.reac[i, 0]
            k[i] = net.vib_freq[i1] * (
                np.exp(-C[i] / Td)
                + COS_DESORP_PREFACTOR * cr * np.exp(-C[i] / COS_DESORP_T))
            if sig <= 1e-30:
                k[i] = 0.0
            k[i] *= env["SitesPerGrain"] * env["ratioDust2HnucNum"]
        elif it in (63, 64):
            i1, i2 = net.reac[i, 0], net.reac[i, 1]
            mob = mobility(net.vib_freq[i1], net.mass_num[i1],
                           net.Edesorb[i1], Td, diff2des)
            if it == 64:
                mob = mob + mobility(net.vib_freq[i2], net.mass_num[i2],
                                     net.Edesorb[i2], Td, diff2des)
            if C[i] != 0.0:
                br = A[i] * np.exp(np.maximum(
                    -C[i] / Td,
                    -2.0 * B[i] * 1e-8 / hbar
                    * np.sqrt(2.0 * Tl[i] * mP * kB * C[i])))
            else:
                br = A[i]
            k[i] = mob / (env["SitesPerGrain"] * env["ratioDust2HnucNum"]) * br
            if it == 63:
                # rate-equation branch (H2_form_use_moeq = False):
                # k = mob/Nsite / D2G * br
                k[i] = mob / env["SitesPerGrain"] \
                    / env["ratioDust2HnucNum"] * br
            if it == 64 and sig <= 1e-30:
                k[i] = 0.0
        elif it == 75:
            py = A[i] + B[i] * Td
            k[i] = (env["G0_UV_toStar_photoDesorb"] * HABING_PHOTON_FLUX
                    + env["G0_UV_toISM"] * HABING_PHOTON_FLUX
                    * np.exp(-UVEXT2AV * env["Av_toISM"])) \
                * sig * env["ratioDust2HnucNum"] * py
            if sig <= 1e-30:
                k[i] = 0.0
        # other itypes: rate 0

    k *= SECONDS_PER_YEAR
    two_body = (net.n_reac == 2) & (net.itype < 60)
    k[two_body] *= env["n_gas"]

    # duplicate resolution: closest T_range endpoint wins (ties -> earlier)
    groups = {}
    for i in range(nR):
        g = int(net.dupli_group[i])
        if g >= 0:
            groups.setdefault(g, []).append(i)
    for g, members in groups.items():
        d = [min(abs(Tl[i] - T), abs(Tu[i] - T)) for i in members]
        winner = members[int(np.argmin(d))]
        for i in members:
            if i != winner:
                k[i] = 0.0
    return k


def oracle_rhs(net, k, y, ratioDust2HnucNum, SitesPerGrain):
    """ydot[nS] with the reference's flux semantics (per-reaction loop)."""
    nS = net.n_species
    ydot = np.zeros(nS)
    nlayer = ratioDust2HnucNum * SitesPerGrain
    for i in range(net.n_reactions):
        it = int(net.itype[i])
        r1 = net.reac[i, 0]
        if it in (5, 6, 21, 64):
            r2 = net.reac[i, 1]
            r = k[i] * y[r1] * y[r2]
            if y[r1] < 0.0 and y[r2] < 0.0:
                r = -r
        elif it in (1, 2, 3, 13, 61, 20, 0):
            r = k[i] * y[r1]
        elif it == 62 or it == 75:
            t1 = nlayer * (net.abc[i, 2] if it == 75 else 1.0)
            if t1 <= 0.0:
                r = k[i]
            else:
                x = y[r1] / t1
                r = k[i] * x if x <= 1e-4 else k[i] * (1.0 - np.exp(-x))
        elif it == 63:
            r = k[i] * y[r1] * y[r1]
            if y[r1] < 0.0:
                r = -r
        else:
            continue
        for j in range(net.n_reac[i]):
            ydot[net.reac[i, j]] -= r
        for j in range(net.n_prod[i]):
            ydot[net.prod[i, j]] += r
    return ydot


def oracle_jac(net, k, y, ratioDust2HnucNum, SitesPerGrain):
    """Dense analytic Jacobian [nS, nS], per-reaction loop."""
    nS = net.n_species
    J = np.zeros((nS, nS))
    nlayer = ratioDust2HnucNum * SitesPerGrain

    for i in range(net.n_reactions):
        it = int(net.itype[i])
        r1 = net.reac[i, 0]
        cols = []
        if it in (5, 6, 21, 64):
            r2 = net.reac[i, 1]
            s = -1.0 if (y[r1] < 0.0 and y[r2] < 0.0) else 1.0
            cols = [(r1, s * k[i] * y[r2]), (r2, s * k[i] * y[r1])]
        elif it in (1, 2, 3, 13, 61, 20, 0):
            cols = [(r1, k[i])]
        elif it == 62 or it == 75:
            t1 = nlayer * (net.abc[i, 2] if it == 75 else 1.0)
            if t1 <= 0.0:
                cols = []
            else:
                x = y[r1] / t1
                d = k[i] / t1 if x <= 1e-4 else k[i] / t1 * np.exp(-x)
                cols = [(r1, d)]
        elif it == 63:
            s = -1.0 if y[r1] < 0.0 else 1.0
            cols = [(r1, s * 2.0 * k[i] * y[r1])]
        else:
            continue
        for col, dval in cols:
            for j in range(net.n_reac[i]):
                J[net.reac[i, j], col] -= dval
            for j in range(net.n_prod[i]):
                J[net.prod[i, j], col] += dval
    return J


def oracle_solve(net, env, y0, Tgas, t_end_yr, rtol=1e-6, atol=1e-25,
                 t_eval=None):
    """scipy BDF integration of the oracle system at fixed temperature."""
    from scipy.integrate import solve_ivp
    k = oracle_rates(net, env, Tgas)
    d2h = env["ratioDust2HnucNum"]
    spg = env["SitesPerGrain"]
    sol = solve_ivp(
        lambda t, y: oracle_rhs(net, k, y, d2h, spg),
        (0.0, t_end_yr), y0, method="BDF",
        jac=lambda t, y: oracle_jac(net, k, y, d2h, spg),
        rtol=rtol, atol=atol, t_eval=t_eval)
    assert sol.success, sol.message
    return sol
