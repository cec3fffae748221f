"""NLTE level populations: LVG / escape-probability statistical equilibrium.

Rebuild of reference src/statistic_equilibrium.f90: the rate system
ydot(f) with escape probability beta(tau) = (1-exp(-3 tau))/(3 tau)
(negative-tau guard :327-340), source-function coupling to the local
continuum (get_cont_alpha :210-250, J_ave = S (1-beta) + J_cont beta),
and collisional terms interpolated on the partner temperature grids.

Instead of the reference's per-cell nested DLSODE relaxation or NLEQ1
damped Newton (vendored F77), the solver here is a batched damped Newton
with the normalization closure row (sum f = 1 replaces the last equation,
reference stat_equili_fcn :256-280), vmapped over all cells at once; the
Jacobian comes from jax.jacfwd of the residual (the systems are <= ~100
levels, so forward-mode is cheap and exact).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as c
from ..io.lamda import Molecule


class MolTables(NamedTuple):
    """Device arrays for one molecule."""
    energy_K: jnp.ndarray
    g: jnp.ndarray
    iup: jnp.ndarray
    ilow: jnp.ndarray
    Aul: jnp.ndarray
    Bul: jnp.ndarray
    Blu: jnp.ndarray
    freq: jnp.ndarray
    lam_A: jnp.ndarray
    # collision data padded to a common T grid count
    p_iup: tuple
    p_ilow: tuple
    p_T: tuple
    p_Cul: tuple
    partner_names: tuple


def build_mol_tables(mol: Molecule) -> MolTables:
    return MolTables(
        energy_K=jnp.asarray(mol.energy_K), g=jnp.asarray(mol.g),
        iup=jnp.asarray(mol.iup), ilow=jnp.asarray(mol.ilow),
        Aul=jnp.asarray(mol.Aul), Bul=jnp.asarray(mol.Bul),
        Blu=jnp.asarray(mol.Blu), freq=jnp.asarray(mol.freq),
        lam_A=jnp.asarray(mol.lam_A),
        p_iup=tuple(jnp.asarray(p.iup) for p in mol.partners),
        p_ilow=tuple(jnp.asarray(p.ilow) for p in mol.partners),
        p_T=tuple(jnp.asarray(p.T_coll) for p in mol.partners),
        p_Cul=tuple(jnp.asarray(p.Cul) for p in mol.partners),
        partner_names=tuple(p.name for p in mol.partners))


class CellExcEnv(NamedTuple):
    """Per-cell conditions for one excitation solve."""
    Tkin: jnp.ndarray
    dv: jnp.ndarray              # line width, cm/s
    length_scale: jnp.ndarray    # cm
    density_mol: jnp.ndarray     # cm^-3
    dens_partner: jnp.ndarray    # [n_partner]
    cont_alpha: jnp.ndarray      # [n_rad] continuum extinction at line lam
    cont_J: jnp.ndarray          # [n_rad] continuum mean intensity


def boltzmann(tab: MolTables, Tkin):
    f = tab.g * jnp.exp(-tab.energy_K / jnp.maximum(Tkin, 1e-30))
    return f / f.sum()


def _beta_of_tau(tau):
    small = jnp.abs(tau) <= 1e-6
    big = tau >= 100.0
    neg = tau < 0.0
    tau_s = jnp.where(small | (tau == 0.0), 1.0, tau)
    general = (1.0 - jnp.exp(-3.0 * jnp.minimum(tau_s, 200.0))) \
        / (3.0 * tau_s)
    return jnp.where(small, 1.0,
                     jnp.where(big, 1.0 / (3.0 * tau_s),
                               jnp.where(neg, 1.0 - 1.5 * tau, general)))


def _collision_rates(tab: MolTables, Tkin):
    """Interpolated Cul and detailed-balance Clu per partner."""
    out = []
    for pi in range(len(tab.p_T)):
        Tc = tab.p_T[pi]
        nT = Tc.shape[0]
        j = jnp.clip(jnp.searchsorted(Tc, Tkin), 1, nT - 1)
        TL, TR = Tc[j - 1], Tc[j]
        w = jnp.clip((Tkin - TL) / jnp.maximum(TR - TL, 1e-300), 0.0, 1.0)
        Cul = tab.p_Cul[pi][j - 1] * (1.0 - w) + tab.p_Cul[pi][j] * w
        iu, il = tab.p_iup[pi], tab.p_ilow[pi]
        dE = tab.energy_K[iu] - tab.energy_K[il]
        Clu = Cul * jnp.exp(-dE / jnp.maximum(Tkin, 1e-30)) \
            * tab.g[iu] / tab.g[il]
        out.append((Cul, Clu))
    return out


def stateq_rhs(tab: MolTables, env: CellExcEnv, f):
    """ydot for the level populations (reference stat_equili_ode_f)."""
    n = tab.energy_K.shape[0]
    yu = f[tab.iup]
    yl = f[tab.ilow]
    del_nu = tab.freq * env.dv / c.SpeedOfLight_CGS
    t1 = c.hPlanck_CGS * tab.freq / (4.0 * jnp.pi) * env.density_mol / del_nu
    jnu = yu * tab.Aul
    knu = yl * tab.Blu - yu * tab.Bul
    alpha = t1 * knu + env.cont_alpha
    tau = alpha * env.length_scale
    beta = _beta_of_tau(tau)
    safe = jnp.abs(knu) > 1e-30
    S = jnp.where(safe, jnu / jnp.where(safe, knu, 1.0),
                  jnu * env.length_scale * t1)
    J_ave = S * (1.0 - beta) + env.cont_J * beta
    r = tab.Aul * yu + tab.Bul * J_ave * yu - tab.Blu * J_ave * yl
    ydot = jnp.zeros(n).at[tab.iup].add(-r).at[tab.ilow].add(r)
    for pi, (Cul, Clu) in enumerate(_collision_rates(tab, env.Tkin)):
        rc = (Cul * f[tab.p_iup[pi]] - Clu * f[tab.p_ilow[pi]]) \
            * env.dens_partner[pi]
        ydot = ydot.at[tab.p_iup[pi]].add(-rc).at[tab.p_ilow[pi]].add(rc)
    return ydot, (beta, J_ave)


def cooling_rate(tab: MolTables, env: CellExcEnv, f):
    """Total line cooling [erg cm^-3 s^-1] (reference calc_cooling_rate,
    statistic_equilibrium.f90:56-78)."""
    _, (beta, J_ave) = stateq_rhs(tab, env, f)
    per_tr = beta * c.hPlanck_CGS * tab.freq * env.density_mol * (
        (tab.Aul + tab.Bul * J_ave) * f[tab.iup]
        - tab.Blu * J_ave * f[tab.ilow])
    return per_tr.sum()


def solve_stateq(tab: MolTables, env: CellExcEnv, n_newton: int = 30,
                 tol: float = 1e-10):
    """Damped Newton on [ydot[:-1]; sum(f) - 1] starting from LTE."""
    n = tab.energy_K.shape[0]
    f0 = boltzmann(tab, env.Tkin)

    def resid(f):
        ydot, _ = stateq_rhs(tab, env, f)
        return jnp.concatenate([ydot[:-1], jnp.array([f.sum() - 1.0])])

    def body(state):
        f, it, err = state
        F = resid(f)
        J = jax.jacfwd(resid)(f)
        from .linalg import mp_linsolve
        dx = mp_linsolve(J, -F)

        def try_lambda(lam):
            fn = f + lam * dx
            return fn, jnp.linalg.norm(resid(fn))

        err0 = jnp.linalg.norm(F)
        f1, e1 = try_lambda(1.0)
        f2, e2 = try_lambda(0.5)
        f3, e3 = try_lambda(0.25)
        f4, e4 = try_lambda(0.1)
        errs = jnp.stack([e1, e2, e3, e4])
        fs = jnp.stack([f1, f2, f3, f4])
        ib = jnp.argmin(errs)
        fn = fs[ib]
        en = errs[ib]
        improved = en < err0
        fn = jnp.where(improved, fn, f)
        return fn, it + 1, jnp.where(improved, en, err0 * 0.999999)

    def cond(state):
        f, it, err = state
        return (it < n_newton) & (err > tol)

    f, it, err = jax.lax.while_loop(
        cond, body, (f0, jnp.array(0), jnp.array(jnp.inf)))
    f = jnp.maximum(f, 0.0)
    return f / f.sum(), err


def solve_stateq_batch(tab: MolTables, envs: CellExcEnv, **kw):
    return jax.vmap(lambda e: solve_stateq(tab, e, **kw))(envs)
