"""The coupled chemistry(+temperature) ODE system.

Builds jittable f(y) / J(y) closures for one cell (vmap for many) from the
static network tables, and drives the batched BDF solver.  This is the
TPU-native analogue of the reference's solver stack:
``chem_evol_solve`` (src/chemistry.f90:391-588) + the ODE callbacks
``chem_ode_f``/``chem_ode_jac`` (src/disk.f90:4569-4903).

State layout: y[NEQ] with y[:n_species] fractional abundances and
y[n_species] = Tgas (evolved only when a thermal-rate function is given,
mirroring NEQ = nSpecies + 1 in the reference, src/chemistry.f90:1861).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.umist import ChemNet
from . import bdf as bdfmod
from .network import Incidence, build_incidence, jac_species, rhs_species
from .rates import CellEnv, RateTables, build_rate_tables, compute_rates


class ChemicalODE:
    """Static compiled-in description of the chemical ODE for a network."""

    def __init__(self, net: ChemNet, h2_form_use_moeq: bool = False,
                 diff2des: float = 0.5,
                 thermal=None):
        self.net = net
        self.n_species = net.n_species
        self.neq = net.n_species + 1
        self.h2_form_use_moeq = h2_form_use_moeq
        self.diff2des = diff2des
        self.tab: RateTables = build_rate_tables(net)
        self.inc: Incidence = build_incidence(net, h2_form_use_moeq)
        # ThermalBalance instance (ops.thermal); None = frozen temperature
        self.thermal = thermal
        self.key_idx = jnp.asarray(net.key_species_idx)

    def _rates(self, env, T):
        return compute_rates(self.tab, env, T, self.diff2des,
                             self.h2_form_use_moeq)

    # ---- closures -------------------------------------------------------
    def make_f(self, env: CellEnv, evolT: bool, tenv=None):
        nS = self.n_species

        def f(y):
            T = y[nS] if evolT else env.Tgas
            k = self._rates(env, T)
            ydot_s = rhs_species(self.inc, k, y[:nS], env.ratioDust2HnucNum,
                                 env.SitesPerGrain)
            if evolT and self.thermal is not None:
                Tdot = self.thermal.dTdt(y, T, env, tenv, k)
            else:
                Tdot = jnp.zeros(())
            return jnp.concatenate([ydot_s, Tdot[None]])

        return f

    def make_jac(self, env: CellEnv, evolT: bool, tenv=None):
        """Dense Jacobian closure.

        Structured to keep the traced graph small: the species block is
        the analytic COO assembly; because the RHS is linear in the rate
        vector k, the T column of the species block is just the RHS
        assembled from dk/dT (one jvp through compute_rates only); the T
        row differentiates the thermal rate at FIXED k — matching the
        reference semantics where the species-perturbation finite
        differences do not re-evaluate the rate coefficients
        (disk.f90:4878-4890), and the T-column finite difference does
        (disk.f90:4891-4899).
        """
        nS = self.n_species

        def jac(y):
            T = y[nS] if evolT else env.Tgas
            if evolT and self.thermal is not None:
                k, dk = jax.jvp(lambda TT: self._rates(env, TT),
                                (T,), (jnp.ones(()),))
            else:
                k = self._rates(env, T)
            Js = jac_species(self.inc, k, y[:nS], env.ratioDust2HnucNum,
                             env.SitesPerGrain)
            J = jnp.zeros((self.neq, self.neq)).at[:nS, :nS].set(Js)
            if evolT and self.thermal is not None:
                col_s = rhs_species(self.inc, dk, y[:nS],
                                    env.ratioDust2HnucNum, env.SitesPerGrain)
                J = J.at[:nS, nS].set(col_s)
                # dTdot/dT including the k(T) dependence, forward mode
                _, dTdot_dT = jax.jvp(
                    lambda TT, kk: self.thermal.dTdt(y, TT, env, tenv, kk),
                    (T, k), (jnp.ones(()), dk))
                # T row at fixed k, masked to the 10 key species
                row = jax.grad(
                    lambda yy: self.thermal.dTdt(yy, T, env, tenv, k))(y)
                mask = jnp.zeros(self.neq).at[self.key_idx].set(1.0)
                J = J.at[nS, :].set(row * mask)
                J = J.at[nS, nS].set(dTdot_dT)
            return J

        return jac

    # ---- solve ----------------------------------------------------------
    def solve(self, env: CellEnv, y0_species, Tgas0, touts, rtol, atol,
              first_step=1e-8, evolT: bool = False, tenv=None,
              max_steps_per_interval: int = 2000) -> bdfmod.BDFResult:
        """Integrate one cell.  All args may be batched; use solve_batched."""
        f = self.make_f(env, evolT, tenv)
        jac = self.make_jac(env, evolT, tenv)
        y0 = jnp.concatenate([jnp.asarray(y0_species),
                              jnp.asarray(Tgas0)[None]])
        return bdfmod.bdf_solve(f, jac, y0, 0.0, touts, rtol, atol,
                                first_step, max_steps_per_interval)

    def solve_batched(self, envs: CellEnv, y0_species, Tgas0, touts, rtol,
                      atol, first_step=1e-8, evolT: bool = False, tenvs=None,
                      max_steps_per_interval: int = 2000) -> bdfmod.BDFResult:
        """vmap over cells: envs/tenvs fields and y0/T0/rtol/atol carry a
        leading batch axis; touts is shared."""
        if tenvs is None:
            def one(env, y0, T0, rt, at):
                return self.solve(env, y0, T0, touts, rt, at, first_step,
                                  evolT, None, max_steps_per_interval)

            return jax.vmap(one)(envs, y0_species, Tgas0, rtol, atol)

        def one(env, tenv, y0, T0, rt, at):
            return self.solve(env, y0, T0, touts, rt, at, first_step,
                              evolT, tenv, max_steps_per_interval)

        return jax.vmap(one)(envs, tenvs, y0_species, Tgas0, rtol, atol)


def tolerance_ladder(net: ChemNet, level: int, rtol0: float, atol0: float,
                     ratioDust2HnucNum: float):
    """Per-equation RTOL/ATOL vectors, relaxation level 1..4+.

    Reproduces the reference's retry ladder ``chem_set_solver_flags_alt``
    (src/chemistry.f90:205-268): progressively looser tolerances for
    generic species, pinned tolerances for the 10 key species, special
    handling of Grain0/+/- and of grain-surface species.
    """
    nS = net.n_species
    neq = nS + 1
    if level == 1:
        r, a, rT, aT = rtol0, atol0, 1e-3, 1e-1
    elif level == 2:
        r, a, rT, aT = min(rtol0 * 1e1, 1e-4), min(atol0 * 1e5, 1e-25), 1e-2, 1e-1
    elif level == 3:
        r, a, rT, aT = min(rtol0 * 1e2, 1e-4), min(atol0 * 1e10, 1e-20), 1e-3, 1e0
    elif level == 4:
        r, a, rT, aT = min(rtol0 * 1e2, 1e-4), min(atol0 * 1e10, 1e-18), 1e-3, 1e0
    else:
        r = min(rtol0 * 2.0 ** level, 1e-3)
        a = min(atol0 * 1e2 ** level, 1e-15)
        rT, aT = 1e-2, 1e0
    rtol = np.full(neq, r)
    atol = np.full(neq, a)
    rtol[nS] = rT
    atol[nS] = aT
    # key heating/cooling species
    rtol[net.key_species_idx] = max(rtol0, 1e-4)
    atol[net.key_species_idx] = max(atol0, 1e-30)
    # grain charge states
    for name in ("Grain0", "Grain-", "Grain+"):
        i = net.idx.get(name, -1)
        if i >= 0:
            rtol[i] = 1e-4
            atol[i] = max(ratioDust2HnucNum * 1e-6, 1e-30)
    # grain-surface species
    if len(net.grain_species_idx):
        rtol[net.grain_species_idx] = max(rtol0, 1e-3)
        atol[net.grain_species_idx] = max(atol0, ratioDust2HnucNum * 1e-8)
    return jnp.asarray(rtol), jnp.asarray(atol)
