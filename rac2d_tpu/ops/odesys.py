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
        # jitted batch solvers + pure batch closures, keyed by the static
        # solve configuration: ONE compile serves every chunk of a sweep
        # (environments ride through as traced `args`)
        self._solver_cache: dict = {}
        self._fns_cache: dict = {}

    def _batch_fns(self, evolT: bool, with_tenv: bool):
        """Pure (yb, args) closures for the batch solver; cached so the
        same function objects (and hence the same jit cache entries) are
        reused across chunks.

        args = (envs, tenvs, kb): for evolT=False the per-lane rate
        vector kb [B, nR] is PRECOMPUTED once per solve (T fixed ->
        k fixed; re-evaluating the 5830 exp/pow chains inside every
        Newton iteration was pure waste — the reference likewise only
        recomputes when T changed, disk.f90:4577-4580).  For evolT=True
        kb is None and rates are evaluated at the live T.
        """
        key = (evolT, with_tenv)
        if key in self._fns_cache:
            return self._fns_cache[key]
        if with_tenv:
            def f_b(yb, args):
                envs, tenvs, kb = args
                if kb is None:
                    return jax.vmap(
                        lambda y, e, te: self.make_f(e, evolT, te)(y))(
                        yb, envs, tenvs)
                return jax.vmap(
                    lambda y, e, te, k: self.make_f(e, evolT, te, k=k)(y))(
                    yb, envs, tenvs, kb)

            def jac_b(yb, args):
                envs, tenvs, kb = args
                if kb is None:
                    return jax.vmap(
                        lambda y, e, te: self.make_jac(e, evolT, te)(y))(
                        yb, envs, tenvs)
                return jax.vmap(
                    lambda y, e, te, k: self.make_jac(e, evolT, te,
                                                      k=k)(y))(
                    yb, envs, tenvs, kb)
        else:
            def f_b(yb, args):
                envs, _, kb = args
                if kb is None:
                    return jax.vmap(
                        lambda y, e: self.make_f(e, evolT, None)(y))(
                        yb, envs)
                return jax.vmap(
                    lambda y, e, k: self.make_f(e, evolT, None, k=k)(y))(
                    yb, envs, kb)

            def jac_b(yb, args):
                envs, _, kb = args
                if kb is None:
                    return jax.vmap(
                        lambda y, e: self.make_jac(e, evolT, None)(y))(
                        yb, envs)
                return jax.vmap(
                    lambda y, e, k: self.make_jac(e, evolT, None,
                                                  k=k)(y))(yb, envs, kb)

        def sanity_b(yb):
            return jax.vmap(self._sanity(evolT))(yb)

        self._fns_cache[key] = (f_b, jac_b, sanity_b)
        return self._fns_cache[key]

    def _rates(self, env, T):
        return compute_rates(self.tab, env, T, self.diff2des,
                             self.h2_form_use_moeq)

    # ---- closures -------------------------------------------------------
    def make_f(self, env: CellEnv, evolT: bool, tenv=None, k=None):
        nS = self.n_species
        k_pre = k

        def f(y):
            T = y[nS] if evolT else env.Tgas
            k = self._rates(env, T) if k_pre is None else k_pre
            ydot_s = rhs_species(self.inc, k, y[:nS], env.ratioDust2HnucNum,
                                 env.SitesPerGrain)
            if evolT and self.thermal is not None:
                Tdot = self.thermal.dTdt(y, T, env, tenv, k)
            else:
                Tdot = jnp.zeros(())
            return jnp.concatenate([ydot_s, Tdot[None]])

        return f

    def make_jac(self, env: CellEnv, evolT: bool, tenv=None, k=None):
        """Dense Jacobian closure.

        The species block is the analytic COO assembly.  The temperature
        row/column use finite differences with exactly the reference's
        perturbation sizes (src/disk.f90:4755-4761, 4878-4899): this is
        deliberate — it matches the reference numerics AND keeps the
        traced graph to evaluations of f / dTdt only (autodiff of the full
        rate+thermal stack inside the solver loops explodes XLA compile
        time).  Per reference semantics the species-perturbation FDs do
        not re-evaluate rate coefficients; the T-perturbation does (it
        goes through f).
        """
        nS = self.n_species

        k_pre = k

        def jac(y):
            T = y[nS] if evolT else env.Tgas
            k = self._rates(env, T) if k_pre is None else k_pre
            Js = jac_species(self.inc, k, y[:nS], env.ratioDust2HnucNum,
                             env.SitesPerGrain)
            J = jnp.zeros((self.neq, self.neq)).at[:nS, :nS].set(Js)
            if evolT and self.thermal is not None:
                f = self.make_f(env, True, tenv)
                # T column: FD through the full RHS (rates recomputed).
                # vmap over [y, y+dT e_N] instantiates ONE copy of the f
                # body in the graph instead of two — the coupled record's
                # XLA compile is dominated by repeated thermal-stack
                # instantiations (see ROOFLINE.md).
                dT = 1e-2 * T + 1.0
                f2 = jax.vmap(f)(jnp.stack([y, y.at[nS].set(T + dT)]))
                f0 = f2[0]
                col = (f2[1] - f0) / dT
                # T row: FD of dTdt wrt the 10 key species at fixed k;
                # zero for species currently negative (reference
                # disk.f90:4880-4890)
                d2h = env.ratioDust2HnucNum

                def tdot_pert(i):
                    yi = y[i]
                    dy = yi * 1e-2 + d2h * 1e-6
                    yp = y.at[i].set(yi + dy)
                    td = self.thermal.dTdt(yp, T, env, tenv, k)
                    return jnp.where(yi >= 0.0, (td - f0[nS]) / dy, 0.0)

                row_vals = jax.vmap(tdot_pert)(self.key_idx)
                J = J.at[nS, self.key_idx].set(row_vals)
                J = J.at[:, nS].set(col)
            return J

        return jac

    def _sanity(self, evolT):
        """Insane-state detector (reference src/chemistry.f90:520-530)."""
        nS = self.n_species
        ids = [self.net.idx.get(s, -1) for s in ("gH2", "gH2O", "gH")]
        i_HI = self.net.idx.get("H", -1)
        i_E = self.net.idx.get("E-", -1)

        def bad(y):
            # any species blowing past 2 x the maximum physical
            # abundance is insane regardless of which one it is (the
            # reference aborts on |X|>1-class states; species-specific
            # caps below keep its tighter limits for the key ones)
            b = jnp.max(jnp.abs(y[:nS])) > 2.0
            for i in ids:
                if i >= 0:
                    b = b | (jnp.abs(y[i]) > 1.0)
            if i_HI >= 0:
                b = b | (jnp.abs(y[i_HI]) > 2.0)
            if i_E >= 0:
                b = b | (jnp.abs(y[i_E]) > 1.0)
            if evolT:
                b = b | jnp.isnan(y[nS]) | (y[nS] <= 0.0)
            return b

        return bad

    def retry_ladder(self, levels: int, rtol0: float, atol0: float,
                     ratioDust2HnucNum: float):
        """(rtol_row, atol_row) vectors for ladder levels 2..levels+1 —
        the per-lane retry ladder for solve_batched(retry_tols=...),
        mirroring the reference's relaxed re-solves
        (src/chemistry.f90:272-387 with flags from
        chem_set_solver_flags_alt)."""
        return [tolerance_ladder(self.net, lv, rtol0, atol0,
                                 ratioDust2HnucNum)
                for lv in range(2, 2 + levels)]

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
                                first_step, max_steps_per_interval,
                                sanity_fn=self._sanity(evolT))

    def solve_batched(self, envs: CellEnv, y0_species, Tgas0, touts, rtol,
                      atol, first_step=1e-8, evolT: bool = False, tenvs=None,
                      max_steps_per_interval: int = 2000,
                      refac_every: int = 2,
                      n_refine: int = 1, host_loop: bool = False,
                      continuous: bool = False,
                      max_wall_s: float | None = None,
                      progress_cb=None,
                      rounds_per_call: int = 256,
                      retry_tols=None,
                      compact_min: int = 0) -> bdfmod.BDFResult:
        """Batch-native solve: envs/tenvs fields and y0/T0/rtol/atol carry
        a leading batch axis; touts is shared.  Uses bdf_solve_batch so
        Jacobian/factorization refreshes are batch-global branches (a
        vmapped per-lane solver would evaluate them every round).

        host_loop=True drives one jitted device call per record interval
        (bounded device programs for TPU watchdogs, progress reporting,
        and the reference's wall-clock guard via max_wall_s)."""
        f_b, jac_b, sanity_b = self._batch_fns(evolT, tenvs is not None)
        kb = None
        if not evolT:
            # fixed T -> fixed k: evaluate the 5830-reaction rate vector
            # once per lane instead of inside every Newton iteration
            kb = jax.jit(jax.vmap(lambda e: self._rates(e, e.Tgas)))(envs)
        args = (envs, tenvs, kb)
        y0 = jnp.concatenate(
            [jnp.asarray(y0_species), jnp.asarray(Tgas0)[:, None]], axis=1)
        if continuous:
            # per-lane continuous recording: every lane steps every
            # round, records its own touts via dense output — no
            # per-interval barrier (see bdf.make_advance_jit)
            key = ("cont", evolT, tenvs is not None,
                   max_steps_per_interval, n_refine)
            advance = self._solver_cache.get(key)
            if advance is None:
                advance = bdfmod.make_advance_jit(
                    f_b, jac_b, max_steps_per_interval, sanity_b,
                    n_refine)
                self._solver_cache[key] = advance
            return bdfmod.bdf_solve_batch_cont(
                f_b, jac_b, y0, 0.0, touts, rtol, atol, first_step,
                max_steps_per_interval, sanity_b, n_refine,
                max_wall_s=max_wall_s, progress_cb=progress_cb,
                args=args, advance_fn=advance,
                # traced arg: smaller values tighten the wall guard's
                # check granularity without recompiling
                rounds_per_call=rounds_per_call,
                retry_tols=retry_tols, compact_min=compact_min)
        if host_loop:
            key = ("rec", evolT, tenvs is not None,
                   max_steps_per_interval, n_refine)
            record = self._solver_cache.get(key)
            if record is None:
                record = bdfmod.make_record_jit(
                    f_b, jac_b, max_steps_per_interval, sanity_b, n_refine)
                self._solver_cache[key] = record
            return bdfmod.bdf_solve_batch_host(
                f_b, jac_b, y0, 0.0, touts, rtol, atol, first_step,
                max_steps_per_interval, sanity_b, n_refine,
                max_wall_s=max_wall_s, progress_cb=progress_cb,
                args=args, record_fn=record)
        key = ("scan", evolT, tenvs is not None,
               max_steps_per_interval, n_refine)
        solver = self._solver_cache.get(key)
        if solver is None:
            import functools
            solver = jax.jit(functools.partial(
                bdfmod.bdf_solve_batch, f_b, jac_b,
                max_steps_per_interval=max_steps_per_interval,
                sanity_b=sanity_b, refac_every=refac_every,
                n_refine=n_refine))
            self._solver_cache[key] = solver
        return solver(y0, 0.0, touts, rtol, atol, first_step, args=args)

    def solve_pool(self, envs: CellEnv, y0_species, Tgas0, touts, rtol,
                   atol, width: int, first_step=1e-8,
                   evolT: bool = False, tenvs=None,
                   max_steps_per_interval: int = 2000,
                   n_refine: int = 1, retry_tols=None,
                   max_wall_s: float | None = None,
                   progress_cb=None,
                   rounds_per_call: int = 256) -> bdfmod.BDFResult:
        """Pool-refill sweep: N >> width lanes stream through ONE
        constant-width window (bdf_solve_batch_pool) — finished lanes
        retire and their slots refill from the pool, the chemistry
        analogue of the MC streamed pass.  rtol/atol may be [NEQ] rows
        (shared) or [N, NEQ].  Returns BDFResult over the full pool
        with ys = final state only ([N, 1, NEQ])."""
        f_b, jac_b, sanity_b = self._batch_fns(evolT, tenvs is not None)
        kb = None
        if not evolT:
            kb = jax.jit(jax.vmap(lambda e: self._rates(e, e.Tgas)))(envs)
        args_pool = (envs, tenvs, kb)
        y0 = jnp.concatenate(
            [jnp.asarray(y0_species), jnp.asarray(Tgas0)[:, None]], axis=1)
        N = y0.shape[0]
        rtol = jnp.asarray(rtol)
        atol = jnp.asarray(atol)
        if rtol.ndim == 1:
            rtol = jnp.tile(rtol, (N, 1))
        if atol.ndim == 1:
            atol = jnp.tile(atol, (N, 1))
        key = ("cont", evolT, tenvs is not None,
               max_steps_per_interval, n_refine)
        advance = self._solver_cache.get(key)
        if advance is None:
            advance = bdfmod.make_advance_jit(
                f_b, jac_b, max_steps_per_interval, sanity_b, n_refine)
            self._solver_cache[key] = advance
        return bdfmod.bdf_solve_batch_pool(
            f_b, jac_b, y0, 0.0, touts, rtol, atol, first_step,
            width=width, max_steps_per_interval=max_steps_per_interval,
            sanity_b=sanity_b, n_refine=n_refine, max_wall_s=max_wall_s,
            progress_cb=progress_cb, args_pool=args_pool,
            advance_fn=advance, rounds_per_call=rounds_per_call,
            retry_tols=retry_tols)


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
