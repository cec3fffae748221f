"""Per-component timing of one batched BDF round on the current backend.

Usage: python tools/profile_bdf.py [B]

Prints the cost of each piece of a Newton round at batch width B —
rates, RHS, Jacobian, factorization, solve (with/without refinement) —
the data behind the round-2 throughput work (see ROOFLINE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(name, fn, *a, n=10):
    import jax
    r = fn(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*a)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:38s} {dt:8.2f} ms")
    return r, dt


def main(B=128):
    import jax
    import jax.numpy as jnp
    from rac2d_tpu import defaults
    from rac2d_tpu.io import umist
    from rac2d_tpu.ops import bdf as bdfmod
    from rac2d_tpu.ops import odesys, thermal
    from rac2d_tpu.ops.network import rhs_species
    from rac2d_tpu.ops.rates import CellEnv, compute_rates

    print(f"backend={jax.default_backend()}  B={B}")
    net = umist.load_network(defaults.NETWORK,
                             enthalpy_path=defaults.ENTHALPIES)
    y0 = umist.load_initial_abundances(net, defaults.INIT_ABUNDANCES)
    tb = thermal.ThermalBalance(net)
    ode = odesys.ChemicalODE(net, thermal=tb)
    rng = np.random.default_rng(0)
    n_gas = 10 ** rng.uniform(4, 8, B)
    Tg = 10 ** rng.uniform(1, 2, B)
    d2g = 2.8e-12

    def env_of(i):
        return CellEnv.default(
            Tgas=Tg[i], Tdust=Tg[i], n_gas=n_gas[i], Av_toISM=5.0,
            Av_toStar=5.0, GrainRadius_CGS=1e-5,
            sigdust_ave=np.pi * 1e-10, ndust_tot=d2g * n_gas[i],
            ratioDust2HnucNum=d2g, SitesPerGrain=4 * np.pi * 1e-10 * 1e15)

    envs = jax.tree.map(lambda *a: jnp.stack(a),
                        *[env_of(i) for i in range(B)])
    tenvs = jax.tree.map(
        lambda *a: jnp.stack(a),
        *[thermal.ThermalEnv.default(omega_Kepler=2e-9,
                                     velo_width_turb=3e4,
                                     coherent_length=1e13)
          for _ in range(B)])
    yb = jnp.concatenate(
        [jnp.tile(jnp.asarray(y0), (B, 1)), jnp.asarray(Tg)[:, None]],
        axis=1)

    vr = jax.jit(lambda Tb: jax.vmap(
        lambda e, T: compute_rates(ode.tab, e, T))(envs, Tb))
    kb, _ = timeit("compute_rates (f64)", vr, yb[:, -1])

    vrhs = jax.jit(lambda kb, yb: jax.vmap(
        lambda k, y: rhs_species(ode.inc, k, y[:net.n_species],
                                 envs.ratioDust2HnucNum[0],
                                 envs.SitesPerGrain[0]))(kb, yb))
    timeit("rhs_species (given k)", vrhs, kb, yb)

    for evolT, lbl in ((False, "chem-only"), (True, "coupled+T")):
        f_b, jac_b, _ = ode._batch_fns(evolT, True)
        args = (envs, tenvs, kb if not evolT else None)
        fy, dt_f = timeit(f"f_b {lbl}", jax.jit(f_b), yb, args)
        J, dt_j = timeit(f"jac_b {lbl}", jax.jit(jac_b), yb, args)

    c_ = jnp.full(B, 1e-3)
    scale = jnp.abs(yb) * 1e-4 + 1e-30
    fac, _ = timeit("_bfac (LU + invert)", jax.jit(bdfmod._bfac),
                    J, c_, scale)
    b = jnp.ones_like(yb)
    for nr in (0, 1, 2):
        timeit(f"_bsolve n_refine={nr}",
               jax.jit(lambda J, c, fac, b, nr=nr: bdfmod._bsolve(
                   J, c, fac, b, nr)), J, c_, fac, b)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
