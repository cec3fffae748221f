"""Benchmark: cell-ODE steps/s/chip for the batched stiff chemistry solver.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline anchor: the reference (serial Fortran DLSODES, one cell at a
time) budgets up to 60 s wall per cell time-step interval and in practice
achieves order tens of BDF steps per second on one CPU core
(BASELINE.md).  We use 40 steps/s as the serial-reference anchor for
vs_baseline.
"""

import json
import sys
import time

import numpy as np

BASELINE_STEPS_PER_S = 40.0


def main():
    import jax

    # Prefer the TPU; fall back to CPU if the accelerator is unreachable.
    backend = jax.default_backend()
    import jax.numpy as jnp

    from rac2d_tpu import defaults
    from rac2d_tpu.io import umist
    from rac2d_tpu.ops import bdf as bdfmod
    from rac2d_tpu.ops import odesys
    from rac2d_tpu.ops.rates import CellEnv

    net = umist.load_network(defaults.NETWORK,
                             enthalpy_path=defaults.ENTHALPIES)
    y0 = umist.load_initial_abundances(net, defaults.INIT_ABUNDANCES)
    ode = odesys.ChemicalODE(net)

    import os
    B = int(os.environ.get("RAC2D_BENCH_B",
                           32 if backend == "cpu" else 128))
    rng = np.random.default_rng(0)
    n_gas = 10 ** rng.uniform(4, 8, B)
    Tg = 10 ** rng.uniform(1, 2, B)
    d2g = 2.8e-12

    def env_of(i):
        return CellEnv.default(
            Tgas=Tg[i], Tdust=Tg[i], n_gas=n_gas[i], Av_toISM=5.0,
            Av_toStar=5.0, G0_UV_toISM=1.0, GrainRadius_CGS=1e-5,
            sigdust_ave=np.pi * 1e-10, ndust_tot=d2g * n_gas[i],
            ratioDust2HnucNum=d2g, SitesPerGrain=4 * np.pi * 1e-10 * 1e15)

    envs = jax.tree.map(lambda *a: jnp.stack(a), *[env_of(i)
                                                   for i in range(B)])
    rtol, atol = odesys.tolerance_ladder(net, 1, 1e-4, 1e-30, d2g)
    rtol_b = jnp.tile(rtol, (B, 1))
    atol_b = jnp.tile(atol, (B, 1))
    touts = jnp.asarray(bdfmod.log_output_times(1e-8, 1e4, 1.5))
    y0b = jnp.tile(jnp.asarray(y0), (B, 1))
    T0b = jnp.asarray(Tg)

    # host_loop: one bounded device program per record interval — a
    # single whole-integration program runs for minutes and trips the
    # TPU device watchdog
    def solve(y, T):
        return ode.solve_batched(
            envs, y, T, touts, rtol_b, atol_b, first_step=1e-8,
            evolT=False, max_steps_per_interval=400, host_loop=True,
            # inexact Newton: skip the f64 refinement matvec (emulated
            # f64 dominates TPU round time); Newton's own convergence
            # test still bounds the corrector residual
            n_refine=int(os.environ.get("RAC2D_BENCH_NREFINE", 0)))

    # warmup/compile
    res = solve(y0b, T0b)
    jax.block_until_ready(res.ys)
    t0 = time.time()
    res = solve(y0b, T0b)
    jax.block_until_ready(res.ys)
    dt = time.time() - t0
    steps = int(np.asarray(res.n_steps).sum())
    sps = steps / dt
    print(json.dumps({
        "metric": f"cell-ODE steps/s/chip ({backend}, batch={B}, "
                  f"{net.n_species + 1} eqns)",
        "value": round(sps, 2),
        "unit": "BDF steps/s/chip",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
