"""Measure the batched-BDF interval-barrier waste on the bench workload:
per record interval, how many rounds the while_loop ran (inferred from
the MAX per-lane steps) vs the MEAN lane progress.  The ratio bounds the
speedup available from per-lane continuous recording (no tout barrier).

Usage: python tools/probe_bdf_rounds.py [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(B=256):
    import jax
    import jax.numpy as jnp
    from rac2d_tpu import defaults
    from rac2d_tpu.io import umist
    from rac2d_tpu.ops import bdf as bdfmod, odesys
    from rac2d_tpu.ops.rates import CellEnv

    print(f"backend={jax.default_backend()}  B={B}")
    net = umist.load_network(defaults.NETWORK,
                             enthalpy_path=defaults.ENTHALPIES)
    y0 = umist.load_initial_abundances(net, defaults.INIT_ABUNDANCES)
    ode = odesys.ChemicalODE(net)
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
    touts = jnp.asarray(bdfmod.log_output_times(1e-8, 1e4, 1.5))
    y0b = jnp.tile(jnp.asarray(y0), (B, 1))
    T0b = jnp.asarray(Tg)
    rtol_b = jnp.tile(rtol, (B, 1))
    atol_b = jnp.tile(atol, (B, 1))

    prog = []

    def cb(i, state):
        jax.block_until_ready(state.t)
        prog.append((i, time.time(), np.asarray(state.n_steps).copy(),
                     np.asarray(state.n_feval).copy(),
                     np.asarray(state.n_jeval).copy(),
                     np.asarray(state.n_lu).copy()))

    def solve():
        prog.clear()
        return ode.solve_batched(
            envs, y0b, T0b, touts, rtol_b, atol_b, first_step=1e-8,
            evolT=False, max_steps_per_interval=400, host_loop=True,
            n_refine=0, progress_cb=cb)

    res = solve()
    jax.block_until_ready(res.ys)
    t0 = time.time()
    res = solve()
    jax.block_until_ready(res.ys)
    wall = time.time() - t0
    steps = np.asarray(res.n_steps)
    print(f"wall {wall:.2f}s  total lane-steps {steps.sum()}  "
          f"steps/s {steps.sum() / wall:.1f}")
    print(f"per-lane steps: min {steps.min()} mean {steps.mean():.0f} "
          f"max {steps.max()}")
    nfe = np.asarray(res.n_feval)
    print(f"n_feval mean {nfe.mean():.0f}  n_jeval mean "
          f"{np.asarray(res.n_jeval).mean():.1f}  n_lu mean "
          f"{np.asarray(res.n_lu).mean():.1f}")
    # per-interval: rounds >= max over lanes of steps taken this interval
    prev = np.zeros(len(steps), dtype=np.int64)
    prev_t = None
    tot_max = 0
    rows = []
    for i, tw, ns, nf, nj, nl in prog:
        d = ns - prev
        dt = 0.0 if prev_t is None else tw - prev_t
        rows.append((i, dt, d.mean(), d.max()))
        tot_max += d.max()
        prev = ns
        prev_t = tw
    print(f"sum over intervals of MAX lane steps (>= rounds): {tot_max}")
    print(f"mean-lane total steps: {steps.mean():.0f}  -> barrier "
          f"inefficiency ~{tot_max / steps.mean():.2f}x")
    print("slowest 8 intervals (i, wall_s, mean d, max d):")
    for r in sorted(rows, key=lambda r: -r[1])[:8]:
        print(f"  {r[0]:3d}  {r[1]:7.3f}s  {r[2]:7.1f}  {r[3]:5d}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
