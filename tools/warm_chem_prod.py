"""Warm + diagnose the chem_prod bench program on the real chip:
compiles the coupled continuous-advance program (B=128, n_refine=0,
production touts) into the persistent cache and reports per-advance
progress so failures are visible.

Usage: python tools/warm_chem_prod.py [wall_seconds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    wall = float(sys.argv[1]) if len(sys.argv) > 1 else 600.0
    from rac2d_tpu import defaults
    from rac2d_tpu.io import umist
    from rac2d_tpu.ops import bdf as bdfmod, odesys, thermal
    from rac2d_tpu.ops.rates import CellEnv

    net = umist.load_network(defaults.NETWORK,
                             enthalpy_path=defaults.ENTHALPIES)
    y0 = umist.load_initial_abundances(net, defaults.INIT_ABUNDANCES)
    ode = odesys.ChemicalODE(net, thermal=thermal.ThermalBalance(net))
    B = 128
    rng = np.random.default_rng(0)
    n_gas = 10 ** rng.uniform(4, 8, B)
    Tg = 10 ** rng.uniform(1, 2, B)
    d2g = 2.8e-12

    def env_of(i):
        return CellEnv.default(
            Tgas=Tg[i], Tdust=Tg[i], n_gas=n_gas[i], Av_toISM=5.0,
            Av_toStar=5.0, G0_UV_toISM=1.0, Ncol_toISM=n_gas[i] * 1e17,
            GrainRadius_CGS=1e-5,
            sigdust_ave=np.pi * 1e-10, ndust_tot=d2g * n_gas[i],
            ratioDust2HnucNum=d2g, SitesPerGrain=4 * np.pi * 1e-10 * 1e15)

    envs = jax.tree.map(lambda *a: jnp.stack(a),
                        *[env_of(i) for i in range(B)])

    def tenv_of(i):
        return thermal.ThermalEnv.default(
            omega_Kepler=2e-9, velo_width_turb=3e4, coherent_length=1e13,
            n_dusts=np.array([d2g * n_gas[i], 0, 0, 0]),
            sig_dusts=np.array([np.pi * 1e-10, 0, 0, 0]),
            Tdusts=np.array([Tg[i], 0, 0, 0]))

    tenvs = jax.tree.map(lambda *a: jnp.stack(a),
                         *[tenv_of(i) for i in range(B)])
    rtol, atol = odesys.tolerance_ladder(net, 1, 1e-4, 1e-30, d2g)
    touts = jnp.asarray(bdfmod.log_output_times(1e-8, 1e6, 1.1))
    print(f"n_out={touts.shape[0]} B={B}", flush=True)
    t00 = time.time()

    def cb(k, st):
        t = np.asarray(st.t)
        f = np.asarray(st.fail)
        ns = np.asarray(st.n_steps)
        print(f"  advance {k}: t med {np.median(t):.3e} "
              f"max {t.max():.3e} yr  fail {int(f.sum())}  "
              f"steps {int(ns.sum())}  wall {time.time()-t00:.0f}s",
              flush=True)

    res = ode.solve_batched(
        envs, jnp.tile(jnp.asarray(y0), (B, 1)), jnp.asarray(Tg),
        touts, jnp.tile(rtol, (B, 1)), jnp.tile(atol, (B, 1)),
        first_step=1e-8, evolT=True, tenvs=tenvs, continuous=True,
        max_steps_per_interval=400, host_loop=True, n_refine=0,
        max_wall_s=wall, progress_cb=cb)
    fail = np.asarray(res.fail)
    t_fin = np.asarray(res.t_final)
    print(f"DONE: steps {int(np.asarray(res.n_steps).sum())}  "
          f"fail {int(fail.sum())}/{B}  "
          f"t_final med {np.median(t_fin):.3e} min {t_fin.min():.3e}",
          flush=True)
    Tfin = np.asarray(res.ys[:, -1, net.n_species])
    print(f"T range {Tfin.min():.1f}..{Tfin.max():.1f}", flush=True)


if __name__ == "__main__":
    main()
