"""Round-5 TPU measurements: coupled-batch completion time (ladder +
compaction) and the streamed 4e6-packet MC pass.

Usage: python tools/measure_tpu_r5.py chem_prod|mc [B] [nph]
Runs on the real chip (axon); enables the persistent compile cache.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

_LOG = open(os.environ.get("R5_LOG", "/tmp/measure_r5.log"), "a", 1)


def say(*a):
    msg = " ".join(str(x) for x in a)
    print(msg, flush=True)
    _LOG.write(msg + "\n")


def chem_prod(B=128, compact_min=16, ladder=3, t_max=1e6):
    from rac2d_tpu import defaults
    from rac2d_tpu.io import umist
    from rac2d_tpu.ops import bdf as bdfmod
    from rac2d_tpu.ops import odesys, thermal
    from rac2d_tpu.ops.rates import CellEnv

    say("backend:", jax.default_backend(), "argv:", sys.argv)
    net = umist.load_network(defaults.NETWORK,
                             enthalpy_path=defaults.ENTHALPIES)
    y0 = umist.load_initial_abundances(net, defaults.INIT_ABUNDANCES)
    ode = odesys.ChemicalODE(net, thermal=thermal.ThermalBalance(net))
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
    touts = jnp.asarray(bdfmod.log_output_times(1e-8, t_max, 1.1))
    retry = ode.retry_ladder(ladder, 1e-4, 1e-30, d2g) if ladder else None
    y0b = jnp.tile(jnp.asarray(y0), (B, 1))
    T0b = jnp.asarray(Tg)
    rtol_b = jnp.tile(rtol, (B, 1))
    atol_b = jnp.tile(atol, (B, 1))

    t_hist = []

    def cb(k, st):
        t = np.asarray(st.t)
        f = np.asarray(st.fail)
        W = len(t)
        t_hist.append((time.time(), W, float(np.median(t)), int(f.sum())))
        if k % 5 == 0:
            say(f"  call {k}: W={W} t_med={np.median(t):.3e} "
                f"t_min={t.min():.3e} fails={f.sum()} "
                f"[{time.time()-t0:.0f}s]")

    kw = dict(first_step=1e-8, evolT=True, tenvs=tenvs, continuous=True,
              max_steps_per_interval=500, host_loop=True, n_refine=0,
              rounds_per_call=32, retry_tols=retry,
              compact_min=compact_min, progress_cb=cb)
    # warmup compile (wall=1: one advance call then stop)
    t0 = time.time()
    res = ode.solve_batched(envs, y0b, T0b, touts, rtol_b, atol_b,
                            max_wall_s=1.0, **kw)
    jax.block_until_ready(res.t_final)
    say(f"warmup {time.time()-t0:.1f}s")

    t_hist.clear()
    t0 = time.time()
    res = ode.solve_batched(envs, y0b, T0b, touts, rtol_b, atol_b, **kw)
    jax.block_until_ready(res.t_final)
    wall = time.time() - t0
    fail = np.asarray(res.fail)
    t_fin = np.asarray(res.t_final)
    steps = np.asarray(res.n_steps)
    lvl = np.asarray(res.retry_level) if res.retry_level is not None \
        else np.zeros(B)
    out = dict(wall_s=round(wall, 1), lanes=B,
               lanes_completed=int((~fail).sum()),
               t_final_min=float(t_fin.min()),
               t_final_median=float(np.median(t_fin)),
               steps_total=int(steps.sum()),
               steps_min=int(steps.min()), steps_max=int(steps.max()),
               retry_levels=np.bincount(lvl.astype(int),
                                        minlength=4).tolist(),
               vs_serial_anchor=round(B * 134.0 / wall, 2))
    say(json.dumps(out))


def mc(nph=4_000_000):
    sys.path.insert(0, "/root/repo")
    import dataclasses
    import bench as benchmod
    say("backend:", jax.default_backend(), "argv:", sys.argv)
    t0 = time.time()
    m = benchmod.build_bench_model(nph=100_000)
    mb = int(os.environ.get("R5_MAXB", 0))
    spc = int(os.environ.get("R5_SPC", 0))
    if mb or spc:
        m.mc_cfg = dataclasses.replace(
            m.mc_cfg, **({"max_batch": mb} if mb else {}),
            **({"steps_per_call": spc} if spc else {}))
        say("knobs:", m.mc_cfg.max_batch, m.mc_cfg.steps_per_call)
    say(f"build {time.time()-t0:.1f}s")
    t0 = time.time()
    m.run_mc(n_passes=1, seed=0)       # warmup Lucy pass (compile)
    say(f"lucy warmup pass {time.time()-t0:.1f}s")
    t0 = time.time()
    m.run_mc(n_passes=1, nph=nph, seed=7)
    dt = time.time() - t0
    say(json.dumps(dict(nph=nph, wall_s=round(dt, 1),
                        packets_per_s=round(nph / dt, 1))))


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "chem_prod":
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
        cm = int(sys.argv[3]) if len(sys.argv) > 3 else 16
        chem_prod(B=B, compact_min=cm)
    else:
        nph = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
        mc(nph=nph)
