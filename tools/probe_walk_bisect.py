"""Bisect the MC walk body cost by knocking out one section at a time
(monkeypatching module functions before tracing).  Usage:
    python tools/probe_walk_bisect.py [nph]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def time_walk(m, model, lam_pk, en_norm, kw, maxw):
    from rac2d_tpu.ops import mcrt
    key = jax.random.PRNGKey(3)
    nlam = len(m.tab.lam)

    def fresh():
        pk = mcrt.launch_packets(model, key, jnp.asarray(lam_pk),
                                 jnp.asarray(en_norm), 0.0, maxw)
        tall = mcrt.McTallies.zeros(m.grid.n_cells, nlam, m.n_dust, 5)
        return pk, tall

    times = {}
    for n in (8, 72):
        pk, tall = fresh()
        out = mcrt._mc_walk(model, key, pk, tall, max_steps=n, **kw)
        jax.block_until_ready(out[1].x)
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            pk, tall = fresh()
            out = mcrt._mc_walk(model, key, pk, tall, max_steps=n, **kw)
            jax.block_until_ready(out[1].x)
        times[n] = (time.time() - t0) / reps
    return (times[72] - times[8]) / 64 * 1e3


def main():
    from bench import build_bench_model
    from rac2d_tpu.models import star as starmod
    from rac2d_tpu.ops import mcrt, optics, geometry

    nph = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    m = build_bench_model(nph=nph)
    cfg = m.cfg
    lam_pk, en_pk = starmod.packet_ladder(
        m.star, nph, m.mc_cfg.refine_UV, m.mc_cfg.refine_LyA,
        m.mc_cfg.refine_Xray)
    en_norm = np.asarray(en_pk) / (float(np.max(en_pk)) or 1.0)
    kw = dict(n_quantile=m.mc_cfg.n_quantile, nmax_encounter=10**9,
              use_mrw=False, save_counts=False, finalize=False)
    cells = m.mc_cells()
    model = mcrt.McModel(tab=m.tab, gi=m.gi, cells=cells,
                         star_mass=cfg.star_mass)
    print(f"B={len(lam_pk)}")

    orig = dict(lya=optics.lya_sigma, locate=geometry.locate,
                exit=geometry.ray_cell_exit_mirror,
                dop=mcrt._doppler_vd, l2b=optics.lam_to_bin)

    def restore():
        optics.lya_sigma = orig["lya"]
        geometry.locate = orig["locate"]
        geometry.ray_cell_exit_mirror = orig["exit"]
        mcrt._doppler_vd = orig["dop"]
        optics.lam_to_bin = orig["l2b"]

    t_full = time_walk(m, model, lam_pk, en_norm, kw, cfg.maxw)
    print(f"full body                   : {t_full:8.3f} ms/step")

    knocks = {
        "lya_sigma -> 0": lambda: setattr(
            optics, "lya_sigma", lambda lam, T: jnp.zeros_like(lam)),
        "locate -> cell 0": lambda: setattr(
            geometry, "locate",
            lambda gi, rsq, z: jnp.zeros(rsq.shape, jnp.int32)),
        "ray_exit -> const": lambda: setattr(
            geometry, "ray_cell_exit_mirror",
            lambda x, y, z, vx, vy, vz, rmin, rmax, zmin, zmax: (
                jnp.full_like(x, 0.05), jnp.full_like(x, 1e-6),
                jnp.zeros(x.shape, jnp.int32),
                jnp.ones(x.shape, bool))),
        "doppler -> 0": lambda: setattr(
            mcrt, "_doppler_vd",
            lambda M, x, y, z, vx, vy: jnp.zeros_like(x)),
        "lam_to_bin -> mid": lambda: setattr(
            optics, "lam_to_bin",
            lambda seg, lam, xp=None: jnp.full(lam.shape, 100,
                                               jnp.int32)),
    }
    for name, apply in knocks.items():
        restore()
        apply()
        t = time_walk(m, model, lam_pk, en_norm, kw, cfg.maxw)
        print(f"{name:28s}: {t:8.3f} ms/step  (saves "
              f"{t_full - t:6.3f})")
    restore()


if __name__ == "__main__":
    main()
