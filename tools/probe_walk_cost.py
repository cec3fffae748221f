"""Marginal per-step cost of the MC walk body on TPU.

Times _mc_walk at several max_steps on a frozen packet batch (status
forced ACTIVE so no early exit) and reports the marginal ms/step.
RAC2D_MC_DISABLE (comma list) bisects the body — see ops/mcrt.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import build_bench_model
    from rac2d_tpu.models import star as starmod
    from rac2d_tpu.ops import mcrt

    nph = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    m = build_bench_model(nph=nph)
    cfg = m.cfg
    lam_pk, en_pk = starmod.packet_ladder(
        m.star, nph, m.mc_cfg.refine_UV, m.mc_cfg.refine_LyA,
        m.mc_cfg.refine_Xray)
    en_norm = np.asarray(en_pk) / (float(np.max(en_pk)) or 1.0)
    nlam = len(m.tab.lam)
    kw = dict(n_quantile=m.mc_cfg.n_quantile,
              nmax_encounter=10**9,     # keep lanes alive
              use_mrw=os.environ.get("RAC2D_PROBE_MRW", "0") == "1",
              save_counts=os.environ.get("RAC2D_PROBE_COUNTS",
                                         "0") == "1",
              finalize=False)
    cells = m.mc_cells()
    model = mcrt.McModel(tab=m.tab, gi=m.gi, cells=cells,
                         star_mass=cfg.star_mass)
    key = jax.random.PRNGKey(3)

    def fresh():
        pk = mcrt.launch_packets(model, key, jnp.asarray(lam_pk),
                                 jnp.asarray(en_norm), 0.0, cfg.maxw)
        tall = mcrt.McTallies.zeros(m.grid.n_cells, nlam, m.n_dust, 5)
        return pk, tall

    print(f"B={len(lam_pk)}  disable={os.environ.get('RAC2D_MC_DISABLE','')}"
          , flush=True)
    times = {}
    for n in (8, 72):
        # compile
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
        print(f"  max_steps={n:4d}: {times[n]*1e3:9.1f} ms", flush=True)
    marg = (times[72] - times[8]) / 64 * 1e3
    print(f"marginal: {marg:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
