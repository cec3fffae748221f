"""Single-process walk-body bisection: loops RAC2D_MC_DISABLE configs,
clearing the jit cache between (the disable set is read at trace time).
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

    nph = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    m = build_bench_model(nph=nph)
    cfg = m.cfg
    lam_pk, en_pk = starmod.packet_ladder(
        m.star, nph, m.mc_cfg.refine_UV, m.mc_cfg.refine_LyA,
        m.mc_cfg.refine_Xray)
    en_norm = np.asarray(en_pk) / (float(np.max(en_pk)) or 1.0)
    nlam = len(m.tab.lam)
    cells = m.mc_cells()
    model = mcrt.McModel(tab=m.tab, gi=m.gi, cells=cells,
                         star_mass=cfg.star_mass)
    key = jax.random.PRNGKey(3)
    pk0 = mcrt.launch_packets(model, key, jnp.asarray(lam_pk),
                              jnp.asarray(en_norm), 0.0, cfg.maxw)
    # freeze all lanes active so no early termination skews marginals
    pk0 = pk0._replace(status=jnp.zeros_like(pk0.status))
    tall0 = mcrt.McTallies.zeros(m.grid.n_cells, nlam, m.n_dust, 5)
    B = int(pk0.x.shape[0])
    use_mrw = os.environ.get("RAC2D_PROBE_MRW", "0") == "1"
    save_counts = os.environ.get("RAC2D_PROBE_COUNTS", "0") == "1"
    print(f"B={B} mrw={use_mrw}", flush=True)

    configs = sys.argv[2].split(";") if len(sys.argv) > 2 else [
        "", "rng", "cellgather", "tabgather", "lyagather", "reemit",
        "locate", "log", "geom",
        "rng,cellgather,tabgather,lyagather,reemit,locate,log,geom"]
    base = None
    for dis in configs:
        os.environ["RAC2D_MC_DISABLE"] = dis
        mcrt._mc_walk.clear_cache()
        ts = {}
        for K in (8, 72):
            kk = jax.random.PRNGKey(7)

            def fresh():
                # _mc_walk donates packets+tallies: hand it copies
                return (jax.tree.map(jnp.copy, pk0),
                        jax.tree.map(jnp.copy, tall0))

            pk_i, tl_i = fresh()
            _, pk, tl = mcrt._mc_walk(
                model, kk, pk_i, tl_i, max_steps=K,
                nmax_encounter=10 ** 9, use_mrw=use_mrw,
                finalize=False, save_counts=save_counts)
            jax.block_until_ready(tl.flux)
            t0 = time.time()
            for _ in range(3):
                pk_i, tl_i = fresh()
                _, pk, tl = mcrt._mc_walk(
                    model, kk, pk_i, tl_i, max_steps=K,
                    nmax_encounter=10 ** 9, use_mrw=use_mrw,
                    finalize=False, save_counts=save_counts)
                jax.block_until_ready(tl.flux)
            ts[K] = (time.time() - t0) / 3
        marg = (ts[72] - ts[8]) / 64 * 1e3
        if base is None:
            base = marg
        print(f"disable=[{dis:60s}] {marg:8.3f} ms/step "
              f"({marg/B*1e6:5.1f} ns/lane)  delta={base-marg:+7.3f}",
              flush=True)


if __name__ == "__main__":
    main()
