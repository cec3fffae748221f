"""Probe: mc_pass_hosted chunk timing on the real TPU.

Round-2's driver bench crashed the TPU worker inside the MC bench
("TPU worker process crashed or restarted ... kernel fault").  This
probe times individual bounded chunks at several steps_per_call values
to find a safe/fast operating point, printing one line per chunk.

Usage: python tools/probe_mc_tpu.py [nph] [steps_per_call ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import build_bench_model
    from rac2d_tpu.models import star as starmod
    from rac2d_tpu.ops import mcrt

    nph = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spcs = [int(a) for a in sys.argv[2:]] or [64, 256, 1024]
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    m = build_bench_model(nph=nph)
    print(f"model prepared in {time.time() - t0:.1f}s; "
          f"{int(m.grid.using.sum())} active cells", flush=True)
    cfg = m.cfg
    lam_pk, en_pk = starmod.packet_ladder(
        m.star, nph, m.mc_cfg.refine_UV, m.mc_cfg.refine_LyA,
        m.mc_cfg.refine_Xray)
    en_norm = np.asarray(en_pk) / (float(np.max(en_pk)) or 1.0)
    nlam = len(m.tab.lam)
    kw = dict(n_quantile=m.mc_cfg.n_quantile,
              nmax_encounter=m.mc_cfg.nmax_encounter,
              use_mrw=m.mc_cfg.use_mrw, mrw_gamma=m.mc_cfg.mrw_gamma,
              mrw_lam_min=m.mc_cfg.mrw_lam_min)
    cells = m.mc_cells()
    model = mcrt.McModel(tab=m.tab, gi=m.gi, cells=cells,
                         star_mass=cfg.star_mass)

    for spc in spcs:
        key = jax.random.PRNGKey(7)
        tall = mcrt.McTallies.zeros(m.grid.n_cells, nlam, m.n_dust, 5)
        pk = mcrt.launch_packets(model, key, jnp.asarray(lam_pk),
                                 jnp.asarray(en_norm), 0.0, cfg.maxw)
        print(f"--- steps_per_call={spc}  B={len(lam_pk)}", flush=True)
        t_pass = time.time()
        nchunk = [0]
        t_last = [time.time()]

        def cb(done, act):
            now = time.time()
            nchunk[0] += 1
            print(f"  chunk {nchunk[0]:3d}: steps={done:7d} "
                  f"active={act:7d} dt={now - t_last[0]:6.2f}s",
                  flush=True)
            t_last[0] = now

        pk, tall, fates = mcrt.mc_pass_hosted(
            model, key, pk, tall, steps_per_call=spc, compact=True,
            progress_cb=cb, **kw)
        jax.block_until_ready(tall.flux)
        dt = time.time() - t_pass
        print(f"  pass done in {dt:.1f}s -> {len(lam_pk)/dt:.0f} "
              f"packets/s; fates={fates}", flush=True)


if __name__ == "__main__":
    main()
