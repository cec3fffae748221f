"""Full-pass activity profile: where do the packet-steps and the wall
time of one MC pass actually go?

Reports sum(active lanes) over steps (true packet-step work), the
lock-step waste factor (lanes processed / active lanes), steps-per-
packet, and the resulting ns per processed lane-step.
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

    nph = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    m = build_bench_model(nph=nph)
    cfg = m.cfg
    lam_pk, en_pk = starmod.packet_ladder(
        m.star, nph, m.mc_cfg.refine_UV, m.mc_cfg.refine_LyA,
        m.mc_cfg.refine_Xray)
    en_norm = jnp.asarray(np.asarray(en_pk)
                          / (float(np.max(en_pk)) or 1.0))
    lam_pk = jnp.asarray(lam_pk)
    nlam = len(m.tab.lam)
    kw = dict(n_quantile=m.mc_cfg.n_quantile,
              nmax_encounter=m.mc_cfg.nmax_encounter,
              use_mrw=True, save_counts=False)
    m.run_mc(n_passes=1, seed=0)
    cells = m.mc_cells()
    model = mcrt.McModel(tab=m.tab, gi=m.gi, cells=cells,
                         star_mass=cfg.star_mass)
    key = jax.random.PRNGKey(5)
    tall = mcrt.McTallies.zeros(m.grid.n_cells, nlam, m.n_dust, 5)
    pk = mcrt.launch_packets(model, key, lam_pk, en_norm, 0.0, cfg.maxw)
    B0 = int(pk.x.shape[0])

    spc = int(os.environ.get("RAC2D_PROBE_SPC", 64))
    # pass 1 compiles the compaction tier shapes; pass 2 is the measure
    for it in range(int(os.environ.get("RAC2D_PROBE_PASSES", 2))):
        prof = []
        t0 = time.time()

        def cb(done, n_active):
            prof.append((done, n_active, time.time() - t0))

        key_i = jax.random.PRNGKey(5 + it)
        pk = mcrt.launch_packets(model, key_i, lam_pk, en_norm, 0.0,
                                 cfg.maxw)
        tall = mcrt.McTallies.zeros(m.grid.n_cells, nlam, m.n_dust, 5)
        pk, tall, fates = mcrt.mc_pass_hosted(
            model, key_i, pk, tall, compact=True, steps_per_call=spc,
            progress_cb=cb, **kw)
        wall = time.time() - t0
        print(f"pass {it}: {wall:.1f}s  {B0/wall:.0f} packets/s",
              flush=True)
    # lanes processed per chunk = batch shape at that time; active work
    lanes_proc = 0
    act_work = 0
    prev_act = B0
    prev_done = 0
    shape = B0
    for done, n_active, _ in prof:
        steps = done - prev_done
        lanes_proc += steps * shape
        act_work += steps * (prev_act + n_active) / 2
        # compaction shrinks the shape AFTER this report (pow2 ladder)
        tier = max(1 << int(np.ceil(np.log2(max(n_active, 1)))), 1024)
        shape = min(shape, tier)
        prev_act = n_active
        prev_done = done
    print(f"B0={B0} wall={wall:.1f}s  packets/s={B0/wall:.0f}")
    print(f"total steps={prev_done}  lanes processed={lanes_proc/1e6:.1f}M"
          f"  active work={act_work/1e6:.1f}M lane-steps")
    print(f"steps/packet (mean active)={act_work/B0:.0f}")
    print(f"lockstep waste={lanes_proc/max(act_work,1):.2f}x")
    print(f"ns per PROCESSED lane-step={wall/lanes_proc*1e9:.1f}")
    print(f"ns per ACTIVE lane-step={wall/max(act_work,1)*1e9:.1f}")
    for done, n_active, t in prof[:40]:
        print(f"  step {done:6d}  active {n_active:8d}  t={t:7.1f}s")


if __name__ == "__main__":
    main()
