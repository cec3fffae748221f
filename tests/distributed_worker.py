"""Worker for tests/test_distributed.py: one of two jax.distributed
processes on localhost CPU.  Runs the sharded chemistry solve over the
global 2-process x 4-virtual-device mesh and compares its addressable
shards against the single-process reference npz.

Usage: distributed_worker.py <coordinator> <num_procs> <pid> <ref_npz>
                             <out_marker>
"""
import json
import sys

import numpy as np


def main():
    coord, nproc, pid, ref_npz, out_marker = sys.argv[1:6]
    import jax
    jax.config.update("jax_platforms", "cpu")   # axon plugin hijack
    from rac2d_tpu.parallel import mesh as meshmod
    meshmod.init_distributed(coord, int(nproc), int(pid))
    assert jax.process_count() == int(nproc), jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import jax.numpy as jnp
    from rac2d_tpu import defaults
    from rac2d_tpu.io import umist
    from rac2d_tpu.ops import bdf as bdfmod, odesys
    from rac2d_tpu.ops.rates import CellEnv

    ref = np.load(ref_npz)
    net = umist.load_network(defaults.NETWORK,
                             enthalpy_path=defaults.ENTHALPIES)
    y0 = umist.load_initial_abundances(net, defaults.INIT_ABUNDANCES)
    ode = odesys.ChemicalODE(net)
    B = int(ref["B"])
    n_gas = ref["n_gas"]
    d2g = 2.8e-12

    def env_of(i):
        return CellEnv.default(
            Tgas=15.0, Tdust=15.0, n_gas=n_gas[i],
            ratioDust2HnucNum=d2g, ndust_tot=d2g * n_gas[i],
            GrainRadius_CGS=1e-5, sigdust_ave=np.pi * 1e-10,
            SitesPerGrain=4 * np.pi * 1e-10 * 1e15)

    envs = jax.tree.map(lambda *a: jnp.stack(a),
                        *[env_of(i) for i in range(B)])
    rtol, atol = odesys.tolerance_ladder(net, 1, 1e-4, 1e-30, d2g)
    touts = jnp.asarray(ref["touts"])
    res = meshmod.sharded_chemistry_solve(
        meshmod.make_mesh(), ode, envs, None,
        jnp.tile(jnp.asarray(y0), (B, 1)), jnp.full(B, 15.0), touts,
        jnp.tile(rtol, (B, 1)), jnp.tile(atol, (B, 1)), 1e-8, False,
        max_steps_per_interval=400)
    # every process checks ITS addressable rows against the reference
    y_ref = ref["y_final"]                       # [B, nS+1]
    worst = 0.0
    n_rows = 0
    yfin = res.ys[:, -1, :]
    for shard in yfin.addressable_shards:
        rows = shard.index[0]
        mine = np.asarray(shard.data)
        theirs = y_ref[rows]
        denom = np.maximum(np.abs(theirs), 1e-20)
        w = float(np.max(np.abs(mine - theirs)
                         / np.where(np.abs(theirs) > 1e-18, denom, 1.0)))
        worst = max(worst, w)
        n_rows += mine.shape[0]
    fail = bool(np.any(np.asarray(
        jnp.sum(jnp.asarray(res.fail).astype(jnp.int32)))))
    with open(out_marker, "w") as f:
        json.dump({"pid": int(pid), "worst_rel": worst,
                   "rows_checked": n_rows, "any_fail": fail,
                   "process_count": jax.process_count()}, f)
    print(f"worker {pid}: worst_rel={worst:.2e} rows={n_rows}")


if __name__ == "__main__":
    main()
