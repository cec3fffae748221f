"""TWO-PROCESS jax.distributed exercise (VERDICT r3 item 4).

Launches two real processes on localhost (CPU backend, 4 virtual
devices each), initializes jax.distributed through
parallel.mesh.init_distributed, builds the flat 8-device mesh SPANNING
the processes, and runs the sharded chemistry solve — each worker
verifies its addressable shards against a single-process reference
solved here.  Failure of process-spanning collectives (the round loop's
any-lane-active reductions, the replicated-scalar fates) breaks this
test.

SURVEY.md §5 distributed-backend design obligation; the reference has
no distributed anything (serial Fortran), so the expected values come
from the single-process solve of the same system.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

B = 16


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.slow
def test_two_process_sharded_chemistry(network, tmp_path):
    import jax
    import jax.numpy as jnp
    from rac2d_tpu import defaults
    from rac2d_tpu.io import umist
    from rac2d_tpu.ops import bdf as bdfmod, odesys
    from rac2d_tpu.ops.rates import CellEnv

    # single-process reference (this pytest process: 8 virtual devices,
    # 1 process)
    y0 = umist.load_initial_abundances(network, defaults.INIT_ABUNDANCES)
    ode = odesys.ChemicalODE(network)
    rng = np.random.default_rng(1)
    n_gas = 10 ** rng.uniform(4, 6, B)
    d2g = 2.8e-12

    def env_of(i):
        return CellEnv.default(
            Tgas=15.0, Tdust=15.0, n_gas=n_gas[i],
            ratioDust2HnucNum=d2g, ndust_tot=d2g * n_gas[i],
            GrainRadius_CGS=1e-5, sigdust_ave=np.pi * 1e-10,
            SitesPerGrain=4 * np.pi * 1e-10 * 1e15)

    envs = jax.tree.map(lambda *a: jnp.stack(a),
                        *[env_of(i) for i in range(B)])
    rtol, atol = odesys.tolerance_ladder(network, 1, 1e-4, 1e-30, d2g)
    touts = np.asarray(bdfmod.log_output_times(1e-8, 1e1, 2.0))
    res = ode.solve_batched(
        envs, jnp.tile(jnp.asarray(y0), (B, 1)), jnp.full(B, 15.0),
        jnp.asarray(touts), jnp.tile(rtol, (B, 1)),
        jnp.tile(atol, (B, 1)), first_step=1e-8, evolT=False,
        max_steps_per_interval=400)
    assert not np.asarray(res.fail).any()
    ref_npz = tmp_path / "ref.npz"
    np.savez(ref_npz, B=B, n_gas=n_gas, touts=touts,
             y_final=np.asarray(res.ys[:, -1, :]))

    # two real processes spanning one mesh
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__),
                          "distributed_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=4")
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(worker))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    procs = []
    markers = []
    for pid in range(2):
        marker = tmp_path / f"worker{pid}.json"
        markers.append(marker)
        procs.append(subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid),
             str(ref_npz), str(marker)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, p in enumerate(procs):
        assert p.returncode == 0, (
            f"worker {pid} rc={p.returncode}:\n{outs[pid][-3000:]}")
    rows = 0
    for pid, marker in enumerate(markers):
        with open(marker) as f:
            rec = json.load(f)
        assert rec["process_count"] == 2
        assert not rec["any_fail"]
        # identical program on identical inputs; shard-boundary jit
        # partitioning may reorder reductions -> tight-but-not-bitwise
        assert rec["worst_rel"] < 1e-6, rec
        rows += rec["rows_checked"]
    assert rows == B
