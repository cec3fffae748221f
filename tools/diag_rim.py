"""Diagnose the inner-rim coupled-production failure (VERDICT r4 #1).

Runs ONLY the inner-rim cell (T=300, n=1e9, G0=1e4) of
tests/test_chem_production.py with per-round progress so we can see
where/why h collapses at t ~ 7.4e5 yr.
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from test_parity_oracle import _env_pairs
from rac2d_tpu import defaults
from rac2d_tpu.io import umist
from rac2d_tpu.ops import bdf as bdfmod
from rac2d_tpu.ops import odesys, thermal

REF = "/root/reference/inp"
net = umist.load_network(
    f"{REF}/rate06_withgrain_lowH2Bind_hiOBind_lowCObind.dat",
    enthalpy_path=f"{REF}/Species_enthalpy.dat")

POINT = dict(T=300.0, Tdust=80.0, n=1e9, Av=0.5, G0star=1e4)
B = 1

y0 = umist.load_initial_abundances(net, defaults.INIT_ABUNDANCES)
tb = thermal.ThermalBalance(net)
ode = odesys.ChemicalODE(net, thermal=tb)

cenvs = [_env_pairs(POINT)[1]] * B
envs = jax.tree.map(lambda *a: jnp.stack([jnp.asarray(x) for x in a]), *cenvs)

d2g_n = 2.8e-12
tenv1 = thermal.ThermalEnv.default(
    omega_Kepler=2e-9, velo_width_turb=3e4, coherent_length=1e13,
    n_dusts=np.array([d2g_n * POINT["n"], 0, 0, 0]),
    sig_dusts=np.array([np.pi * 1e-10, 0, 0, 0]),
    Tdusts=np.array([POINT["Tdust"], 0, 0, 0]))
tenvs = jax.tree.map(lambda *a: jnp.stack(a), *[tenv1] * B)
d2g = 2.8e-12
rtol, atol = odesys.tolerance_ladder(net, 1, 1e-4, 1e-30, d2g)
touts = jnp.asarray(bdfmod.log_output_times(1e-8, 1e6, 2.0))
T0 = jnp.asarray([POINT["T"]] * B)

t0 = time.time()


def cb(k, st):
    t = np.asarray(st.t)
    h = np.asarray(st.h)
    o = np.asarray(st.order)
    f = np.asarray(st.fail)
    ns = np.asarray(st.n_steps)
    Tg = np.asarray(st.D[:, 0, net.n_species])
    print(f"[{time.time()-t0:7.1f}s] call {k:4d}: t={t[0]:.4e} "
          f"h={h[0]:.3e} ord={o[0]} steps={ns[0]} Tg={Tg[0]:.1f} "
          f"fail={f[0]}", flush=True)


res = ode.solve_batched(
    envs, jnp.tile(jnp.asarray(y0), (B, 1)), T0, touts,
    jnp.tile(rtol, (B, 1)), jnp.tile(atol, (B, 1)),
    first_step=1e-8, evolT=True, tenvs=tenvs, continuous=True,
    max_steps_per_interval=500, host_loop=True, progress_cb=cb,
    rounds_per_call=64)

print("fail:", np.asarray(res.fail))
print("t_final:", np.asarray(res.t_final))
print("n_steps:", np.asarray(res.n_steps))
ys = np.asarray(res.ys)
nS = net.n_species
# last few recorded states around failure
ts = np.asarray(res.ts)[0]
for j in range(len(ts) - 6, len(ts)):
    Tg = ys[0, j, nS]
    print(f"rec {j}: t={ts[j]:.4e} Tg={Tg:.2f}")
# save final state for kink scanning
np.savez("/tmp/rim_state.npz", y=ys[0, -1], ts=ts, ys=ys[0])
