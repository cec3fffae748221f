"""Scan dT/dt smoothness near the rim limit point Tg~1378 K.

Loads the final state from tools/diag_rim.py (/tmp/rim_state.npz) and
scans the net heating-cooling rate and each component over a fine T grid
to locate any C0/C1 kink that stalls the BDF near equilibrium.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from test_parity_oracle import _env_pairs
from rac2d_tpu.io import umist
from rac2d_tpu.ops import thermal
from rac2d_tpu.ops.rates import compute_rates
from rac2d_tpu.ops import odesys

REF = "/root/reference/inp"
net = umist.load_network(
    f"{REF}/rate06_withgrain_lowH2Bind_hiOBind_lowCObind.dat",
    enthalpy_path=f"{REF}/Species_enthalpy.dat")

POINT = dict(T=300.0, Tdust=80.0, n=1e9, Av=0.5, G0star=1e4)
_, cenv = _env_pairs(POINT)
d2g_n = 2.8e-12
tenv = thermal.ThermalEnv.default(
    omega_Kepler=2e-9, velo_width_turb=3e4, coherent_length=1e13,
    n_dusts=np.array([d2g_n * POINT["n"], 0, 0, 0]),
    sig_dusts=np.array([np.pi * 1e-10, 0, 0, 0]),
    Tdusts=np.array([POINT["Tdust"], 0, 0, 0]))

dat = np.load("/tmp/rim_state.npz")
y = jnp.asarray(dat["y"])   # [NEQ] final state
nS = net.n_species

tb = thermal.ThermalBalance(net)
ode = odesys.ChemicalODE(net, thermal=tb)


def rates_at(T):
    k = compute_rates(ode.tab, cenv, T, ode.diff2des, ode.h2_form_use_moeq)
    return tb.rates(y, T, cenv, tenv, k)


rates_v = jax.jit(jax.vmap(rates_at))

Ts = jnp.asarray(np.linspace(1370.0, 1390.0, 4001))
r = rates_v(Ts)
nets = np.asarray(r.net())
Ts = np.asarray(Ts)

# find sign changes and curvature spikes of the net rate
d1 = np.diff(nets) / np.diff(Ts)
d2 = np.diff(d1)
print("net rate at ends:", nets[0], nets[-1])
sgn = np.where(np.diff(np.sign(nets)))[0]
print("zero crossings at T =", Ts[sgn])
# biggest second-difference spikes = kink candidates
isp = np.argsort(np.abs(d2))[-12:]
print("kink candidates (T, |d2|):")
for i in sorted(isp):
    print(f"  T={Ts[i+1]:.4f}  d2={d2[i]:.4e}  net={nets[i+1]:.4e}")

# per-component slopes around the sharpest kink
fields = r._fields
arr = np.stack([np.asarray(getattr(r, f)) for f in fields])
dd2 = np.abs(np.diff(np.diff(arr, axis=1), axis=1))
worst = dd2.max(axis=1)
order = np.argsort(worst)[::-1]
print("\ncomponent kinkiness (max |second diff| over scan):")
for j in order[:10]:
    i = int(np.argmax(dd2[j]))
    print(f"  {fields[j]:32s} max_d2={worst[j]:.4e} at T={Ts[i+1]:.4f} "
          f"val={arr[j, i+1]:.4e}")
