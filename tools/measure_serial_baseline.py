"""Measure the serial CPU baselines anchoring bench.py's vs_baseline.

Writes/updates BASELINE_MEASURED.json (committed) with:

  - chemistry: scipy sparse-BDF on the dark-cloud cell at the reference
    tolerances (closest DLSODES stand-in available — no gfortran in this
    image; reference solver is /root/reference/src/opkdmain.f:1757).
    Uses the independent numpy oracle (tests/oracle_chem.py), NOT the
    code under test.
  - mc: this framework's transport kernel pinned to ONE CPU core via
    sched_setaffinity — a compiled-serial stand-in for the reference's
    serial Fortran MC (src/montecarlo.f90:398-800; no published numbers).

Run: python tools/measure_serial_baseline.py [chem|mc]
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
OUT = os.path.join(ROOT, "BASELINE_MEASURED.json")


def measure_chem():
    import numpy as np
    from scipy.integrate import solve_ivp
    from scipy.sparse import csc_matrix

    import oracle_chem as oc
    from rac2d_tpu import defaults
    from rac2d_tpu.io import umist

    net = umist.load_network(defaults.NETWORK,
                             enthalpy_path=defaults.ENTHALPIES)
    y0 = umist.load_initial_abundances(net, defaults.INIT_ABUNDANCES)
    d2g = 2.8e-12
    n_gas = 1e5
    grain_a = 1e-5
    env = dict(Tdust=10.0, n_gas=n_gas,
               zeta_cosmicray_H2=1.36e-17, zeta_Xray_H2=0.0,
               Ncol_toISM=n_gas * 1e17,
               Av_toISM=20.0, Av_toStar=20.0,
               G0_UV_toISM=1.0, G0_UV_toStar=0.0, G0_UV_H2phd=0.0,
               G0_UV_toStar_photoDesorb=0.0, phflux_Lya=0.0,
               omega_albedo=0.5, GrainRadius_CGS=grain_a,
               sigdust_ave=np.pi * grain_a ** 2,
               ndust_tot=d2g * n_gas, ratioDust2HnucNum=d2g,
               SitesPerGrain=4.0 * np.pi * grain_a ** 2 * 1e15,
               fss_ism={}, fss_star={})
    k = oc.oracle_rates(net, env, 10.0)
    t0 = time.time()
    sol = solve_ivp(
        lambda t, y: oc.oracle_rhs(net, k, y, d2g, env["SitesPerGrain"]),
        (0.0, 1e6), y0, method="BDF",
        jac=lambda t, y: csc_matrix(
            oc.oracle_jac(net, k, y, d2g, env["SitesPerGrain"])),
        rtol=1e-4, atol=1e-30)
    wall = time.time() - t0
    n_steps = len(sol.t)
    return {
        "solver": "scipy BDF, sparse analytic Jacobian (stand-in for "
                  "reference DLSODES; no gfortran in image)",
        "cell": "dark cloud n=1e5 T=10K, 485 eqns, 1e-8..1e6 yr, "
                "rtol 1e-4 atol 1e-30",
        "n_steps": n_steps,
        "wall_s": round(wall, 2),
        "t_reached_yr": float(sol.t[-1]),
        "finished": bool(sol.success),
        "steps_per_s": round(n_steps / wall, 1),
    }


def measure_chem_jit():
    """Serial stand-in using the STRONGEST serial implementation at hand:
    scipy's BDF stepping a compiled (XLA-jitted, f64) RHS/Jacobian on one
    pinned CPU core.  The numpy-oracle variant (measure_chem) evaluates
    the 5830-reaction RHS in interpreted numpy and would understate the
    reference Fortran's per-call speed by ~5x, inflating our
    vs_baseline; this is the anchor bench.py uses."""
    os.sched_setaffinity(0, {0})
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from scipy.integrate import solve_ivp
    from scipy.sparse import csc_matrix

    from rac2d_tpu import defaults
    from rac2d_tpu.io import umist
    from rac2d_tpu.ops import odesys
    from rac2d_tpu.ops.rates import CellEnv

    net = umist.load_network(defaults.NETWORK,
                             enthalpy_path=defaults.ENTHALPIES)
    y0 = umist.load_initial_abundances(net, defaults.INIT_ABUNDANCES)
    ode = odesys.ChemicalODE(net)
    d2g = 2.8e-12
    n_gas = 1e5
    env = CellEnv.default(
        Tgas=10.0, Tdust=10.0, n_gas=n_gas, Av_toISM=20.0,
        Av_toStar=20.0, G0_UV_toISM=1.0, Ncol_toISM=n_gas * 1e17,
        GrainRadius_CGS=1e-5, sigdust_ave=np.pi * 1e-10,
        ndust_tot=d2g * n_gas, ratioDust2HnucNum=d2g,
        SitesPerGrain=4 * np.pi * 1e-10 * 1e15)
    # fixed T -> fixed k, computed once (reference recomputes only on T
    # change, disk.f90:4577-4580)
    k = ode._rates(env, env.Tgas)
    f = jax.jit(ode.make_f(env, False, k=k))
    jac = jax.jit(ode.make_jac(env, False, k=k))
    y0T = np.concatenate([y0, [10.0]])
    f(jnp.asarray(y0T)); jac(jnp.asarray(y0T))   # compile outside timer
    t0 = time.time()
    sol = solve_ivp(
        lambda t, y: np.asarray(f(y)), (0.0, 1e6), y0T, method="BDF",
        jac=lambda t, y: csc_matrix(np.asarray(jac(y))),
        rtol=1e-4, atol=1e-30)
    wall = time.time() - t0
    n_steps = len(sol.t)
    return {
        "solver": "scipy BDF + XLA-compiled f64 RHS/Jacobian, 1 pinned "
                  "CPU core (strongest serial stand-in for reference "
                  "DLSODES; no gfortran in image)",
        "cell": "dark cloud n=1e5 T=10K, fixed-T species system, "
                "0..1e6 yr, rtol 1e-4 atol 1e-30",
        "n_steps": n_steps,
        "wall_s": round(wall, 2),
        "t_reached_yr": float(sol.t[-1]),
        "finished": bool(sol.success),
        "steps_per_s": round(n_steps / wall, 1),
    }


def measure_chem_jit_coupled():
    """Serial stand-in for the PRODUCTION workload: the coupled
    chemistry+temperature system (NEQ = nSpecies+1, reference
    disk.f90:4653-4657) with scipy BDF + compiled RHS/Jacobian on one
    pinned core, 0..1e6 yr."""
    os.sched_setaffinity(0, {0})
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from scipy.integrate import solve_ivp
    from scipy.sparse import csc_matrix

    from rac2d_tpu import defaults
    from rac2d_tpu.io import umist
    from rac2d_tpu.ops import odesys, thermal
    from rac2d_tpu.ops.rates import CellEnv

    net = umist.load_network(defaults.NETWORK,
                             enthalpy_path=defaults.ENTHALPIES)
    y0 = umist.load_initial_abundances(net, defaults.INIT_ABUNDANCES)
    tb = thermal.ThermalBalance(net)
    ode = odesys.ChemicalODE(net, thermal=tb)
    d2g = 2.8e-12
    n_gas = 1e6
    env = CellEnv.default(
        Tgas=20.0, Tdust=20.0, n_gas=n_gas, Av_toISM=5.0,
        Av_toStar=5.0, G0_UV_toISM=1.0, Ncol_toISM=n_gas * 1e17,
        GrainRadius_CGS=1e-5, sigdust_ave=np.pi * 1e-10,
        ndust_tot=d2g * n_gas, ratioDust2HnucNum=d2g,
        SitesPerGrain=4 * np.pi * 1e-10 * 1e15)
    tenv = thermal.ThermalEnv.default(
        omega_Kepler=2e-9, velo_width_turb=3e4, coherent_length=1e13,
        # dust population: gas-grain coupling, matching the bench env
        n_dusts=np.array([d2g * n_gas, 0, 0, 0]),
        sig_dusts=np.array([np.pi * 1e-10, 0, 0, 0]),
        Tdusts=np.array([20.0, 0, 0, 0]))
    f = jax.jit(ode.make_f(env, True, tenv))
    jac = jax.jit(ode.make_jac(env, True, tenv))
    y0T = np.concatenate([y0, [20.0]])
    f(jnp.asarray(y0T)); jac(jnp.asarray(y0T))   # compile outside timer
    t0 = time.time()
    sol = solve_ivp(
        lambda t, y: np.asarray(f(y)), (0.0, 1e6), y0T, method="BDF",
        jac=lambda t, y: csc_matrix(np.asarray(jac(y))),
        rtol=1e-4, atol=1e-30)
    wall = time.time() - t0
    n_steps = len(sol.t)
    return {
        "solver": "scipy BDF + XLA-compiled coupled chemistry+T "
                  "RHS/Jacobian, 1 pinned CPU core",
        "cell": "n=1e6 T0=20K, NEQ=486 coupled, 0..1e6 yr, "
                "rtol 1e-4 atol 1e-30",
        "n_steps": n_steps,
        "wall_s": round(wall, 2),
        "t_reached_yr": float(sol.t[-1]),
        "finished": bool(sol.success),
        "steps_per_s": round(n_steps / wall, 1),
    }


def measure_mc(nph=10_000):
    os.sched_setaffinity(0, {0})            # ONE core, genuinely serial
    import jax
    jax.config.update("jax_platforms", "cpu")   # axon plugin hijack
    import bench
    m = bench.build_bench_model(nph=nph)
    pps = bench.time_mc_pass(m, nph)
    return {
        "kernel": "rac2d_tpu mc_pass pinned to 1 CPU core "
                  "(sched_setaffinity) — compiled-serial stand-in",
        "n_cells_active": int(m.grid.using.sum()),
        "nph": nph,
        "packets_per_s_1core_cpu": round(pps, 1),
    }


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    try:
        with open(OUT) as f:
            data = json.load(f)
    except FileNotFoundError:
        data = {}
    if which in ("chem", "all"):
        data["oracle_numpy"] = measure_chem()
        print("chem oracle:", data["oracle_numpy"]["steps_per_s"],
              "steps/s")
    if which in ("chem_jit", "all"):
        data.update(measure_chem_jit())
        print("chem jit-RHS:", data["steps_per_s"], "steps/s")
    if which in ("chem_prod",):
        data["coupled"] = measure_chem_jit_coupled()
        print("chem coupled:", data["coupled"]["steps_per_s"], "steps/s")
    if which in ("mc", "all"):
        data["mc"] = measure_mc()
        print("mc:", data["mc"]["packets_per_s_1core_cpu"], "packets/s")
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
