"""rac2d_tpu — TPU-native thermo-chemical disk modeling framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
serial Fortran code (2D protoplanetary-disk thermo-chemistry: Monte Carlo
continuum radiative transfer, stiff gas-grain chemistry co-evolved with gas
temperature, NLTE line excitation, ray-traced line/continuum cubes).

Precision policy: the chemistry/thermal solve path is float64 (the problem
spans ~30 decades of abundance and is genuinely ill-conditioned; the
reference is double precision throughout), so x64 is enabled at import.
The Monte Carlo transport and imaging paths run in float32 by explicit
dtype choice in their kernels — statistical noise dominates there.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache, ON by default: the batched implicit-
# solver graphs take minutes to compile and are identical across runs.
# Override the location with RAC2D_COMPILE_CACHE; disable with
# RAC2D_COMPILE_CACHE=0.
_cache = os.environ.get(
    "RAC2D_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "rac2d_tpu_jax"))
if _cache and _cache != "0":
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except (OSError, AttributeError):
        pass

from . import constants  # noqa: E402,F401
