"""Blackbody radiation and simple radiative helpers (jittable).

Replaces the scalar helpers of the reference (src/sub_trivials.f90:1238-1259
``planck_B_nu``/``planck_B_lambda`` and :1064 ``tau2beta``) with vectorized
jnp implementations usable inside jitted TPU code.
"""

import jax.numpy as jnp

from .. import constants as c


def B_nu(T, nu):
    """Planck function per unit frequency [erg s^-1 cm^-2 Hz^-1 sr^-1]."""
    T = jnp.asarray(T)
    x = c.hPlanck_CGS * nu / (c.kBoltzmann_CGS * jnp.maximum(T, 1e-100))
    x = jnp.clip(x, 0.0, c.max_exp)
    # expm1 keeps precision in the Rayleigh-Jeans tail.
    val = (2.0 * c.hPlanck_CGS * nu**3 / c.SpeedOfLight_CGS**2) / jnp.expm1(x)
    return jnp.where(T > 0.0, val, 0.0)


def B_lambda(T, lam_cm):
    """Planck function per unit wavelength [erg s^-1 cm^-2 cm^-1 sr^-1]."""
    T = jnp.asarray(T)
    x = c.hPlanck_CGS * c.SpeedOfLight_CGS / (
        lam_cm * c.kBoltzmann_CGS * jnp.maximum(T, 1e-100))
    x = jnp.clip(x, 0.0, c.max_exp)
    val = (2.0 * c.hPlanck_CGS * c.SpeedOfLight_CGS**2 / lam_cm**5) / jnp.expm1(x)
    return jnp.where(T > 0.0, val, 0.0)


def B_lambda_np(T, lam_cm):
    """Pure-numpy B_lambda for HOST-side table building.

    The jnp version executes on the default device; on TPU the emulated
    f64 expm1 returns NaN for large arguments, which poisoned the
    Tdust lookup tables built at prepare time.  Host tables must never
    touch the accelerator."""
    import numpy as np
    T = np.asarray(T, dtype=np.float64)
    lam_cm = np.asarray(lam_cm, dtype=np.float64)
    x = np.clip(c.hPlanck_CGS * c.SpeedOfLight_CGS
                / (lam_cm * c.kBoltzmann_CGS * np.maximum(T, 1e-100)),
                0.0, c.max_exp)
    val = (2.0 * c.hPlanck_CGS * c.SpeedOfLight_CGS ** 2
           / lam_cm ** 5) / np.expm1(x)
    return np.where(T > 0.0, val, 0.0)


def tau2beta(tau):
    """Escape probability beta(tau) = (1 - exp(-3 tau)) / (3 tau).

    Series expansion near tau=0 for numerical stability; clamps the
    exponent like the reference (src/sub_trivials.f90:1064).
    """
    tau = jnp.asarray(tau)
    t3 = 3.0 * tau
    small = jnp.abs(t3) < 1e-4
    # 2-term Taylor: (1 - e^-x)/x = 1 - x/2 + x^2/6
    series = 1.0 - t3 / 2.0 + t3 * t3 / 6.0
    t3c = jnp.clip(t3, -c.max_exp, c.max_exp)
    full = -jnp.expm1(-t3c) / jnp.where(small, 1.0, t3c)
    return jnp.where(small, series, full)
