"""Voigt profile (jittable, vectorized).

Role of reference src/voigt.f90 (Humlicek-style region approximation used for
the Lyman-alpha scattering cross section).  Here we implement Humlicek's w4
rational approximation of the Faddeeva function K(x, y) = Re[w(x + i y)]
directly in jnp with `where`-based region selection, which vectorizes cleanly
on the VPU (no data-dependent branching).
"""

import jax.numpy as jnp

SQRT_PI_INV = 0.5641895835477563  # 1/sqrt(pi)


def humlicek_w4(x, y):
    """Re[w(z)], z = x + i y, y >= 0.  Relative accuracy ~1e-4."""
    x = jnp.asarray(x, dtype=jnp.float64 if jnp.asarray(x).dtype == jnp.float64 else jnp.float32)
    y = jnp.broadcast_to(jnp.asarray(y, dtype=x.dtype), jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y)))
    x = jnp.broadcast_to(x, y.shape)
    z = x + 1j * y
    s = jnp.abs(x) + y
    t = y - 1j * x  # = -i z

    # Region I: s >= 15 — 1-term continued fraction.
    wI = t * SQRT_PI_INV / (0.5 + t * t)

    # Region II: 5.5 <= s < 15 — 2-term.
    u = t * t
    wII = t * (1.410474 + u * SQRT_PI_INV) / (0.75 + u * (3.0 + u))

    # Region III: s < 5.5 and y >= 0.195|x| - 0.176.
    wIII = ((16.4955 + t * (20.20933 + t * (11.96482 + t * (3.778987 + t * 0.5642236))))
            / (16.4955 + t * (38.82363 + t * (39.27121 + t * (21.69274 + t * (6.699398 + t))))))

    # Region IV: remainder — 6-term rational in u = t^2 with exp correction.
    wIV = jnp.exp(jnp.clip(u.real, -200.0, 200.0) + 1j * u.imag) - t * (
        36183.31 - u * (3321.9905 - u * (1540.787 - u * (219.0313 - u * (
            35.76683 - u * (1.320522 - u * 0.56419)))))) / (
        32066.6 - u * (24322.84 - u * (9022.228 - u * (2186.181 - u * (
            364.2191 - u * (61.57037 - u * (1.841439 - u)))))))

    w = jnp.where(s >= 15.0, wI,
        jnp.where(s >= 5.5, wII,
        jnp.where(y >= 0.195 * jnp.abs(x) - 0.176, wIII, wIV)))
    return w.real


def voigt(x, a):
    """Voigt function H(a, x) = a/pi * int exp(-t^2)/((x-t)^2+a^2) dt.

    Normalized so that int H(a,x) dx = sqrt(pi); H(0, x) = exp(-x^2).
    """
    return humlicek_w4(x, a)
