"""Mixed-precision dense linear solves for TPU.

XLA on TPU implements LuDecomposition only for f32/c64, while the stiff
chemistry demands f64 state.  The TPU-native resolution (and a perf win:
the f32 factorization runs on the MXU) is classic mixed-precision:

    1. row-equilibrate A in f64 (chemistry Jacobian rows span ~40 decades),
    2. factor the scaled matrix in f32,
    3. solve in f32, then apply f64 iterative refinement with the exact
       residual (r = b - A x) against the stored f64 matrix.

With equilibration, f32 LU + 2 refinement steps recovers ~f64 solve
accuracy whenever the scaled condition number is << 1/eps_f32 ~ 1e7 —
and the surrounding Newton iterations (BDF / statistical equilibrium)
absorb the rest: an imperfect solve only slows convergence, which the
existing failure ladders already handle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve

N_REFINE = 2


class MPFactor(NamedTuple):
    A: jnp.ndarray          # f64 [n, n] original matrix
    row_scale: jnp.ndarray  # f64 [n]
    col_scale: jnp.ndarray  # f64 [n]
    lu: jnp.ndarray         # f32 [n, n]
    piv: jnp.ndarray        # int32 [n]


def mp_factor(A, col_scale=None) -> MPFactor:
    """Row+column-equilibrated f32 factorization of an f64 matrix.

    col_scale: natural magnitudes of the unknowns (for Newton systems,
    the per-equation error weights rtol*|y| + atol) — scaling columns by
    them makes the solved variables O(1), which is what rescues the f32
    conditioning for chemistry Jacobians whose species span ~30 decades.
    """
    if col_scale is None:
        col_scale = jnp.ones(A.shape[0], dtype=A.dtype)
    Ac = A * col_scale[None, :]
    amax = jnp.max(jnp.abs(Ac), axis=1)
    s = jnp.where(amax > 0.0, 1.0 / amax, 1.0)
    As = (Ac * s[:, None]).astype(jnp.float32)
    lu, piv = lu_factor(As)
    return MPFactor(A=A, row_scale=s, col_scale=col_scale, lu=lu, piv=piv)


def mp_solve(fac: MPFactor, b, n_refine: int = N_REFINE):
    """Solve A x = b (f64) using the mixed-precision factorization."""
    def f32_solve(r):
        rs = (r * fac.row_scale).astype(jnp.float32)
        xp = lu_solve((fac.lu, fac.piv), rs).astype(jnp.float64)
        return xp * fac.col_scale

    x = f32_solve(b)
    for _ in range(n_refine):
        r = b - fac.A @ x
        x = x + f32_solve(r)
    return x


def mp_linsolve(A, b, col_scale=None, n_refine: int = N_REFINE):
    """One-shot mixed-precision solve."""
    return mp_solve(mp_factor(A, col_scale), b, n_refine)
