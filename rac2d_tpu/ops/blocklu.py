"""Blocked no-pivot LU factorization + solves, built from matmuls.

XLA's LuDecomposition on TPU is a generic row-pivoted routine that
serializes badly; this module implements the classic right-looking
blocked LU *without pivoting* as straight jnp so the panel updates and
the (precomputed) inverse-diagonal-block substitutions lower to batched
MXU matmuls.  Correctness contract:

  - inputs are row/column-equilibrated matrices of the form I - c J (the
    Newton matrices of the solvers here), for which no-pivot LU with a
    tiny pivot floor is stable enough in f32;
  - tiny pivots are floored (a small perturbation E of A is factored
    instead), and the surrounding Newton/iterative-refinement loops
    absorb the difference — the same contract mixed-precision solving
    already relies on.

Factorization returns the packed LU plus the explicit inverses of the
diagonal blocks, so forward/backward substitution is block matmuls with
no triangular solves at all.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BK = 64          # panel size (MXU-friendly)
PIV_FLOOR = 1e-20

# TPU MXU f32 matmuls default to bf16 passes (Precision.DEFAULT), which
# is fatal inside a factorization: pin full f32 accumulation everywhere.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


class BlockLU(NamedTuple):
    lu: jnp.ndarray       # [N, N] packed L\\U (unit lower diag implied)
    linv: jnp.ndarray     # [K, BK, BK] inverses of unit-lower diag blocks
    uinv: jnp.ndarray     # [K, BK, BK] inverses of upper diag blocks


def _pad(A, N):
    n = A.shape[-1]
    if n == N:
        return A
    P = jnp.zeros(A.shape[:-2] + (N, N), A.dtype)
    P = P.at[..., :n, :n].set(A)
    # identity on the padding so the factorization stays nonsingular
    idx = jnp.arange(n, N)
    return P.at[..., idx, idx].set(1.0)


def _factor_block(D):
    """Unblocked no-pivot LU of a BK x BK block (masked rank-1 updates)."""
    rows = jnp.arange(BK)

    def step(j, D):
        piv = D[j, j]
        piv = jnp.where(jnp.abs(piv) < PIV_FLOOR,
                        jnp.where(piv < 0, -PIV_FLOOR, PIV_FLOOR), piv)
        col = jnp.where(rows > j, D[:, j] / piv, 0.0)
        rowj = jnp.where(rows > j, D[j, :], 0.0)
        D = D - jnp.outer(col, rowj)
        D = D.at[:, j].set(jnp.where(rows > j, col, D[:, j]))
        return D.at[j, j].set(piv)

    return jax.lax.fori_loop(0, BK, step, D)


def _unit_lower_inv(L):
    """Inverse of a unit-lower-triangular BK x BK block."""
    rows = jnp.arange(BK)

    def step(j, Y):
        col = jnp.where(rows > j, L[:, j], 0.0)
        return Y - jnp.outer(col, Y[j, :])

    return jax.lax.fori_loop(0, BK, step, jnp.eye(BK, dtype=L.dtype))


def _upper_inv(U):
    """Inverse of an upper-triangular BK x BK block."""
    rows = jnp.arange(BK)
    d = jnp.diagonal(U)
    d = jnp.where(jnp.abs(d) < PIV_FLOOR, PIV_FLOOR, d)
    Y0 = jnp.diag(1.0 / d)

    def step(jj, Y):
        j = BK - 1 - jj
        # X[i, :] -= U[i, j] / d_i * X[j, :] for rows i < j
        col = jnp.where(rows < j, U[:, j] / d, 0.0)
        return Y - jnp.outer(col, Y[j, :])

    return jax.lax.fori_loop(0, BK, step, Y0)


def block_lu(A) -> BlockLU:
    """Factor one matrix (vmap for batches).  A: [n, n], any float dtype."""
    n = A.shape[-1]
    N = ((n + BK - 1) // BK) * BK
    K = N // BK
    lu = _pad(A, N)
    linvs = []
    uinvs = []
    for k in range(K):
        kb = k * BK
        D = _factor_block(lu[kb:kb + BK, kb:kb + BK])
        lu = lu.at[kb:kb + BK, kb:kb + BK].set(D)
        Li = _unit_lower_inv(D)
        Ui = _upper_inv(D)
        linvs.append(Li)
        uinvs.append(Ui)
        if kb + BK < N:
            # row panel: U_k* = Linv @ A_k*
            rowp = _mm(Li, lu[kb:kb + BK, kb + BK:])
            lu = lu.at[kb:kb + BK, kb + BK:].set(rowp)
            # column panel: L_*k = A_*k @ Uinv
            colp = _mm(lu[kb + BK:, kb:kb + BK], Ui)
            lu = lu.at[kb + BK:, kb:kb + BK].set(colp)
            # trailing update
            trail = lu[kb + BK:, kb + BK:] - _mm(colp, rowp)
            lu = lu.at[kb + BK:, kb + BK:].set(trail)
    return BlockLU(lu=lu, linv=jnp.stack(linvs), uinv=jnp.stack(uinvs))


def block_invert(fac: BlockLU):
    """Explicit inverse from the blocked factorization (vmap for batches).

    Builds inv(L) and inv(U) by block substitution against the identity
    (K panel steps of MXU matmuls each), then multiplies.  Costs ~3x the
    matmul volume of the factorization itself but turns every subsequent
    solve into ONE batched matvec — the right trade on TPU when the same
    factorization serves several Newton iterations per round and the
    substitutions would otherwise be latency-bound panel chains."""
    N = fac.lu.shape[-1]
    K = N // BK
    eye = jnp.eye(N, dtype=fac.lu.dtype)
    # inv(L): forward block substitution L X = I
    Xl = jnp.zeros((N, N), fac.lu.dtype)
    R = eye
    for k in range(K):
        kb = k * BK
        Xk = _mm(fac.linv[k], R[kb:kb + BK, :])
        Xl = Xl.at[kb:kb + BK, :].set(Xk)
        if kb + BK < N:
            R = R.at[kb + BK:, :].add(
                -_mm(fac.lu[kb + BK:, kb:kb + BK], Xk))
    # inv(U): backward block substitution U X = I
    Xu = jnp.zeros((N, N), fac.lu.dtype)
    R = eye
    for k in range(K - 1, -1, -1):
        kb = k * BK
        Xk = _mm(fac.uinv[k], R[kb:kb + BK, :])
        Xu = Xu.at[kb:kb + BK, :].set(Xk)
        if kb > 0:
            R = R.at[:kb, :].add(-_mm(fac.lu[:kb, kb:kb + BK], Xk))
    return _mm(Xu, Xl)


def block_lu_solve(fac: BlockLU, b):
    """Solve A x = b given the blocked factorization (vmap for batches).
    b keeps its original length n; the padded tail is zero."""
    N = fac.lu.shape[-1]
    K = N // BK
    n = b.shape[-1]
    bp = jnp.zeros(N, fac.lu.dtype).at[:n].set(b.astype(fac.lu.dtype))
    # forward: L y = b  (unit lower; diag-block inverses precomputed)
    y = bp
    for k in range(K):
        kb = k * BK
        yk = _mm(fac.linv[k], y[kb:kb + BK])
        y = y.at[kb:kb + BK].set(yk)
        if kb + BK < N:
            y = y.at[kb + BK:].add(-_mm(fac.lu[kb + BK:, kb:kb + BK], yk))
    # backward: U x = y
    x = y
    for k in range(K - 1, -1, -1):
        kb = k * BK
        xk = _mm(fac.uinv[k], x[kb:kb + BK])
        x = x.at[kb:kb + BK].set(xk)
        if kb > 0:
            x = x.at[:kb].add(-_mm(fac.lu[:kb, kb:kb + BK], xk))
    return x[:n]
