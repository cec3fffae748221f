"""Pallas TPU kernels for the batched blocked no-pivot LU.

Same algorithm as ops/blocklu.py (right-looking blocked LU, BK=64
panels, pivot floor, explicit diagonal-block inverses), but each kernel
invocation factors/solves a *chunk* of batch lanes with the matrices
resident in VMEM:

  - the jnp version's chain of ``lu.at[...].set(...)`` panel updates
    forces XLA to materialize the full [B, N, N] buffer in HBM between
    panels — O(K) extra HBM round-trips of the whole matrix per
    factorization, plus per-op dispatch latency for every one of the
    ~3·BK sequential rank-1 steps per panel;
  - here a chunk of CB lanes is read from HBM once, all K panel stages
    (unblocked factor → triangular inverses → MXU row/column panels →
    MXU trailing update) operate on the VMEM-resident buffer batched
    over the chunk, and the packed LU + block inverses are written back
    once.  DRAM traffic is the information-theoretic minimum
    (~2 × N² × 4 bytes per lane).

Grid: one program per chunk of CB lanes.  N=512 f32 is 1 MB per lane,
so CB=4 keeps (A block + LU block + inverses) under ~9 MB of the ~16 MB
VMEM.

Mosaic constraints honored here (found the hard way):
  - under jax_enable_x64, ANY int64 value in the kernel dies in an
    infinite _convert_helper recursion (i32→i64 widening is unsupported)
    → loop indices are truncated to int32 immediately and all dynamic
    reads are masked reductions against int32 iota, never fancy
    indexing (whose index constants would be int64);
  - batched dot_general is avoided in favor of unrolled 2D jnp.dot
    (MXU) over the CB chunk.

Correctness contract is identical to ops/blocklu.py (row/col-equilibrated
Newton matrices; tiny pivots floored; surrounding f64 refinement absorbs
the rest).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..blocklu import BK, PIV_FLOOR

# lanes per kernel program (VMEM budget: ~2*CB MB for N=512 f32;
# the v5e scoped-vmem limit is 16 MB, CB=2 leaves headroom for temps)
CB = 2


def _loop32(n, body, init):
    """fori_loop with an int32 induction variable.

    Under jax_enable_x64 the induction variable of lax.fori_loop is
    int64, and Mosaic's scalar convert lowering recurses forever on any
    i64<->i32 conversion — so carry our own int32 counter in a
    while_loop instead (the weak-typed literals stay int32)."""
    def cond(carry):
        return carry[0] < n

    def step(carry):
        j, val = carry
        return (j + 1, body(j, val))

    return jax.lax.while_loop(cond, step,
                              (jnp.zeros((), jnp.int32), init))[1]


def _rows2():
    return jax.lax.broadcasted_iota(jnp.int32, (1, BK), 1)        # [1,BK]


def _rows3():
    return jax.lax.broadcasted_iota(jnp.int32, (1, BK, 1), 1)     # [1,BK,1]


def _cols3():
    return jax.lax.broadcasted_iota(jnp.int32, (1, 1, BK), 2)     # [1,1,BK]


_F0 = None  # set lazily: jnp.float32(0) — a python 0.0 would be weak f64


def _f0():
    return jnp.zeros((), jnp.float32)


def _eye32():
    """BK x BK identity from int32 iota (jnp.eye builds i64 iota under
    x64, which Mosaic cannot lower)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (BK, BK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (BK, BK), 1)
    return jnp.where(r == c, jnp.ones((), jnp.float32), _f0())


def _getcol(M, j):
    """Column j of each lane's block.  M: [CB,BK,BK] -> [CB,BK]."""
    return jnp.sum(jnp.where(_cols3() == j, M, _f0()), axis=2)


def _getrow(M, j):
    """Row j of each lane's block.  M: [CB,BK,BK] -> [CB,BK]."""
    return jnp.sum(jnp.where(_rows3() == j, M, _f0()), axis=1)


def _setcol(M, j, col):
    """Write col into column j (branch-free select)."""
    return jnp.where(_cols3() == j, col[:, :, None], M)


def _bmm(a, b):
    """Chunk matmul [CB, m, k] @ [CB, k, n] as unrolled 2D MXU dots."""
    return jnp.stack([
        jnp.dot(a[i], b[i], preferred_element_type=jnp.float32)
        for i in range(CB)])


def _factor_block_c(D):
    """Unblocked no-pivot LU of a chunk of BK x BK blocks.  D: [CB,BK,BK]."""
    rows = _rows2()
    pf = jnp.float32(PIV_FLOOR)   # python-float literals would be weak f64

    def step(j, D):
        colj = _getcol(D, j)                                  # [CB,BK]
        pivj = jnp.sum(jnp.where(rows == j, colj, _f0()), axis=1)
        pivj = jnp.where(jnp.abs(pivj) < pf,
                         jnp.where(pivj < 0, -pf, pf), pivj)
        col = jnp.where(rows > j, colj / pivj[:, None], _f0())
        rowj = jnp.where(rows > j, _getrow(D, j), _f0())      # [CB,BK]
        D = D - col[:, :, None] * rowj[:, None, :]
        # write multipliers below the diagonal + the floored pivot
        newcol = jnp.where(rows > j, col, _getcol(D, j))
        newcol = jnp.where(rows == j, pivj[:, None], newcol)
        return _setcol(D, j, newcol)

    return _loop32(BK, step, D)


def _unit_lower_inv_c(L):
    """Inverses of unit-lower chunk.  L: [CB, BK, BK]."""
    rows = _rows2()
    eye = jnp.broadcast_to(_eye32(), (CB, BK, BK))

    def step(j, Y):
        col = jnp.where(rows > j, _getcol(L, j), _f0())       # [CB,BK]
        return Y - col[:, :, None] * _getrow(Y, j)[:, None, :]

    return _loop32(BK, step, eye)


def _upper_inv_c(U):
    """Inverses of upper-triangular chunk.  U: [CB, BK, BK]."""
    rows = _rows2()
    eyeBK = _eye32()
    d = jnp.sum(U * eyeBK[None], axis=2)                      # [CB,BK]
    pf = jnp.float32(PIV_FLOOR)
    d = jnp.where(jnp.abs(d) < pf, pf, d)
    Y0 = (1.0 / d)[:, :, None] * eyeBK[None]

    def step(jj, Y):
        j = BK - 1 - jj
        col = jnp.where(rows < j, _getcol(U, j) / d, _f0())
        return Y - col[:, :, None] * _getrow(Y, j)[:, None, :]

    return _loop32(BK, step, Y0)


def _lu_kernel(a_ref, lu_ref, linv_ref, uinv_ref):
    """Factor CB matrices fully in VMEM.  The panel loop is a static
    python loop (K is small), so every ref slice is static."""
    N = a_ref.shape[1]
    K = N // BK
    lu_ref[...] = a_ref[...]
    for k in range(K):
        kb = k * BK
        D = _factor_block_c(lu_ref[:, kb:kb + BK, kb:kb + BK])
        lu_ref[:, kb:kb + BK, kb:kb + BK] = D
        Li = _unit_lower_inv_c(D)
        Ui = _upper_inv_c(D)
        linv_ref[:, k, :, :] = Li
        uinv_ref[:, k, :, :] = Ui
        if kb + BK < N:
            rowp = _bmm(Li, lu_ref[:, kb:kb + BK, kb + BK:])
            lu_ref[:, kb:kb + BK, kb + BK:] = rowp
            colp = _bmm(lu_ref[:, kb + BK:, kb:kb + BK], Ui)
            lu_ref[:, kb + BK:, kb:kb + BK] = colp
            lu_ref[:, kb + BK:, kb + BK:] = \
                lu_ref[:, kb + BK:, kb + BK:] - _bmm(colp, rowp)


def _solve_kernel(lu_ref, linv_ref, uinv_ref, b_ref, x_ref):
    """Solve CB systems given the packed factorization, fully in VMEM.
    b/x: [CB, 1, N] (padded; the singleton axis satisfies the TPU block
    tiling rule for the [B, 1, N] layout).  All slices static; updates
    via concat."""
    N = lu_ref.shape[1]
    K = N // BK
    y = b_ref[...].reshape(CB, N)
    # forward: L y = b
    for k in range(K):
        kb = k * BK
        Lk = linv_ref[:, k:k + 1].reshape(CB, BK, BK)
        # matvecs as VPU sum-contractions ([:, :, 0] squeezes on the
        # lane axis lower to unsupported gathers)
        yk = jnp.sum(Lk * y[:, kb:kb + BK].reshape(CB, 1, BK), axis=2)
        parts = ([y[:, :kb]] if kb > 0 else []) + [yk]
        if kb + BK < N:
            parts.append(y[:, kb + BK:] - jnp.sum(
                lu_ref[:, kb + BK:, kb:kb + BK]
                * yk.reshape(CB, 1, BK), axis=2))
        y = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    # backward: U x = y
    for k in range(K - 1, -1, -1):
        kb = k * BK
        Uk = uinv_ref[:, k:k + 1].reshape(CB, BK, BK)
        xk = jnp.sum(Uk * y[:, kb:kb + BK].reshape(CB, 1, BK), axis=2)
        parts = [xk] + ([y[:, kb + BK:]] if kb + BK < N else [])
        if kb > 0:
            parts.insert(0, y[:, :kb] - jnp.sum(
                lu_ref[:, :kb, kb:kb + BK]
                * xk.reshape(CB, 1, BK), axis=2))
        y = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    x_ref[...] = y.reshape(CB, 1, N)


def _grid(B):
    if B % CB != 0:
        raise ValueError(f"batch {B} must be a multiple of chunk {CB}")
    return B // CB


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_lu_batched_pallas(A, interpret: bool = False):
    """Batched blocked LU via the Pallas kernel.

    A: [B, n, n] float32 (padded to a BK multiple internally).
    Returns a BlockLU-compatible tuple of (lu [B,N,N], linv [B,K,BK,BK],
    uinv [B,K,BK,BK]) arrays.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..blocklu import BlockLU, _pad

    z = np.int32(0)   # index-map literal 0 would trace as i64 under x64
    B, n, _ = A.shape
    N = ((n + BK - 1) // BK) * BK
    K = N // BK
    A = _pad(A.astype(jnp.float32), N)
    G = _grid(B)

    lu, linv, uinv = pl.pallas_call(
        _lu_kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((CB, N, N), lambda b: (b, z, z),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((CB, N, N), lambda b: (b, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, K, BK, BK), lambda b: (b, z, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, K, BK, BK), lambda b: (b, z, z, z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, N), jnp.float32),
            jax.ShapeDtypeStruct((B, K, BK, BK), jnp.float32),
            jax.ShapeDtypeStruct((B, K, BK, BK), jnp.float32),
        ),
        interpret=interpret,
    )(A)
    return BlockLU(lu=lu, linv=linv, uinv=uinv)


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_lu_solve_batched_pallas(fac, b, interpret: bool = False):
    """Batched substitution via the Pallas kernel.

    fac: BlockLU with leading batch dim B; b: [B, n] float32.
    Returns x: [B, n].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    z = np.int32(0)
    B, N, _ = fac.lu.shape
    K = N // BK
    n = b.shape[-1]
    bp = jnp.zeros((B, 1, N), jnp.float32).at[:, 0, :n].set(
        b.astype(jnp.float32))
    G = _grid(B)

    x = pl.pallas_call(
        _solve_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((CB, N, N), lambda g: (g, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, K, BK, BK), lambda g: (g, z, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, K, BK, BK), lambda g: (g, z, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, 1, N), lambda g: (g, z, z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CB, 1, N), lambda g: (g, z, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
        interpret=interpret,
    )(fac.lu, fac.linv, fac.uinv, bp)
    return x[:, 0, :n]
