"""Blocked no-pivot LU (ops/blocklu.py) unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rac2d_tpu.ops.blocklu import BK, block_lu, block_lu_solve


def _well_conditioned(n, rng, dtype=np.float64):
    A = rng.standard_normal((n, n)).astype(dtype)
    A += n * np.eye(n, dtype=dtype)          # diagonally dominant
    return A


def test_single_solve_f64():
    rng = np.random.default_rng(0)
    n = 150                                   # exercises padding (not %64)
    A = _well_conditioned(n, rng)
    b = rng.standard_normal(n)
    fac = block_lu(jnp.asarray(A))
    x = np.asarray(block_lu_solve(fac, jnp.asarray(b)))
    assert np.abs(A @ x - b).max() / np.abs(b).max() < 1e-10


def test_single_solve_f32():
    rng = np.random.default_rng(1)
    n = BK * 2
    A = _well_conditioned(n, rng, np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    fac = block_lu(jnp.asarray(A))
    x = np.asarray(block_lu_solve(fac, jnp.asarray(b)))
    assert np.abs(A @ x - b).max() / np.abs(b).max() < 1e-4


def test_batch_vmap_matches_loop():
    rng = np.random.default_rng(2)
    B, n = 5, 70
    A = np.stack([_well_conditioned(n, rng) for _ in range(B)])
    b = rng.standard_normal((B, n))
    facs = jax.vmap(block_lu)(jnp.asarray(A))
    xs = np.asarray(jax.vmap(block_lu_solve)(facs, jnp.asarray(b)))
    for i in range(B):
        xi = np.asarray(block_lu_solve(block_lu(jnp.asarray(A[i])),
                                       jnp.asarray(b[i])))
        assert np.allclose(xs[i], xi, rtol=1e-12, atol=1e-12)
        assert np.abs(A[i] @ xs[i] - b[i]).max() < 1e-8


def test_pallas_kernel_matches_jnp():
    """The VMEM-resident Pallas factorization (interpret mode on CPU)
    reproduces the jnp blocked LU bit-for-bit."""
    from rac2d_tpu.ops.pallas.blocklu_pallas import block_lu_batched_pallas
    rng = np.random.default_rng(7)
    B, n = 2, 100
    A = np.stack([_well_conditioned(n, rng, np.float32) for _ in range(B)])
    ref = jax.vmap(block_lu)(jnp.asarray(A))
    out = block_lu_batched_pallas(jnp.asarray(A), interpret=True)
    assert float(jnp.abs(ref.lu - out.lu).max()) == 0.0
    assert float(jnp.abs(ref.linv - out.linv).max()) == 0.0
    assert float(jnp.abs(ref.uinv - out.uinv).max()) == 0.0


def test_pivot_floor_handles_zero_diagonal_start():
    # leading zero diagonal entry: no-pivot LU survives via the floor +
    # the caller's iterative refinement contract (here: just finiteness)
    A = jnp.asarray(np.array([[0.0, 1.0], [1.0, 0.0]]))
    fac = block_lu(A)
    x = block_lu_solve(fac, jnp.asarray(np.array([1.0, 2.0])))
    assert np.isfinite(np.asarray(x)).all()


def test_pallas_solve_matches_jnp():
    """The VMEM-resident Pallas substitution kernel (interpret mode on
    CPU) reproduces the jnp block_lu_solve to f32 accuracy."""
    from rac2d_tpu.ops.pallas.blocklu_pallas import (
        block_lu_batched_pallas, block_lu_solve_batched_pallas)
    rng = np.random.default_rng(8)
    B, n = 2, 100
    A = np.stack([_well_conditioned(n, rng, np.float32) for _ in range(B)])
    b = rng.standard_normal((B, n)).astype(np.float32)
    fac = block_lu_batched_pallas(jnp.asarray(A), interpret=True)
    x = np.asarray(block_lu_solve_batched_pallas(fac, jnp.asarray(b),
                                                 interpret=True))
    ref = np.asarray(jax.vmap(block_lu_solve)(
        jax.vmap(block_lu)(jnp.asarray(A)), jnp.asarray(b)))
    assert np.abs(x - ref).max() <= 1e-4 * max(np.abs(ref).max(), 1.0)
    for i in range(B):
        assert np.abs(A[i] @ x[i] - b[i]).max() < 1e-2


def test_block_invert():
    """Explicit inverse from the blocked factorization: A @ inv(A) = I
    (padded region must act as identity too)."""
    from rac2d_tpu.ops.blocklu import block_invert
    rng = np.random.default_rng(9)
    n = 150                                   # not a BK multiple
    A = _well_conditioned(n, rng)
    fac = block_lu(jnp.asarray(A))
    Ainv = np.asarray(block_invert(fac))
    # the inverse lives in the padded size; top-left block inverts A
    assert Ainv.shape[0] == 192
    err = np.abs(A @ Ainv[:n, :n] - np.eye(n)).max()
    assert err < 1e-9


def test_bdf_inv_backend_matches_block():
    """The 'inv' factorization backend gives the same Newton solutions
    as the substitution backend (both under f64 refinement)."""
    from rac2d_tpu.ops import bdf as bdfmod
    rng = np.random.default_rng(10)
    B, n = 4, 70
    J = jnp.asarray(rng.standard_normal((B, n, n)))
    # keep I - c J comfortably within the no-pivot contract
    c = jnp.full(B, 0.02)
    scale = jnp.asarray(1.0 + rng.uniform(0, 1, (B, n)))
    b = jnp.asarray(rng.standard_normal((B, n)))
    old = bdfmod.BATCH_LU_BACKEND
    try:
        xs = {}
        for backend in ("block", "inv"):
            bdfmod.BATCH_LU_BACKEND = backend
            fac = bdfmod._bfac(J, c, scale)
            xs[backend] = np.asarray(bdfmod._bsolve(J, c, fac, b, 2))
    finally:
        bdfmod.BATCH_LU_BACKEND = old
    ref = np.asarray(
        jax.vmap(lambda Ji, ci, bi: jnp.linalg.solve(
            jnp.eye(n) - ci * Ji, bi))(J, c, b))
    for backend, x in xs.items():
        assert np.abs(x - ref).max() < 1e-8 * np.abs(ref).max() + 1e-10, \
            backend
