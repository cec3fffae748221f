"""Probe round 2: the 2D-gather forms Mosaic actually supports.

take_along_axis semantics on TPU: out[i, j] = tab[idx[i, j], j] —
gather along SUBLANES with per-lane indices.  Recipes probed here:

  A. row gather from [NC, 128]:   idx broadcast to [B, 128]
  B. flat gather from [N] via [N/128, 128] + one-hot column select
  C. scatter-add via one-hot MXU matmul per 128/256-block
  D. walk-shaped fused body (gathers + elementwise) at B
  E. in-kernel while_loop: k fused steps inside ONE pallas_call
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 131072
NC = 8192
NLAM = 538


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:46s} {dt*1e3:9.3f} ms   ({dt/B*1e9:7.2f} ns/lane)")
    return out


def case_row_gather_ta():
    mat = jnp.asarray(np.random.rand(NC, 128).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, NC, size=B).astype(np.int32))

    def kernel(mat_ref, idx_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None], (B, 128))
        out_ref[:] = jnp.take_along_axis(mat_ref[:], idx2, axis=0)

    @jax.jit
    def run(mat, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(mat, idx)

    out = timeit("A row gather [B,128] take_along_axis", run, mat, idx)
    ref = np.asarray(mat)[np.asarray(idx)]
    print("   correct:", np.allclose(np.asarray(out), ref))


def case_flat_gather_oh():
    N = NLAM * 512  # sigma_Lya-sized
    Nr = (N + 127) // 128
    tab2 = jnp.asarray(np.random.rand(Nr, 128).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, N, size=B).astype(np.int32))

    def kernel(tab_ref, idx_ref, out_ref):
        iv = idx_ref[:]
        q = iv // 128
        r = iv - q * 128
        rows = jnp.take_along_axis(
            tab_ref[:], jnp.broadcast_to(q[:, None], (B, 128)), axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
        out_ref[:] = jnp.sum(
            jnp.where(lane == r[:, None], rows, 0.0), axis=1,
            keepdims=True)

    @jax.jit
    def run(tab2, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab2, idx)

    out = timeit("B flat gather [B] via rowgather+onehot", run, tab2, idx)
    ref = np.asarray(tab2).reshape(-1)[np.asarray(idx)]
    print("   correct:", np.allclose(np.asarray(out)[:, 0], ref))


def case_scatter_onehot_mxu():
    """acc[NC] += w at idx, via blocks of 256 lanes: one-hot [256, NC]
    matmul  w[1,256] @ onehot -> [1, NC] accumulated.  FLOPs =
    B * NC * 2 -- only viable for SMALL target tables."""
    NCs = 1024
    idx = jnp.asarray(np.random.randint(0, NCs, size=B).astype(np.int32))
    w = jnp.asarray(np.random.rand(B).astype(np.float32))
    BLK = 1024

    def kernel(idx_ref, w_ref, out_ref):
        def body(k, acc):
            iv = idx_ref[pl.ds(k * BLK, BLK)]
            wv = w_ref[pl.ds(k * BLK, BLK)]
            cols = jax.lax.broadcasted_iota(jnp.int32, (BLK, NCs), 1)
            oh = jnp.where(cols == iv[:, None], wv[:, None], 0.0)
            return acc + jnp.sum(oh, axis=0)

        out_ref[:] = jax.lax.fori_loop(
            0, B // BLK, body, jnp.zeros((NCs,), jnp.float32))

    @jax.jit
    def run(idx, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NCs,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, w)

    out = timeit("C scatter one-hot reduce [B]->[1024]", run, idx, w, n=5)
    ref = np.zeros(NCs, np.float32)
    np.add.at(ref, np.asarray(idx), np.asarray(w))
    print("   correct:", np.allclose(np.asarray(out), ref, rtol=1e-3,
                                     atol=1e-3))


def case_walk_fused():
    """2 row gathers + 2 flat gathers + elementwise, one kernel call."""
    cm = jnp.asarray(np.random.rand(NC, 128).astype(np.float32))
    tm = jnp.asarray(np.random.rand(NLAM, 128).astype(np.float32))
    N = NLAM * 512
    l1 = jnp.asarray(
        np.random.rand((N + 127) // 128, 128).astype(np.float32))
    x = jnp.asarray(np.random.rand(B).astype(np.float32))
    ic = jnp.asarray(np.random.randint(0, NC, size=B).astype(np.int32))
    il = jnp.asarray(np.random.randint(0, NLAM, size=B).astype(np.int32))

    def kernel(cm_ref, tm_ref, l1_ref, x_ref, ic_ref, il_ref, out_ref):
        ic_ = ic_ref[:]
        il_ = il_ref[:]
        crow = jnp.take_along_axis(
            cm_ref[:], jnp.broadcast_to(ic_[:, None], (B, 128)), axis=0)
        trow = jnp.take_along_axis(
            tm_ref[:], jnp.broadcast_to(il_[:, None], (B, 128)), axis=0)
        fi = il_ * 512 + (ic_ & 511)
        q = fi // 128
        r = fi - q * 128
        rows = jnp.take_along_axis(
            l1_ref[:], jnp.broadcast_to(q[:, None], (B, 128)), axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
        s1 = jnp.sum(jnp.where(lane == r[:, None], rows, 0.0), axis=1)
        v = x_ref[:]
        acc = crow[:, 0] * trow[:, 0] + s1
        for i in range(1, 8):
            acc = acc + crow[:, i] * trow[:, i] * jnp.exp(-v * i)
        out_ref[:] = acc

    @jax.jit
    def run(*a):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a)

    timeit("D walk-shaped 3 gathers + elementwise", run,
           cm, tm, l1, x, ic, il)


def case_inkernel_loop():
    """16 dependent gather steps inside ONE kernel (chained indices):
    measures the per-STEP cost when the loop lives inside Pallas."""
    cm = jnp.asarray(np.random.rand(NC, 128).astype(np.float32))
    ic = jnp.asarray(np.random.randint(0, NC, size=B).astype(np.int32))
    K = 16

    def kernel(cm_ref, ic_ref, out_ref):
        def body(k, carry):
            idx, acc = carry
            crow = jnp.take_along_axis(
                cm_ref[:], jnp.broadcast_to(idx[:, None], (B, 128)),
                axis=0)
            acc = acc + crow[:, 0]
            nidx = (idx + crow[:, 1].astype(jnp.int32) + k) % NC
            return (nidx, acc)

        _, acc = jax.lax.fori_loop(
            0, K, body, (ic_ref[:], jnp.zeros((B,), jnp.float32)))
        out_ref[:] = acc

    @jax.jit
    def run(cm, ic):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(cm, ic)

    out = run(cm, ic)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(10):
        out = run(cm, ic)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 10 / K
    print(f"{'E in-kernel chained row gather, per step':46s} "
          f"{dt*1e3:9.3f} ms   ({dt/B*1e9:7.2f} ns/lane)")


CASES = {k[5:]: v for k, v in list(globals().items())
         if k.startswith("case_")}

if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    print(f"devices: {jax.devices()}  B={B}")
    for nm in names:
        try:
            CASES[nm]()
        except Exception as e:
            print(f"{nm:46s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
