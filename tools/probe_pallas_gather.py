"""Probe: which indexed-memory primitives does Pallas-TPU (Mosaic) lower,
and what do they cost inside a walk-like loop?

The round-3 roofline (ROOFLINE.md) measured XLA in-loop indexed ops at
~1 ms each / ~7 ns per scattered element — the MC walk's binding
constraint.  This probe measures the Pallas alternatives on the real
chip before committing to a kernel design:

  1. flat gather   out[i] = table[idx[i]]          (VMEM table)
  2. row gather    out[i,:] = mat[idx[i], :]
  3. scatter-add   acc[idx[i]] += w[i]  (one-hot matmul & loop variants)
  4. in-kernel RNG (pltpu.prng_random_bits)
  5. a fused walk-shaped kernel: k gathers + elementwise + scatter

Usage: python tools/probe_pallas_gather.py [case ...]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 131072          # packet lanes
NC = 8192           # cells
NLAM = 538


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:44s} {dt*1e3:9.3f} ms   ({dt/B*1e9:7.2f} ns/lane)")
    return out


# ----------------------------------------------------------------- 1
def case_flat_gather():
    table = jnp.asarray(np.random.rand(NC * NLAM).astype(np.float32))
    idx = jnp.asarray(
        np.random.randint(0, NC * NLAM, size=B).astype(np.int32))

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    out = timeit("flat gather [B] from [NC*NLAM] VMEM", run, table, idx)
    ref = np.asarray(table)[np.asarray(idx)]
    print("   correct:", np.allclose(np.asarray(out), ref))


def case_flat_gather_2d():
    table = jnp.asarray(np.random.rand(NC * NLAM).astype(np.float32))
    idx = jnp.asarray(
        np.random.randint(0, NC * NLAM, size=(B // 128, 128))
        .astype(np.int32))

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B // 128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    out = timeit("flat gather [B/128,128] 2D idx", run, table, idx)
    ref = np.asarray(table)[np.asarray(idx)]
    print("   correct:", np.allclose(np.asarray(out), ref))


# ----------------------------------------------------------------- 2
def case_row_gather():
    C = 32
    mat = jnp.asarray(np.random.rand(NC, C).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, NC, size=B).astype(np.int32))

    def kernel(mat_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(mat_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def run(mat, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(mat, idx)

    out = timeit("row gather [B,32] from [NC,32]", run, mat, idx)
    ref = np.asarray(mat)[np.asarray(idx)]
    print("   correct:", np.allclose(np.asarray(out), ref))


# ----------------------------------------------------------------- 3
def case_scatter_loop():
    """Per-element accumulate via fori_loop with scalar dynamic index."""
    idx = jnp.asarray(np.random.randint(0, NC, size=B).astype(np.int32))
    w = jnp.asarray(np.random.rand(B).astype(np.float32))

    def kernel(idx_ref, w_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            j = idx_ref[i]
            out_ref[j] = out_ref[j] + w_ref[i]
            return 0

        jax.lax.fori_loop(0, B, body, 0)

    @jax.jit
    def run(idx, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NC,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, w)

    out = timeit("scatter-add loop [B]->[NC]", run, idx, w, n=3)
    ref = np.zeros(NC, np.float32)
    np.add.at(ref, np.asarray(idx), np.asarray(w))
    print("   correct:", np.allclose(np.asarray(out), ref, rtol=1e-3))


def case_scatter_xla():
    """Anchor: XLA scatter-add outside any loop."""
    idx = jnp.asarray(np.random.randint(0, NC * NLAM, size=B)
                      .astype(np.int32))
    w = jnp.asarray(np.random.rand(B).astype(np.float32))

    @jax.jit
    def run(idx, w):
        return jnp.zeros(NC * NLAM, jnp.float32).at[idx].add(w)

    timeit("XLA scatter-add [B]->[NC*NLAM] (no loop)", run, idx, w)


# ----------------------------------------------------------------- 4
def case_rng():
    def kernel(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        bits = pltpu.prng_random_bits((8, B))
        out_ref[:] = bits.astype(jnp.float32).sum(axis=0)

    @jax.jit
    def run(seed):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray([123], jnp.int32))

    timeit("prng_random_bits (8,B) + reduce", run, 0)


# ----------------------------------------------------------------- 5
def case_walk_shaped():
    """5 gathers + ~40 elementwise ops + 1 one-hot-style scatter skip:
    representative of one walk step body (without the scatter)."""
    C = 24
    K = 8
    cellmat = jnp.asarray(np.random.rand(NC, C).astype(np.float32))
    tabmat = jnp.asarray(np.random.rand(NLAM, K).astype(np.float32))
    lut1 = jnp.asarray(np.random.rand(NLAM * 512).astype(np.float32))
    lut2 = jnp.asarray(np.random.rand(65536).astype(np.float32))
    x = jnp.asarray(np.random.rand(B).astype(np.float32))
    ic = jnp.asarray(np.random.randint(0, NC, size=B).astype(np.int32))
    il = jnp.asarray(np.random.randint(0, NLAM, size=B).astype(np.int32))

    def kernel(cm, tm, l1, l2, x_ref, ic_ref, il_ref, out_ref):
        ic_ = ic_ref[:]
        il_ = il_ref[:]
        crow = jnp.take(cm[:], ic_, axis=0)          # [B, C]
        trow = jnp.take(tm[:], il_, axis=0)          # [B, K]
        s1 = jnp.take(l1[:], il_ * 512 + (ic_ & 511), axis=0)
        s2 = jnp.take(l2[:], (ic_ * 7 + il_) & 65535, axis=0)
        v = x_ref[:]
        acc = crow[:, 0] * trow[:, 0] + s1 * s2
        for i in range(1, 8):
            acc = acc + crow[:, i] * trow[:, i % K] * jnp.exp(-v * i)
        out_ref[:] = acc

    @jax.jit
    def run(*a):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a)

    timeit("walk-shaped: 4 gathers + elementwise", run,
           cellmat, tabmat, lut1, lut2, x, ic, il)


# ----------------------------------------------------------------- 6
def case_xla_gather_anchor():
    """Anchor: the same flat gather as an XLA op inside a while_loop."""
    table = jnp.asarray(np.random.rand(NC * NLAM).astype(np.float32))
    idx = jnp.asarray(
        np.random.randint(0, NC * NLAM, size=B).astype(np.int32))

    @jax.jit
    def run(table, idx):
        def body(c):
            i, acc = c
            acc = acc + table[(idx + i) % (NC * NLAM)]
            return (i + 1, acc)

        _, acc = jax.lax.while_loop(lambda c: c[0] < 20, body,
                                    (0, jnp.zeros(B, jnp.float32)))
        return acc

    out = run(table, idx)
    jax.block_until_ready(out)
    t0 = time.time()
    out = run(table, idx)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 20
    print(f"{'XLA in-loop flat gather (anchor)':44s} {dt*1e3:9.3f} ms   "
          f"({dt/B*1e9:7.2f} ns/lane)")


CASES = {k[5:]: v for k, v in list(globals().items())
         if k.startswith("case_")}

if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    print(f"devices: {jax.devices()}  B={B}")
    for nm in names:
        try:
            CASES[nm]()
        except Exception as e:
            print(f"{nm:44s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
