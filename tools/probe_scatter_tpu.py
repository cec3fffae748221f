"""Micro-benchmark: scatter-add / gather / RNG / transcendental costs on
the TPU, at MC-walk-like shapes.  Identifies what dominates the
13.7 ms/step measured for the 42k-lane walk body."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3  # ms


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 42_000
    M_flux = 2377 * 538
    M_cell = 2377
    key = jax.random.PRNGKey(0)
    idx_f = jax.random.randint(key, (B,), 0, M_flux)
    idx_c = jax.random.randint(key, (B,), 0, M_cell)
    val = jnp.ones(B, jnp.float32)
    val8 = jnp.ones((B, 8), jnp.float32)
    tgt_f = jnp.zeros(M_flux, jnp.float32)
    tgt_f2 = jnp.zeros((M_flux, 2), jnp.float32)
    tgt_c = jnp.zeros(M_cell, jnp.float32)
    tgt_c8 = jnp.zeros((M_cell, 8), jnp.float32)
    big = jnp.zeros((M_flux,), jnp.float32)

    sc1 = jax.jit(lambda t, i, v: t.at[i].add(v))
    sc2 = jax.jit(lambda t, i, v: t.at[i].add(jnp.stack([v, v], 1)))
    sc8 = jax.jit(lambda t, i, v: t.at[i].add(v))
    ga = jax.jit(lambda t, i: t[i])
    ga8 = jax.jit(lambda t, i: t[i])
    rng = jax.jit(lambda k: jax.random.split(k, 10))
    uni = jax.jit(lambda k: jax.random.uniform(k, (B,), jnp.float32))
    exps = jax.jit(lambda v: jnp.exp(v) + jnp.log(v + 2.0))
    srt = jax.jit(lambda i: jnp.sort(i))
    srtv = jax.jit(lambda i, v: jax.lax.sort_key_val(i, v))
    seg = jax.jit(lambda i, v: jax.ops.segment_sum(
        v, i, num_segments=M_cell, indices_are_sorted=True))

    print(f"B={B}  targets: flux[{M_flux}] cell[{M_cell}]")
    print(f"scatter-add 1col -> flux grid : {timeit(sc1, tgt_f, idx_f, val):8.3f} ms")
    print(f"scatter-add 2col -> flux grid : {timeit(sc2, tgt_f2, idx_f, val):8.3f} ms")
    print(f"scatter-add 1col -> cell vec  : {timeit(sc1, tgt_c, idx_c, val):8.3f} ms")
    print(f"scatter-add 8col -> cell vec  : {timeit(sc8, tgt_c8, idx_c, val8):8.3f} ms")
    print(f"gather 1col from flux grid    : {timeit(ga, big, idx_f):8.3f} ms")
    print(f"gather 8col from cell grid    : {timeit(ga8, tgt_c8, idx_c):8.3f} ms")
    print(f"split key x10                 : {timeit(rng, key):8.3f} ms")
    print(f"uniform [B]                   : {timeit(uni, key):8.3f} ms")
    print(f"exp+log [B]                   : {timeit(exps, val):8.3f} ms")
    print(f"sort idx [B]                  : {timeit(srt, idx_f):8.3f} ms")
    print(f"sort_key_val [B]              : {timeit(srtv, idx_f, val):8.3f} ms")
    print(f"segment_sum sorted -> cell    : {timeit(seg, idx_c, val):8.3f} ms")


if __name__ == "__main__":
    main()
