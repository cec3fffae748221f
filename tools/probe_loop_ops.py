"""Synthetic while_loop probe: per-op marginal cost INSIDE a TPU loop
body at MC shapes.  Decomposes the walk's 17.7 ms/step into elementwise
/ gather / scatter / searchsorted contributions."""
import sys
import time

import jax
import jax.numpy as jnp


def timeloop(body, carry, n=64, reps=3):
    def run(c):
        def b(state):
            i, cc = state
            return (i + 1, body(cc))
        return jax.lax.while_loop(lambda s: s[0] < n, b, (0, c))
    f = jax.jit(run)
    out = f(carry)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = f(carry)
        jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.time() - t0) / reps / n * 1e3  # ms per iteration


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 42_000
    M = 2377 * 538
    Mc = 2377
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (B,), jnp.float32, 1.0, 2.0)
    idx_f = jax.random.randint(key, (B,), 0, M)
    idx_c = jax.random.randint(key, (B,), 0, Mc)
    tab = jax.random.uniform(key, (538,), jnp.float32)
    cells16 = jax.random.uniform(key, (Mc, 16), jnp.float32)
    grid = jnp.sort(jax.random.uniform(key, (538,), jnp.float32))

    base = lambda c: (c[0] * 1.000001, c[1], c[2])
    print(f"B={B}")
    t_base = timeloop(base, (x, jnp.zeros(M, jnp.float32),
                             jnp.zeros((Mc, 16), jnp.float32)))
    print(f"baseline (1 mul)              : {t_base:8.3f} ms/iter")

    def mk(fn):
        return timeloop(fn, (x, jnp.zeros(M, jnp.float32),
                             jnp.zeros((Mc, 16), jnp.float32))) - t_base

    for k in (8, 32):
        def ew(c, k=k):
            v = c[0]
            for _ in range(k):
                v = v * 1.000001 + 0.0000001
            return (v, c[1], c[2])
        print(f"elementwise x{k:3d}             : {mk(ew):8.3f} ms/iter")

    def g_small(c):
        i = jnp.clip((c[0] * 200).astype(jnp.int32), 0, 537)
        return (c[0] + tab[i] * 1e-9, c[1], c[2])
    print(f"gather [B] from [538] table   : {mk(g_small):8.3f} ms/iter")

    def g_rows(c):
        rows = cells16[idx_c]          # [B, 16]
        return (c[0] + rows.sum(1) * 1e-12, c[1], c[2])
    print(f"row gather [B,16] from cells  : {mk(g_rows):8.3f} ms/iter")

    def g_cols(c):
        v = c[0]
        for j in range(16):
            v = v + cells16[idx_c, j] * 1e-12
        return (v, c[1], c[2])
    print(f"16 separate [B] cell gathers  : {mk(g_cols):8.3f} ms/iter")

    def ss(c):
        i = jnp.searchsorted(grid, c[0] * 0.4)
        return (c[0] + i.astype(jnp.float32) * 1e-9, c[1], c[2])
    print(f"searchsorted [B] in [538]     : {mk(ss):8.3f} ms/iter")

    def sc_f(c):
        return (c[0], c[1].at[idx_f].add(c[0]), c[2])
    print(f"scatter-add [B] -> [1.28M]    : {mk(sc_f):8.3f} ms/iter")

    def sc_c(c):
        t = c[2].at[idx_c, 0].add(c[0])
        return (c[0], c[1], t)
    print(f"scatter-add [B] -> cells col  : {mk(sc_c):8.3f} ms/iter")

    def sc_c8(c):
        vals = jnp.stack([c[0]] * 8, axis=1)
        t = c[2].at[idx_c, :8].add(vals)
        return (c[0], c[1], t)
    print(f"scatter-add [B,8] -> cells    : {mk(sc_c8):8.3f} ms/iter")

    def rngp(c):
        k = jax.random.fold_in(jax.random.PRNGKey(1), (c[0][0] * 10)
                               .astype(jnp.int32))
        ks = jax.random.split(k, 10)
        u = jax.random.uniform(ks[0], (B,), jnp.float32)
        return (c[0] + u * 1e-9, c[1], c[2])
    print(f"split x10 + uniform [B]       : {mk(rngp):8.3f} ms/iter")

    def trans(c):
        v = jnp.exp(-c[0]) + jnp.log(c[0] + 1.5) + jnp.sqrt(c[0])
        return (c[0] + v * 1e-9, c[1], c[2])
    print(f"exp+log+sqrt [B]              : {mk(trans):8.3f} ms/iter")


if __name__ == "__main__":
    main()
