"""In-loop probe for the round-3 MC walk rework candidates:

  a) one concatenated flat scatter-add [kB] -> [M] vs k separate [B] ones
  b) 1-D table gather vs the same table reshaped [N,1] (row gather)
  c) cost of the in-loop concatenate itself
"""
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
    return (time.time() - t0) / reps / n * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 210_000
    M = 2377 * 538 * 2 + 2377 * 4
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (B,), jnp.float32, 1.0, 2.0)
    idxs = [jax.random.randint(jax.random.PRNGKey(i), (B,), 0, M)
            for i in range(6)]
    tab1 = jax.random.uniform(key, (538,), jnp.float32)
    tab2 = tab1[:, None]
    tabp = jnp.tile(tab1[:, None], (1, 8))
    it = jax.random.randint(key, (B,), 0, 538)
    tgt = jnp.zeros(M, jnp.float32)

    base = lambda c: (c[0] * 1.000001, c[1])
    t_base = timeloop(base, (x, tgt))
    print(f"B={B}  baseline {t_base:.3f} ms/iter")

    def mk(fn):
        return timeloop(fn, (x, tgt)) - t_base

    for k in (1, 2, 6):
        def sep(c, k=k):
            x, t = c
            for i in range(k):
                t = t.at[idxs[i]].add(x)
            return (x, t)
        print(f"{k} separate [B] scatters      : {mk(sep):8.3f} ms/iter")

        def fused(c, k=k):
            x, t = c
            vi = jnp.concatenate([idxs[i] for i in range(k)])
            vv = jnp.concatenate([x + i for i in range(k)])
            return (x, t.at[vi].add(vv))
        print(f"1 fused [{k}B] scatter         : {mk(fused):8.3f} ms/iter")

    def g1(c):
        x, t = c
        return (x + tab1[it], t)
    print(f"1-D table gather [B]<-[538]   : {mk(g1):8.3f} ms/iter")

    def g2(c):
        x, t = c
        return (x + tab2[it][:, 0], t)
    print(f"row gather [B,1]<-[538,1]     : {mk(g2):8.3f} ms/iter")

    def g8(c):
        x, t = c
        return (x + tabp[it].sum(1), t)
    print(f"row gather [B,8]<-[538,8]     : {mk(g8):8.3f} ms/iter")

    def cc(c):
        x, t = c
        v = jnp.concatenate([x, x * 2, x * 3, x * 4, x * 5, x * 6])
        return (x + v[:B] + v[B:2 * B], t)
    print(f"concat 6x[B] only             : {mk(cc):8.3f} ms/iter")


if __name__ == "__main__":
    main()
