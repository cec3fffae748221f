"""Follow-up loop probe: the EXACT gather/scatter patterns the MC walk
uses today vs proposed replacements, at two batch sizes."""
import sys
import time

import jax
import jax.numpy as jnp


def timeloop(body, carry, n=32, reps=3):
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
    for B in (42_000, 210_000):
        M = 2377 * 538
        Mc = 2377
        nd = 1
        key = jax.random.PRNGKey(0)
        x = jax.random.uniform(key, (B,), jnp.float32, 1.0, 2.0)
        idx_c = jax.random.randint(key, (B,), 0, Mc)
        idx_f = jax.random.randint(key, (B,), 0, M)
        tgt_dir = jnp.zeros((Mc, 3), jnp.float32)
        tgt_eng = jnp.zeros((nd, Mc), jnp.float32)
        tgt_f = jnp.zeros(M, jnp.float32)
        reemit3 = jax.random.uniform(key, (4, 256, 128), jnp.float32)
        reemit_flat = reemit3.reshape(-1)
        i1 = jax.random.randint(key, (B,), 0, 4)
        i2 = jax.random.randint(key, (B,), 0, 256)
        i3 = jax.random.randint(key, (B,), 0, 128)
        grid = jnp.sort(jax.random.uniform(key, (538,), jnp.float32))
        lut = jax.random.randint(key, (4096,), 0, 538)

        carry = (x, tgt_dir, tgt_eng, tgt_f)
        base = lambda c: (c[0] * 1.000001, c[1], c[2], c[3])
        t_base = timeloop(base, carry)

        def mk(fn):
            return timeloop(fn, carry) - t_base

        print(f"==== B={B} (baseline {t_base:.3f})")

        def dirflux(c):
            vals = c[0][:, None] * jnp.ones((1, 3), jnp.float32)
            return (c[0], c[1].at[idx_c].add(vals), c[2], c[3])
        print(f"  dir_flux [B,3].at[idx].add      : {mk(dirflux):8.3f} ms")

        def dirflux3(c):
            t = c[1]
            for j in range(3):
                t = t.at[idx_c, j].add(c[0])
            return (c[0], t, c[2], c[3])
        print(f"  dir_flux 3 sep col scatters     : {mk(dirflux3):8.3f} ms")

        def dirflux3f(c):
            t = c[1].reshape(-1)
            for j in range(3):
                t = t.at[idx_c * 3 + j].add(c[0])
            return (c[0], t.reshape(Mc, 3), c[2], c[3])
        print(f"  dir_flux 3 flat scatters        : {mk(dirflux3f):8.3f} ms")

        def engain(c):
            vals = jnp.ones((nd, 1), jnp.float32) * c[0][None, :]
            return (c[0], c[1], c[2].at[:, idx_c].add(vals), c[3])
        print(f"  en_gain [:, idx].add (nd={nd})    : {mk(engain):8.3f} ms")

        def engain_sep(c):
            t = c[2]
            for j in range(nd):
                t = t.at[j, idx_c].add(c[0])
            return (c[0], c[1], t, c[3])
        print(f"  en_gain nd sep row scatters     : {mk(engain_sep):8.3f} ms")

        def re3(c):
            v = reemit3[i1, i2, i3]
            return (c[0] + v * 1e-9, c[1], c[2], c[3])
        print(f"  reemit 3D gather                : {mk(re3):8.3f} ms")

        def reflat(c):
            v = reemit_flat[(i1 * 256 + i2) * 128 + i3]
            return (c[0] + v * 1e-9, c[1], c[2], c[3])
        print(f"  reemit flat gather              : {mk(reflat):8.3f} ms")

        def ssorted(c):
            i = jnp.searchsorted(grid, c[0] * 0.4)
            return (c[0] + i.astype(jnp.float32) * 1e-9, c[1], c[2], c[3])
        print(f"  searchsorted [538]              : {mk(ssorted):8.3f} ms")

        def lutidx(c):
            fi = jnp.clip((c[0] * 2000).astype(jnp.int32), 0, 4095)
            i = lut[fi]
            return (c[0] + i.astype(jnp.float32) * 1e-9, c[1], c[2], c[3])
        print(f"  uniform-lut index               : {mk(lutidx):8.3f} ms")

        def fluxsc(c):
            return (c[0], c[1], c[2], c[3].at[idx_f].add(c[0]))
        print(f"  flux scatter [B]->[1.28M]       : {mk(fluxsc):8.3f} ms")

        def fluxsc2(c):
            t = c[3].at[idx_f].add(c[0])
            t = t.at[idx_f].add(jnp.ones_like(c[0]))
            return (c[0], c[1], c[2], t)
        print(f"  flux+phc two scatters           : {mk(fluxsc2):8.3f} ms")


if __name__ == "__main__":
    main()
