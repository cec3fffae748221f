"""Decisive probe for the round-4 MC walk rework: a synthetic loop body
with the REAL dependency structure of the proposed design, measured on
the actual chip.

Proposed v4 structure per step (see ROOFLINE.md round 4):
  - dependent chain: cellmat row gather (by cell) -> elementwise
    physics -> reemit flat gather (by event idx) -> next cell
  - independent gathers alongside: tabmat row (by lam bin), lya pair
  - NO in-loop scatters: (idx, w) logged by dynamic_update_slice into
    [K, B] buffers; ONE scatter-add after the while_loop
  - RNG: per-lane xorshift128 carried as 4x u32 (elementwise)

Cases:
  base      current-style: 3 dependent gathers + 2 indep + 2 scatters + RNG op
  v4        log-tallies + xorshift + carried-neighbor (2 dep gathers)
  v4gN      v4 with N interleaved independent groups per body
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NC = 8192
NLAM = 538
NCL = NC * NLAM


def timeloop(mkrun, n=32, reps=3):
    f, carry = mkrun(n)
    out = f(carry)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = f(carry)
        jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.time() - t0) / reps / n * 1e3


def xs128(s0, s1, s2, s3):
    """xorshift128 per lane (Marsaglia); returns (u32, new state)."""
    t = s3
    s = s0
    t = t ^ (t << 11)
    t = t ^ (t >> 8)
    t = t ^ s ^ (s >> 19)
    return t, (t, s0, s1, s2)


def u01(bits):
    return (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))


def make_tables(key):
    cellmat = jax.random.uniform(key, (NC, 24), jnp.float32, 1.0, 2.0)
    tabmat = jax.random.uniform(key, (NLAM, 12), jnp.float32)
    reemit = jax.random.uniform(key, (256 * 128,), jnp.float32)
    lya = jax.random.uniform(key, (NLAM * 512, 2), jnp.float32)
    return cellmat, tabmat, reemit, lya


def case_base(B):
    key = jax.random.PRNGKey(0)
    cellmat, tabmat, reemit, lya = make_tables(key)

    def mkrun(n):
        def body(state):
            i, key, cell, lam_i, x, flux, eng = state
            key, k2 = jax.random.split(key)
            u = jax.random.uniform(k2, (10, B), jnp.float32)
            crow = cellmat[cell]                        # dep gather 1
            trow = tabmat[lam_i]                        # indep gather
            sl = lya[lam_i * 512 + (cell & 511)]        # indep gather
            sig = crow[:, 0] * trow[:, 0] + sl[:, 0]
            ev = (u[1] * 256).astype(jnp.int32) * 128 \
                + (u[2] * 128).astype(jnp.int32)
            lam_new = reemit[ev]                        # dep gather 2
            x2 = x + sig * 0.001 + lam_new * 1e-6
            flat = cell * NLAM + lam_i
            flux = flux.at[flat].add(x2)                # scatter 1
            eng = eng.at[cell].add(u[3])                # scatter 2
            cell2 = (cell + (x2 * 7).astype(jnp.int32)) % NC  # dep chain
            lam2 = (lam_i + (lam_new * 100).astype(jnp.int32)) % NLAM
            return (i + 1, key, cell2, lam2, x2, flux, eng)

        def run(c):
            return jax.lax.while_loop(lambda s: s[0] < n, body, c)

        cell = jax.random.randint(key, (B,), 0, NC)
        lam_i = jax.random.randint(key, (B,), 0, NLAM)
        x = jax.random.uniform(key, (B,), jnp.float32)
        carry = (0, key, cell, lam_i, x,
                 jnp.zeros(NCL, jnp.float32), jnp.zeros(NC, jnp.float32))
        return jax.jit(run), carry

    return timeloop(mkrun)


def case_v4(B, G=1, K=32):
    key = jax.random.PRNGKey(0)
    cellmat, tabmat, reemit, lya = make_tables(key)
    Bg = B // G

    def mkrun(n):
        def one_group(g, st, log_i, log_w, k):
            cell, lam_i, x, s0, s1, s2, s3 = st
            b0, (s0, s1, s2, s3) = xs128(s0, s1, s2, s3)
            b1, (s0, s1, s2, s3) = xs128(s0, s1, s2, s3)
            b2, (s0, s1, s2, s3) = xs128(s0, s1, s2, s3)
            crow = cellmat[cell]                        # dep gather 1
            trow = tabmat[lam_i]                        # indep gather
            sl = lya[lam_i * 512 + (cell & 511)]        # indep gather
            sig = crow[:, 0] * trow[:, 0] + sl[:, 0]
            ev = (b0 % 256).astype(jnp.int32) * 128 \
                + (b1 % 128).astype(jnp.int32)
            lam_new = reemit[ev]                        # dep gather 2
            x2 = x + sig * 0.001 + lam_new * 1e-6
            flat = cell * NLAM + lam_i
            log_i = jax.lax.dynamic_update_slice(
                log_i, flat[None], (k, g * Bg))
            log_w = jax.lax.dynamic_update_slice(
                log_w, x2[None], (k, g * Bg))
            cell2 = (cell + (x2 * 7).astype(jnp.int32)) % NC
            lam2 = (lam_i + (lam_new * 100).astype(jnp.int32)) % NLAM
            return (cell2, lam2, x2, s0, s1, s2, s3), log_i, log_w

        def body(state):
            i, groups, log_i, log_w = state
            new_groups = []
            for g, st in enumerate(groups):
                st, log_i, log_w = one_group(g, st, log_i, log_w,
                                             i % K)
                new_groups.append(st)
            return (i + 1, tuple(new_groups), log_i, log_w)

        def run(c):
            i, groups, log_i, log_w = jax.lax.while_loop(
                lambda s: s[0] < n, body, c)
            flux = jnp.zeros(NCL + NC, jnp.float32).at[
                log_i.reshape(-1)].add(log_w.reshape(-1))
            return (i, groups, flux)

        groups = []
        for g in range(G):
            kg = jax.random.fold_in(key, g)
            cell = jax.random.randint(kg, (Bg,), 0, NC)
            lam_i = jax.random.randint(kg, (Bg,), 0, NLAM)
            x = jax.random.uniform(kg, (Bg,), jnp.float32)
            sts = jax.random.randint(kg, (4, Bg), 1, 1 << 30
                                     ).astype(jnp.uint32)
            groups.append((cell, lam_i, x, sts[0], sts[1], sts[2],
                           sts[3]))
        carry = (0, tuple(groups),
                 jnp.zeros((K, B), jnp.int32),
                 jnp.zeros((K, B), jnp.float32))
        return jax.jit(run), carry

    return timeloop(mkrun, n=K)


if __name__ == "__main__":
    Bs = [int(a) for a in sys.argv[1:]] or [131072, 524288]
    for B in Bs:
        t = case_base(B)
        print(f"B={B:8d} base (scatters+RNG op)   : {t:8.3f} ms/step "
              f"({t/B*1e6:6.1f} ns/pkt-step)")
        for G in (1, 2, 4, 8):
            t = case_v4(B, G)
            print(f"B={B:8d} v4 G={G}                  : {t:8.3f} ms/step "
                  f"({t/B*1e6:6.1f} ns/pkt-step)")
