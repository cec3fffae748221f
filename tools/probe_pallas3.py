"""Probe 3: tpu.dynamic_gather cost vs operand rows S, dependent chains,
lane-gather, and the hybrid (kernel + XLA scatter) step shape.

dynamic_gather contract (jax 0.9.0 mosaic lowering):
  out[i,j] = x[idx[i,j], j]   with x.shape == idx.shape == out.shape
  (axis 0, operand_batching_dims=(1,)); or the lane variant
  out[i,j] = x[i, idx[i,j]]   (axis 1).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, n=20, per=1):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n / per
    print(f"{name:52s} {dt*1e6:9.1f} us")
    return out


def sub_gather(S):
    """out[i,j] = x[idx[i,j], j], all [S,128]."""
    x = jnp.asarray(np.random.rand(S, 128).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, S, size=(S, 128))
                      .astype(np.int32))

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    out = timeit(f"sublane dynamic_gather [S={S},128]", run, x, idx)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), 0)
    print("   correct:", np.allclose(np.asarray(out), ref),
          f" ({S*128} lookups)")


def lane_gather(S):
    """out[i,j] = x[i, idx[i,j]]."""
    x = jnp.asarray(np.random.rand(S, 128).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, 128, size=(S, 128))
                      .astype(np.int32))

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    out = timeit(f"lane dynamic_gather [S={S},128]", run, x, idx)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), 1)
    print("   correct:", np.allclose(np.asarray(out), ref))


def chained(S, K=32):
    """K dependent gathers (index fed by previous gather) in ONE kernel:
    the walk-critical-path shape."""
    x = jnp.asarray(np.random.rand(S, 128).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, S, size=(S, 128))
                      .astype(np.int32))

    def kernel(x_ref, i_ref, o_ref):
        def body(k, carry):
            ii, acc = carry
            v = jnp.take_along_axis(x_ref[:], ii, axis=0)
            acc = acc + v
            nii = (ii + v.astype(jnp.int32) + k) % S
            return (nii, acc)

        _, acc = jax.lax.fori_loop(
            0, K, body,
            (i_ref[:], jnp.zeros((S, 128), jnp.float32)))
        o_ref[:] = acc

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    timeit(f"chained x{K} dep sublane gather [S={S},128], per",
           run, x, idx, per=K)


def hybrid_step(S=1024, K=32):
    """jit(pallas K-step kernel -> event log) + one XLA scatter-add of
    the [K*S*128] log, host-called: the full hybrid step shape."""
    NCL = 2377 * 538
    x = jnp.asarray(np.random.rand(S, 128).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, S, size=(S, 128))
                      .astype(np.int32))

    def kernel(x_ref, i_ref, o_ref, log_i_ref, log_w_ref):
        def body(k, carry):
            ii, acc = carry
            v = jnp.take_along_axis(x_ref[:], ii, axis=0)
            acc = acc + v
            nii = (ii + v.astype(jnp.int32) + k) % S
            log_i_ref[k] = nii * 537
            log_w_ref[k] = v
            return (nii, acc)

        _, acc = jax.lax.fori_loop(
            0, K, body,
            (i_ref[:], jnp.zeros((S, 128), jnp.float32)))
        o_ref[:] = acc

    @jax.jit
    def run(x, idx, tally):
        out, li, lw = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((S, 128), jnp.float32),
                       jax.ShapeDtypeStruct((K, S, 128), jnp.int32),
                       jax.ShapeDtypeStruct((K, S, 128), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
        )(x, idx)
        tally = tally.at[li.reshape(-1)].add(lw.reshape(-1))
        return out, tally

    tally = jnp.zeros(NCL, jnp.float32)
    timeit(f"hybrid: K={K} kernel steps + 1 scatter [{K*S*128}]",
           run, x, idx, tally, per=K)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    for S in (1024, 4096, 8192):
        try:
            sub_gather(S)
        except Exception as e:
            print(f"sub_gather S={S} FAILED: {str(e)[:200]}")
    try:
        lane_gather(1024)
    except Exception as e:
        print(f"lane_gather FAILED: {str(e)[:200]}")
    for S in (1024, 8192):
        try:
            chained(S)
        except Exception as e:
            print(f"chained S={S} FAILED: {str(e)[:200]}")
    try:
        hybrid_step()
    except Exception as e:
        print(f"hybrid FAILED: {str(e)[:300]}")
