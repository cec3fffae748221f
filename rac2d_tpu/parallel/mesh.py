"""Device-mesh sharding for the disk solver.

The reference is a serial binary (SURVEY.md: no MPI/OpenMP anywhere); all
parallelism here is new design.  The decomposition:

  - axis "cells": the (r, z) grid cells, block-sharded.  The per-cell
    stiff chemistry solves are embarrassingly parallel (vmap within each
    shard); column-density path-matrix products need cross-shard segment
    sums (psum).
  - axis "pkt": Monte Carlo packets.  Each device transports its packet
    subset through the (replicated) cell optics; the per-cell tallies are
    psum'd across the packet axis — the MC analogue of gradient
    all-reduce.

Multi-host: the same mesh spans hosts via jax.distributed; tallies ride
ICI within a slice and DCN across slices, handled entirely by XLA
collectives on the psum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_cells_shards=None, n_pkt_shards=None):
    """A 2D (cells, pkt) mesh over the available devices."""
    devs = np.array(jax.devices())
    n = len(devs)
    if n_cells_shards is None:
        # favor packet parallelism (MC dominates wall time)
        n_cells_shards = 1
        n_pkt_shards = n
    if n_pkt_shards is None:
        n_pkt_shards = n // n_cells_shards
    assert n_cells_shards * n_pkt_shards == n
    return Mesh(devs.reshape(n_cells_shards, n_pkt_shards),
                axis_names=("cells", "pkt"))


def put_global(sharding, arr):
    """device_put that also works MULTI-PROCESS: every process passes
    the same host-global array and contributes only its addressable
    shards (jax.device_put would reject non-addressable devices)."""
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    a = np.asarray(arr)
    return jax.make_array_from_callback(a.shape, sharding,
                                        lambda idx: a[idx])


def shard_batch(mesh: Mesh, arr, axis="cells"):
    """Put an array with its leading axis sharded over `axis`."""
    return put_global(NamedSharding(mesh, P(axis)), arr)


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))


def sharded_chemistry_solve(mesh: Mesh, ode, envs, tenvs, y0b, T0b, touts,
                            rtol_b, atol_b, first_step, evolT,
                            max_steps_per_interval=2000):
    """Batched chemistry solve with the cell batch sharded over the whole
    mesh (both axes flattened): pure data parallelism over lanes; the
    only collectives are the tiny any-lane-active reductions of the
    round loop."""
    flat = Mesh(mesh.devices.reshape(-1), axis_names=("d",))
    sh = NamedSharding(flat, P("d"))
    put = lambda t: jax.tree.map(lambda a: put_global(sh, a), t)
    envs = put(envs)
    tenvs = put(tenvs) if tenvs is not None else None
    y0b = put_global(sh, y0b)
    T0b = put_global(sh, T0b)
    return ode.solve_batched(envs, y0b, T0b, touts, rtol_b, atol_b,
                             first_step=first_step, evolT=evolT,
                             tenvs=tenvs,
                             max_steps_per_interval=max_steps_per_interval)


def mc_pass_sharded(mesh: Mesh, model, key, packets, tallies,
                    hosted: bool = True, **kw):
    """MC with packets sharded over every device; per-cell tallies are
    partial per shard and all-reduced at the end (psum via jnp.sum over
    the sharded axis is handled by XLA when we re-shard to replicated).

    hosted=True (the default) drives the walk as bounded device programs
    (mcrt.mc_pass_hosted); the shardings persist across host-loop calls.
    Required on real TPU, single- or multi-chip (device-program
    watchdog).  hosted=False runs one whole-pass program (CPU tests).

    compact is rejected: _compact_packets rebuilds the batch host-side
    with default placement, which would silently unshard the packet axis
    (and break device-count divisibility).

    Always returns (packets, tallies, fates)."""
    from ..ops import mcrt
    if kw.pop("compact", False):
        raise ValueError("mc_pass_sharded does not support compact=True; "
                         "the host-side batch rebuild would unshard the "
                         "packet axis")
    flat = Mesh(mesh.devices.reshape(-1), axis_names=("d",))
    shp = NamedSharding(flat, P("d"))
    rep = NamedSharding(flat, P())
    packets = jax.tree.map(lambda a: put_global(shp, a), packets)
    model = jax.tree.map(lambda a: put_global(rep, a), model)
    tallies = jax.tree.map(lambda a: put_global(rep, a), tallies)
    # scatter-adds from sharded packets into replicated tallies become
    # XLA all-reduces automatically under jit
    if hosted:
        return mcrt.mc_pass_hosted(model, key, packets, tallies, **kw)
    packets, tallies = mcrt.mc_pass(model, key, packets, tallies, **kw)
    return packets, tallies, mcrt.packet_fates(packets.status)


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-host initialization (jax.distributed) for DCN-connected
    slices: call once per host before building meshes; afterwards
    jax.devices() spans all hosts and the same make_mesh()/psum code
    runs unchanged — collectives ride ICI within a slice and DCN across
    (SURVEY.md §5 distributed-backend design).

    No-ops when already initialized or when env-based auto-detection
    (TPU pods) suffices.
    """
    import jax
    try:
        if coordinator is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator, num_processes,
                                       process_id)
    except RuntimeError:
        pass   # already initialized


def host_local_batch(global_arr, mesh, axis="cells"):
    """Slice a host-global numpy batch to this process's addressable
    shard rows, for jax.make_array_from_process_local_data-style
    multi-host feeding."""
    import jax
    n = global_arr.shape[0]
    per = n // jax.process_count()
    i0 = jax.process_index() * per
    return global_arr[i0:i0 + per]
