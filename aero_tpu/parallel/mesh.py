"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's DDP runtime
(``/root/reference/src/ddp/distrib.py``): instead of NCCL process groups
and gradient-bucket all-reduce, we build a ``jax.sharding.Mesh`` over
the chips, annotate the batch axis with a NamedSharding, and let the
XLA partitioner insert the gradient/metric all-reduces over ICI.

The DDP wrap / ``distrib.average`` / barrier API surface collapses into:
- ``make_mesh()``            — mesh over all local/global devices
- ``shard_batch`` sharding   — batch split over the ``dp`` axis
- ``replicated`` sharding    — parameters/optimizer state
"""

from __future__ import annotations

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: tp.Optional[tp.Sequence] = None,
              axis_name: str = "dp") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch, mesh: Mesh, axis_name: str = "dp"):
    """Device_put a host batch (pytree of [B, ...] arrays) split on dp.

    Single-process: one device_put over the whole tree (transfers are
    batched, which matters hugely on remote-tunneled runtimes).
    Multi-process: each process holds only its LOCAL shard of the global
    batch (the loader already rank-shards examples, reference
    train.py:50-51 batch //= world_size), so the global array is
    assembled from per-process local data."""
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.device_put(batch, sharding)


def replicate(tree, mesh: Mesh):
    """Replicate a host tree onto every device of the mesh.

    Multi-process: ``jax.device_put`` of host arrays onto a multi-host
    sharding runs a per-leaf cross-process ``assert_equal`` allgather —
    hundreds of tiny gloo/ICI collectives whose context setup has a 30 s
    rendezvous deadline; any compile-time skew between ranks kills the
    job. Params are identically seeded/loaded on every rank by
    construction, so build the global arrays from process-local data
    instead (no collective at all)."""
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.device_put(tree, sharding)


def local_state(tree):
    """Process-local copy of a (possibly globally-replicated) tree.

    Eval/valid passes run per-process on per-rank file shards of unequal
    sizes (reference Subset(range(rank, N, world)) semantics,
    src/ddp/distrib.py:100); a jit over globally-sharded state would be
    a collective program requiring lockstep across processes and would
    deadlock on ragged shards. Single-process: returns the tree as-is.
    """
    if jax.process_count() == 1:
        return tree
    host = jax.device_get(tree)
    return jax.device_put(host, jax.local_devices()[0])


def coordination_barrier(name: str = "aero", timeout_ms: int = 1_800_000):
    """Cross-process barrier over the coordination service (gRPC), NOT a
    device collective. Device-collective contexts (gloo on CPU) have a
    hard ~30 s rendezvous deadline, so any compile-time skew between
    ranks at the FIRST collective kills the job; this barrier tolerates
    arbitrarily long skew. Used to line ranks up after big compiles."""
    if jax.process_count() > 1:
        try:
            # jax._src.distributed is private and moves between releases
            # (verified present in the pinned jax of this image); fall
            # back to the device-collective barrier if it disappears.
            from jax._src import distributed

            client = distributed.global_state.client
            if client is not None:
                client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
        except (ImportError, AttributeError) as e:
            import logging

            logging.getLogger(__name__).warning(
                f"coordination-service barrier unavailable ({e}); "
                f"falling back to device-collective sync")
            barrier(name)


def barrier(name: str = "aero_barrier") -> None:
    """Cross-process sync point (reference distrib.barrier,
    src/ddp/distrib.py:72-74). No-op single-process."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def global_weighted_average(values, count):
    """Cross-process weighted metric average — the TPU-native
    ``distrib.average`` (reference src/ddp/distrib.py:43-55).

    ``values``: list of floats averaged on this process over ``count``
    items. Single-process: returns inputs unchanged.
    """
    import jax

    if jax.process_count() == 1:
        return list(values), count
    from jax.experimental import multihost_utils
    import numpy as np_

    arr = np_.asarray([v * count for v in values] + [count], np_.float64)
    total = multihost_utils.process_allgather(arr).sum(axis=0)
    total_count = max(total[-1], 1e-9)
    return [float(v / total_count) for v in total[:-1]], int(total[-1])
