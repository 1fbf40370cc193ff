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

    One device_put over the whole tree: transfers are batched, which
    matters hugely on remote-tunneled runtimes."""
    return jax.device_put(batch, batch_sharding(mesh, axis_name))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


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


def pad_batch_to(batch, size: int):
    """Pad the leading axis to ``size`` (repeating the first element) so
    ragged final eval batches keep static XLA shapes. Returns (batch, n_real)."""
    def pad(x):
        n = x.shape[0]
        if n == size:
            return x
        reps = np.repeat(x[:1], size - n, axis=0)
        return np.concatenate([x, reps], axis=0)

    n_real = jax.tree.leaves(batch)[0].shape[0]
    return jax.tree.map(pad, batch), n_real
