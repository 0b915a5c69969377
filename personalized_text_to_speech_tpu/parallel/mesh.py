"""Mesh + sharding-spec helpers.

Data parallelism is the production strategy for this model family (the
reference's only distribution mode: DDP over local GPUs,
``finetune_speaker_v2.py:144-145``); the mesh also reserves a ``model`` axis
so tensor-parallel sharding of the wide HiFi-GAN/discriminator channels can be
enabled without restructuring callers.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    axes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh from an axis-size dict; sizes of ``-1`` absorb remaining
    devices (like the default ``{"data": -1}``)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    axes = dict(axes or {"data": -1})
    names = list(axes.keys())
    sizes = list(axes.values())
    n_fixed = int(np.prod([s for s in sizes if s != -1])) or 1
    sizes = [n // n_fixed if s == -1 else s for s in sizes]
    total = int(np.prod(sizes))
    if total != n:
        if total > n:
            raise ValueError(
                f"mesh {dict(zip(names, sizes))} needs {total} devices, have {n}"
            )
        # fall back to the device prefix that fits — but never silently:
        # a mesh {data:3} on 8 chips would otherwise train on 3 of them
        logging.getLogger(__name__).warning(
            "mesh %s uses only %d of %d available devices — %d left idle "
            "(use -1 for an axis to absorb all devices)",
            dict(zip(names, sizes)), total, n, n - total,
        )
        devices = devices[:total]
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put every array in a batch pytree with its batch dim sharded.

    Single process: a plain sharded ``device_put``.  Multi-process (pod
    slice / CPU fleet): each process holds only its rank's rows (the
    ``BucketBatcher`` yields per-shard batches, reference
    ``data_utils.py:170-276`` semantics), so the global array is assembled
    with ``make_array_from_process_local_data`` — the global batch is
    ``local_batch × process_count`` along the sharded axis."""
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sharding), batch
        )

    def _globalize(a):
        a = np.asarray(a)
        global_shape = (a.shape[0] * jax.process_count(),) + a.shape[1:]
        return jax.make_array_from_process_local_data(sharding, a, global_shape)

    return jax.tree_util.tree_map(_globalize, batch)
