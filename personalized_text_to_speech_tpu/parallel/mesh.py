"""Mesh + sharding-spec helpers.

Data parallelism is the production strategy for this model family (the
reference's only distribution mode: DDP over local GPUs,
``finetune_speaker_v2.py:144-145``); the mesh also reserves a ``model`` axis
so tensor-parallel sharding of the wide HiFi-GAN/discriminator channels can be
enabled without restructuring callers.
"""

from __future__ import annotations

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
        # fall back to using the largest prefix of devices that fits
        usable = (n // total) * total
        if usable == 0:
            raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} devices, have {n}")
        devices = devices[:total]
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put every array in a batch pytree with its batch dim sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), batch
    )
