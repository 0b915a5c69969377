"""Tensor-parallel sharding specs for the `model` mesh axis.

The reference distributes only by data parallelism (DDP,
``finetune_speaker_v2.py:144-145``); at 40 M params the model fits on any
single chip, so TP is about scaling headroom, not necessity.  This module
turns the reserved ``model`` axis into a real strategy: it derives a
``PartitionSpec`` per parameter — output channels of every conv / dense
kernel, the feature dim of embeddings — and lets GSPMD propagate activation
shardings and insert the collectives.  Any consistent annotation is
*numerically* identical to the replicated program (the equivalence tests in
``tests/test_sharding.py`` and the ``dryrun_multichip`` replay prove it);
the annotation only decides where memory and bandwidth go.

Design notes (why out-channel / feature-dim sharding):

* Conv kernels here are ``[K, C_in, C_out]`` (NHC/HIO layout, channels
  last).  Sharding ``C_out`` makes each device compute a channel slice of
  the output — the Megatron "column parallel" pattern — and GSPMD chooses
  between keeping activations channel-sharded (free) or all-gathering at
  layout boundaries.
* Weight-norm ``g``/``bias`` vectors shard with the axis they index when it
  is the sharded out-channel dim (``Conv1d.g: [C_out]``) and stay replicated
  when they index the *in* channels (``ConvTranspose1d.g: [C_in]``) — the
  decision is made by matching shapes against the sibling ``v``/``kernel``
  param, not by name alone.
* Everything 1-D that doesn't match a sharded kernel dim (LayerNorm
  gamma/beta, flow biases) is replicated: they're tiny.
* A dim is sharded only when divisible by the axis size; otherwise the leaf
  falls back to replication (correct, just not distributed).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "param_pspecs",
    "tree_pspecs",
    "shard_pytree",
    "count_sharded",
]

_KERNEL_NAMES = ("kernel", "v", "weight_v", "embedding")


def _path_key(entry) -> str:
    """str key for one KeyPath entry (DictKey / SequenceKey / attr)."""
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return str(entry.idx)
    if hasattr(entry, "name"):
        return str(entry.name)
    return str(entry)


def _flatten_with_str_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    return [
        (tuple(_path_key(e) for e in path), leaf) for path, leaf in flat
    ], treedef


def param_pspecs(
    params: Any, tp_size: int, axis: str = "model"
) -> Dict[Tuple[str, ...], P]:
    """Map each parameter path → PartitionSpec for ``tp_size``-way tensor
    parallelism.  Returns a dict keyed by string-path tuples (so optimizer
    moments can be matched by trailing path, see :func:`tree_pspecs`)."""
    flat, _ = _flatten_with_str_paths(params)
    by_module: Dict[Tuple[str, ...], Dict[str, Any]] = {}
    for path, leaf in flat:
        by_module.setdefault(path[:-1], {})[path[-1]] = leaf

    specs: Dict[Tuple[str, ...], P] = {}
    for mod_path, leaves in by_module.items():
        kernel = next(
            (leaves[n] for n in _KERNEL_NAMES if n in leaves), None
        )
        out_dim = (
            int(np.shape(kernel)[-1])
            if kernel is not None and np.ndim(kernel) >= 2
            else None
        )
        shardable = (
            out_dim is not None and tp_size > 1 and out_dim % tp_size == 0
        )
        for name, leaf in leaves.items():
            path = mod_path + (name,)
            nd = np.ndim(leaf)
            if name in _KERNEL_NAMES and nd >= 2 and shardable:
                specs[path] = P(*([None] * (nd - 1) + [axis]))
            elif (
                nd == 1
                and shardable
                and np.shape(leaf)[0] == out_dim
                and name in ("g", "bias", "weight_g")
            ):
                specs[path] = P(axis)
            else:
                specs[path] = P()
    return specs


def tree_pspecs(
    tree: Any, params_specs: Dict[Tuple[str, ...], P]
) -> Any:
    """Spec pytree for an arbitrary pytree (TrainState, opt_state, grads):
    a leaf whose string path *ends with* a known parameter path inherits
    that parameter's spec (Adam's ``mu``/``nu`` mirror the params tree);
    everything else (counts, scalars) is replicated."""
    flat, treedef = _flatten_with_str_paths(tree)
    # longest-match-first so nested duplicates resolve deterministically
    by_len = sorted(params_specs.items(), key=lambda kv: -len(kv[0]))

    def spec_for(path: Tuple[str, ...]) -> P:
        for ppath, spec in by_len:
            if len(path) >= len(ppath) and path[-len(ppath):] == ppath:
                return spec
        return P()

    return jax.tree_util.tree_unflatten(
        treedef, [spec_for(path) for path, _ in flat]
    )


def shard_pytree(
    tree: Any,
    mesh: Mesh,
    axis: str = "model",
    params_specs: Optional[Dict[Tuple[str, ...], P]] = None,
) -> Any:
    """device_put a pytree (params / TrainState / opt_state) with TP specs.

    When ``params_specs`` is None the specs are derived from the tree itself
    (works when the tree IS a params tree or contains one, e.g. TrainState —
    kernels are found wherever they live)."""
    tp_size = int(mesh.shape[axis])
    if params_specs is None:
        params_specs = param_pspecs(tree, tp_size, axis=axis)
    spec_tree = tree_pspecs(tree, params_specs)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def count_sharded(tree: Any, mesh: Mesh, axis: str = "model") -> Tuple[int, int]:
    """(sharded_param_count, total_param_count) under the TP rules — used by
    tests and logs to report how much of the model actually distributes."""
    tp_size = int(mesh.shape[axis])
    specs = param_pspecs(tree, tp_size, axis=axis)
    flat, _ = _flatten_with_str_paths(tree)
    total = sum(int(np.size(l)) for _, l in flat)
    sharded = sum(
        int(np.size(l))
        for path, l in flat
        if axis in tuple(specs.get(path, P()))
    )
    return sharded, total
