"""Monotonic Alignment Search (MAS) as an on-device wavefront DP.

The reference implements MAS as a host-side Cython/OpenMP kernel with a
GPU→CPU→GPU round trip every training step (reference
``monotonic_align/core.pyx:7-42`` and ``monotonic_align/__init__.py:13-19``)
— the single most TPU-hostile pattern in the codebase.  Here the same Viterbi
recurrence runs entirely on device:

* forward pass: one ``lax.scan`` over spec frames ``y``; each step is a fully
  vectorized ``[B, T_x]`` VPU op computing
  ``V[y,x] = neg_cent[y,x] + max(V[y-1,x], V[y-1,x-1])`` with the
  monotonicity constraint ``x ≤ y`` (a frame can advance the text cursor by 0
  or 1),
* backtrack: a reverse ``lax.scan`` carrying the per-sample text cursor and
  emitting one-hot path rows.

Index conventions follow the reference call site (``models.py:470-480``):
``neg_cent`` is ``[B, T_y(spec), T_x(text)]`` and the returned hard path is
``[B, T_y, T_x]`` with ``path[b, y, x] = 1`` iff spec frame ``y`` is aligned
to text token ``x``.  Per-sample valid lengths handle bucketed padding; padded
cells are zero in the output.

A pure-numpy reference DP (`maximum_path_numpy`) mirrors the Cython semantics
exactly and is the oracle for kernel tests.  A native C++/OpenMP build of the
same DP is available via :mod:`personalized_text_to_speech_tpu.ops.native` for
host-side pipelines.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e9


# --------------------------------------------------------------------------
# numpy oracle (semantics of reference core.pyx:7-33)
# --------------------------------------------------------------------------

def _maximum_path_each_numpy(value: np.ndarray, t_y: int, t_x: int) -> np.ndarray:
    """Single-example DP + backtrack. ``value`` is modified in place."""
    path = np.zeros_like(value, dtype=np.int32)
    for y in range(t_y):
        lo = max(0, t_x + y - t_y)
        hi = min(t_x, y + 1)
        for x in range(lo, hi):
            v_cur = _NEG if x == y else value[y - 1, x]
            if x == 0:
                v_prev = 0.0 if y == 0 else _NEG
            else:
                v_prev = value[y - 1, x - 1]
            value[y, x] += max(v_prev, v_cur)

    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[y, index] = 1
        if index != 0 and (
            index == y or value[y - 1, index] < value[y - 1, index - 1]
        ):
            index -= 1
    return path


def maximum_path_numpy(
    neg_cent: np.ndarray,
    text_lengths: np.ndarray,
    spec_lengths: np.ndarray,
) -> np.ndarray:
    """Batched numpy MAS: [B, T_y, T_x] scores → hard 0/1 paths."""
    neg_cent = np.array(neg_cent, dtype=np.float32, copy=True)
    b = neg_cent.shape[0]
    out = np.zeros_like(neg_cent, dtype=np.float32)
    for i in range(b):
        t_y = int(spec_lengths[i])
        t_x = int(text_lengths[i])
        out[i, :t_y, :t_x] = _maximum_path_each_numpy(
            neg_cent[i], t_y, t_x
        )[:t_y, :t_x]
    return out


# --------------------------------------------------------------------------
# JAX scan kernel
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
def _maximum_path_scan(
    neg_cent: jnp.ndarray,
    text_lengths: jnp.ndarray,
    spec_lengths: jnp.ndarray,
) -> jnp.ndarray:
    b, t_y, t_x = neg_cent.shape
    neg_cent = neg_cent.astype(jnp.float32)
    x_idx = jnp.arange(t_x)

    # ---- forward: accumulate best-path scores row by row -----------------
    def fwd_step(prev_row, inputs):
        y, neg_row = inputs
        stay = jnp.where(x_idx[None, :] < y, prev_row, _NEG)
        advance = jnp.pad(
            prev_row[:, :-1], ((0, 0), (1, 0)), constant_values=_NEG
        )
        row = neg_row + jnp.maximum(stay, advance)
        return row, row

    first_row = neg_cent[:, 0, :] + jnp.where(x_idx[None, :] == 0, 0.0, _NEG)
    ys = (jnp.arange(1, t_y), jnp.swapaxes(neg_cent[:, 1:, :], 0, 1))
    _, rest = jax.lax.scan(fwd_step, first_row, ys)
    # value[y] rows for y = 0..t_y-1, shape [t_y, B, t_x]
    value = jnp.concatenate([first_row[None], rest], axis=0)

    # ---- backtrack: follow argmax predecessors back down -----------------
    # value_below[y] = value[y-1] (row read when deciding a decrement at y)
    value_below = jnp.concatenate([jnp.zeros_like(value[:1]), value[:-1]], axis=0)

    def bwd_step(idx, inputs):
        y, v_below = inputs
        active = y < spec_lengths  # [B]
        row = (
            jax.nn.one_hot(idx, t_x, dtype=jnp.float32)
            * active[:, None].astype(jnp.float32)
        )
        v_stay = jnp.take_along_axis(v_below, idx[:, None], axis=1)[:, 0]
        v_adv = jnp.take_along_axis(
            v_below, jnp.maximum(idx - 1, 0)[:, None], axis=1
        )[:, 0]
        dec = (idx != 0) & ((idx == y) | (v_stay < v_adv)) & active & (y > 0)
        return idx - dec.astype(idx.dtype), row

    init_idx = jnp.maximum(text_lengths - 1, 0).astype(jnp.int32)
    _, rows = jax.lax.scan(
        bwd_step,
        init_idx,
        (jnp.arange(t_y), value_below),
        reverse=True,
    )
    path = jnp.swapaxes(rows, 0, 1)  # [B, t_y, t_x]
    # zero out padded text columns
    path = path * (x_idx[None, None, :] < text_lengths[:, None, None])
    return path


def maximum_path(
    neg_cent: jnp.ndarray,
    text_lengths: jnp.ndarray,
    spec_lengths: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Batched on-device MAS.

    Args:
      neg_cent: [B, T_y, T_x] alignment log-likelihood scores.
      text_lengths: [B] valid token counts (T_x axis).
      spec_lengths: [B] valid frame counts (T_y axis).
      attn_mask: optional [B, T_y, T_x]; only used to derive lengths when the
        explicit lengths are None (reference-wrapper compatibility).

    Returns a hard 0/1 path [B, T_y, T_x] under ``stop_gradient``.
    """
    if text_lengths is None or spec_lengths is None:
        if attn_mask is None:
            raise ValueError("need lengths or attn_mask")
        spec_lengths = attn_mask[:, :, 0].sum(axis=1).astype(jnp.int32)
        text_lengths = attn_mask[:, 0, :].sum(axis=1).astype(jnp.int32)
    text_lengths = jnp.asarray(text_lengths, dtype=jnp.int32)
    spec_lengths = jnp.asarray(spec_lengths, dtype=jnp.int32)
    if _use_pallas():
        from personalized_text_to_speech_tpu.ops.mas_pallas import (
            maximum_path_pallas,
        )

        return maximum_path_pallas(neg_cent, text_lengths, spec_lengths)
    path = _maximum_path_scan(neg_cent, text_lengths, spec_lengths)
    return jax.lax.stop_gradient(path)


def _use_pallas() -> bool:
    """Pallas kernel on TPU (5×+ faster than the scan: one fused VMEM
    program instead of 2·T_y dispatch steps); scan elsewhere.
    Override with PTTS_MAS_IMPL=scan|pallas."""
    import os

    impl = os.environ.get("PTTS_MAS_IMPL", "auto")
    if impl == "scan":
        return False
    if impl == "pallas":
        return True
    # honor an active jax.default_device(cpu) scope (e.g. eager CPU param
    # init) — compiled Pallas cannot lower for the CPU backend
    try:
        dev = jax.config.jax_default_device
        if dev is not None and getattr(dev, "platform", None) == "cpu":
            return False
    except Exception:
        pass
    return jax.default_backend() not in ("cpu",)
