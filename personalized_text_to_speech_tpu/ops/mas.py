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
#
# The forward DP is a max-plus *linear* recurrence: with
# ``prev[-1] = -inf``,
#
#   row_y[x] = neg_y[x] + max(stay_y[x] + prev[x], prev[x-1]),
#   stay_y[x] = 0 if x < y else -inf,
#
# i.e. ``row_y = A_y ⊗ prev`` for the banded max-plus matrix
# ``A_y[x, x] = neg_y[x] + stay_y[x]``, ``A_y[x, x-1] = neg_y[x]``.  The
# plain kernel scans the T_y rows one at a time; the *chunked* kernel
# exploits associativity of ⊗ to cut the sequential depth ~k×:
#
#   1. compose each group of k consecutive operators into one banded
#      operator ``C_c = A_{ck+k} ⊗ … ⊗ A_{ck+1}`` (bandwidth k+1) — depth k,
#      all chunks in parallel;
#   2. scan the n_chunks chunk-boundary rows ``carry ← C_c ⊗ carry`` —
#      depth n_chunks;
#   3. re-expand the interior rows of every chunk from its boundary row with
#      the original per-row step — depth k, all chunks in parallel.
#
# Depth drops from T_y to 2k + T_y/k (~7× at T_y=512, k=16) in exchange for
# a (k+1)-wide band per composition step, a good trade on CPU where
# per-step dispatch dominates the tiny [B, T_x] row ops.  Backtrack is
# unchanged (its per-step work is O(B)).
# --------------------------------------------------------------------------

def _first_row(neg_cent: jnp.ndarray) -> jnp.ndarray:
    t_x = neg_cent.shape[-1]
    x_idx = jnp.arange(t_x)
    return neg_cent[:, 0, :] + jnp.where(x_idx[None, :] == 0, 0.0, _NEG)


def _fwd_step(prev_row, inputs):
    """One DP row: ``row = neg + max(stay·[x<y], prev shifted right)``."""
    y, neg_row = inputs
    x_idx = jnp.arange(prev_row.shape[-1])
    stay = jnp.where(x_idx[None, :] < y, prev_row, _NEG)
    advance = jnp.pad(
        prev_row[:, :-1], ((0, 0), (1, 0)), constant_values=_NEG
    )
    row = neg_row + jnp.maximum(stay, advance)
    return row, row


def _forward_values(neg_cent: jnp.ndarray) -> jnp.ndarray:
    """Plain row-by-row forward DP → value rows [t_y, B, t_x]."""
    t_y = neg_cent.shape[1]
    first_row = _first_row(neg_cent)
    ys = (jnp.arange(1, t_y), jnp.swapaxes(neg_cent[:, 1:, :], 0, 1))
    _, rest = jax.lax.scan(_fwd_step, first_row, ys)
    return jnp.concatenate([first_row[None], rest], axis=0)


def _forward_values_chunked(neg_cent: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Chunked (max,+) forward DP → value rows [t_y, B, t_x].

    Same recurrence as :func:`_forward_values` with sequential depth
    ``2·chunk + ceil((t_y-1)/chunk)`` instead of ``t_y`` (see module scan
    section comment).  Bit-identical argmax structure up to float summation
    order: a composed band accumulates its k ``neg`` terms newest-first,
    the plain scan oldest-first.
    """
    b, t_y, t_x = neg_cent.shape
    first_row = _first_row(neg_cent)
    n_rows = t_y - 1
    if n_rows <= 0:
        return first_row[None]
    n_chunks = -(-n_rows // chunk)
    pad = n_chunks * chunk - n_rows
    # pad with extra rows; their values are garbage but sit past t_y-1 and
    # are sliced off before return
    ys = jnp.concatenate(
        [jnp.arange(1, t_y), jnp.full((pad,), t_y, jnp.int32)]
    ).reshape(n_chunks, chunk)
    negs = jnp.concatenate(
        [
            jnp.swapaxes(neg_cent[:, 1:, :], 0, 1),
            jnp.zeros((pad, b, t_x), neg_cent.dtype),
        ]
    ).reshape(n_chunks, chunk, b, t_x)

    x_idx = jnp.arange(t_x)

    # ---- pass 1: compose each chunk's k operators into one band ----------
    # C[c, b, j, x] = best score entering chunk c at text x-j and leaving at
    # x; identity to start (j=0 diagonal of zeros).
    def compose_step(c_band, inputs):
        y, neg_row = inputs  # [n_chunks], [n_chunks, b, t_x]
        stay_gate = jnp.where(
            x_idx[None, :] < y[:, None], 0.0, _NEG
        )  # [n_chunks, t_x]
        stay = (neg_row + stay_gate[:, None, :])[:, :, None, :] + c_band
        c_shift = jnp.pad(
            c_band[:, :, :-1, :-1],
            ((0, 0), (0, 0), (1, 0), (1, 0)),
            constant_values=_NEG,
        )  # C[j-1, x-1]
        adv = neg_row[:, :, None, :] + c_shift
        return jnp.maximum(stay, adv), None

    ident = jnp.full((n_chunks, b, chunk + 1, t_x), _NEG, jnp.float32)
    ident = ident.at[:, :, 0, :].set(0.0)
    c_band, _ = jax.lax.scan(
        compose_step, ident, (jnp.swapaxes(ys, 0, 1), jnp.swapaxes(negs, 0, 1))
    )

    # ---- pass 2: scan chunk boundaries with the composed bands -----------
    def boundary_step(prev_row, band):  # band: [b, chunk+1, t_x]
        shifts = jnp.stack(
            [
                jnp.pad(
                    prev_row[:, : t_x - j],
                    ((0, 0), (min(j, t_x), 0)),
                    constant_values=_NEG,
                )
                if j < t_x
                else jnp.full_like(prev_row, _NEG)
                for j in range(chunk + 1)
            ],
            axis=1,
        )  # [b, chunk+1, t_x]; shifts[:, j, x] = prev[x-j]
        row = jnp.max(band + shifts, axis=1)
        return row, prev_row

    _, chunk_starts = jax.lax.scan(boundary_step, first_row, c_band)
    # chunk_starts[c] = value row just before chunk c

    # ---- pass 3: re-expand interior rows, all chunks in parallel ---------
    def expand_step(prev_rows, inputs):  # prev_rows: [n_chunks, b, t_x]
        y, neg_row = inputs
        row, _ = jax.vmap(_fwd_step)(prev_rows, (y, neg_row))
        return row, row

    _, interior = jax.lax.scan(
        expand_step,
        chunk_starts,
        (jnp.swapaxes(ys, 0, 1), jnp.swapaxes(negs, 0, 1)),
    )  # [chunk, n_chunks, b, t_x]
    rows = jnp.swapaxes(interior, 0, 1).reshape(n_chunks * chunk, b, t_x)
    return jnp.concatenate([first_row[None], rows[:n_rows]], axis=0)


def _backtrack(
    value: jnp.ndarray,
    text_lengths: jnp.ndarray,
    spec_lengths: jnp.ndarray,
) -> jnp.ndarray:
    t_y, b, t_x = value.shape
    x_idx = jnp.arange(t_x)

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


@jax.jit
def _maximum_path_scan(
    neg_cent: jnp.ndarray,
    text_lengths: jnp.ndarray,
    spec_lengths: jnp.ndarray,
) -> jnp.ndarray:
    value = _forward_values(neg_cent.astype(jnp.float32))
    return _backtrack(value, text_lengths, spec_lengths)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _maximum_path_scan_chunked(
    neg_cent: jnp.ndarray,
    text_lengths: jnp.ndarray,
    spec_lengths: jnp.ndarray,
    chunk: int = 8,
) -> jnp.ndarray:
    value = _forward_values_chunked(neg_cent.astype(jnp.float32), chunk)
    return _backtrack(value, text_lengths, spec_lengths)


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
    if _use_chunked():
        path = _maximum_path_scan_chunked(
            neg_cent, text_lengths, spec_lengths, chunk=_chunk_size()
        )
    else:
        path = _maximum_path_scan(neg_cent, text_lengths, spec_lengths)
    return jax.lax.stop_gradient(path)


def _use_chunked() -> bool:
    """Opt-in only (PTTS_MAS_IMPL=chunked).  Measured verdict (PERF.md):
    on an idle CPU the plain scan's per-row dispatch is cheap and the
    chunked kernel's (k+1)-wide band loses at every tested geometry
    (0.2–0.7×); only on a heavily oversubscribed host — where many tiny
    dispatches starve worse than fewer bigger ones — did chunking win
    (4–15×).  Keeping the plain scan as the default optimizes the
    configuration that matters."""
    import os

    return os.environ.get("PTTS_MAS_IMPL", "auto") == "chunked"


def _chunk_size() -> int:
    import os

    return int(os.environ.get("PTTS_MAS_CHUNK", "8"))


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
