"""Masking, duration-path expansion, and segment slicing utilities.

TPU-layout counterparts of the reference tensor utils (reference
``commons.py:48-146``).  All sequence tensors here are time-major-in-batch
``[B, T, C]`` (channels last, lane-dim friendly) rather than torch's
``[B, C, T]``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """[B] lengths → [B, max_length] float mask (reference ``commons.py:124-128``).

    ``max_length`` must be static under jit (bucketed padding supplies it).
    """
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return (pos[None, :] < lengths[:, None]).astype(jnp.float32)


def generate_path(duration: jnp.ndarray, t_y: int, attn_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Durations → hard monotonic alignment path.

    duration: [B, T_x] integer-valued durations per input token.
    Returns [B, t_y, T_x] with ``path[b, y, x] = 1`` iff frame ``y`` belongs to
    token ``x`` — i.e. ``cum[x-1] <= y < cum[x]`` (reference
    ``commons.py:131-146``, which uses a cumsum + shifted-subtraction trick;
    here the band condition is computed directly, which XLA fuses to two
    compares).
    """
    cum = jnp.cumsum(duration, axis=-1)  # [B, T_x]
    y_pos = jnp.arange(t_y, dtype=cum.dtype)[None, :, None]  # [1, t_y, 1]
    upper = cum[:, None, :]  # [B, 1, T_x]
    lower = upper - duration[:, None, :]
    path = ((y_pos >= lower) & (y_pos < upper)).astype(jnp.float32)
    if attn_mask is not None:
        path = path * attn_mask
    return path


def slice_segments(x: jnp.ndarray, ids_str: jnp.ndarray, segment_size: int) -> jnp.ndarray:
    """Gather per-sample windows ``x[b, ids[b]:ids[b]+segment_size]``.

    x: [B, T, C] (or [B, T]); ids_str: [B] start indices; static segment_size
    (reference ``commons.py:48-57``).
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]

    def take(xb, idx):
        return jax.lax.dynamic_slice_in_dim(xb, idx, segment_size, axis=0)

    out = jax.vmap(take)(x, ids_str)
    return out[..., 0] if squeeze else out


def rand_slice_segments(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    segment_size: int,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random training windows (reference ``commons.py:60-67``): per-sample
    uniform start in ``[0, length - segment_size]``."""
    b = x.shape[0]
    ids_max = jnp.maximum(lengths - segment_size + 1, 1)
    u = jax.random.uniform(rng, (b,))
    ids_str = (u * ids_max.astype(u.dtype)).astype(jnp.int32)
    return slice_segments(x, ids_str, segment_size), ids_str


def fused_gate(x: jnp.ndarray, g: jnp.ndarray, n_channels: int) -> jnp.ndarray:
    """tanh·sigmoid gated activation over a 2·C channel split (reference
    ``commons.py:103-110``); XLA fuses this elementwise chain into the
    producing conv."""
    s = x + g
    return jnp.tanh(s[..., :n_channels]) * jax.nn.sigmoid(s[..., n_channels:])
