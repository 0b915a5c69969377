"""Monotonic Alignment Search as a Pallas TPU kernel.

The ``lax.scan`` MAS (:mod:`.mas`) materializes the full ``[T_y, B, T_x]``
value tensor in HBM and runs 2·T_y dispatch steps.  This kernel keeps the
whole DP state in VMEM and fuses forward accumulation + backtrack into one
``pallas_call``:

* grid over batch blocks; each program owns ``[BB, T_y, T_x]`` score and
  value tiles in VMEM (BB chosen so ~2 tiles fit the ~16 MB budget),
* forward: ``fori_loop`` over spec frames; each step is a ``[BB, T_x]`` VPU
  op — ``V[y] = neg[y] + max(V[y-1], shift₁(V[y-1]))`` with the ``x ≤ y``
  monotonicity mask,
* backtrack: reverse ``fori_loop`` carrying a one-hot cursor row per sample;
  lane-gather-free — predecessor values are read via masked reductions and
  the cursor moves by multiplying with the shifted one-hot.

Numerically identical to the scan kernel and the numpy/C++ oracles (tested
in interpret mode on CPU and compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _mas_kernel(neg_ref, text_len_ref, spec_len_ref, path_ref, value_ref):
    bb, t_y, t_x = neg_ref.shape
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (bb, t_x), 1)

    spec_len = spec_len_ref[:, 0]  # [BB]
    text_len = text_len_ref[:, 0]

    # ---- forward: V[y] = neg[y] + max(stay, advance) ---------------------
    first = neg_ref[:, 0, :] + jnp.where(x_idx == 0, 0.0, _NEG)
    value_ref[:, 0, :] = first

    def fwd(y, prev_row):
        stay = jnp.where(x_idx < y, prev_row, _NEG)
        shifted = pltpu.roll(prev_row, 1, axis=1)
        advance = jnp.where(x_idx == 0, _NEG, shifted)
        row = neg_ref[:, y, :] + jnp.maximum(stay, advance)
        value_ref[:, y, :] = row
        return row

    jax.lax.fori_loop(1, t_y, fwd, first)

    # ---- backtrack: one-hot cursor, masked-reduction predecessor reads ---
    init_cursor = (x_idx == jnp.maximum(text_len - 1, 0)[:, None]).astype(
        jnp.float32
    )

    def bwd(i, cursor):
        y = t_y - 1 - i
        active = (y < spec_len)[:, None]  # [BB, 1]
        path_ref[:, y, :] = jnp.where(active, cursor, 0.0)

        v_below = value_ref[:, jnp.maximum(y - 1, 0), :]
        v_stay = jnp.sum(v_below * cursor, axis=1, keepdims=True)
        # left-shift by one == circular right-shift by t_x-1 (roll requires
        # a non-negative shift); the cursor never sits at x==0 when it moves,
        # so wraparound cannot produce a spurious hot lane
        cursor_left = pltpu.roll(cursor, t_x - 1, axis=1)
        v_adv = jnp.sum(v_below * cursor_left, axis=1, keepdims=True)
        cursor_pos = jnp.sum(x_idx.astype(jnp.float32) * cursor, axis=1,
                             keepdims=True)
        dec = (
            (cursor_pos > 0)
            & ((cursor_pos == y) | (v_stay < v_adv))
            & active
            & (y > 0)
        )
        return jnp.where(dec, cursor_left, cursor)

    jax.lax.fori_loop(0, t_y, bwd, init_cursor)


def _pick_block(b: int, t_y: int, t_x: int, budget_bytes: int = 10_000_000) -> int:
    per_row = t_y * t_x * 4 * 2  # neg tile + value scratch
    bb = max(1, budget_bytes // max(per_row, 1))
    while b % bb != 0:
        bb -= 1
    return bb


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(
    neg_cent: jnp.ndarray,
    text_lengths: jnp.ndarray,
    spec_lengths: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched MAS: [B, T_y, T_x] scores → hard 0/1 path (float32)."""
    b, t_y, t_x = neg_cent.shape
    bb = _pick_block(b, t_y, t_x)
    text2 = jnp.asarray(text_lengths, jnp.int32).reshape(b, 1)
    spec2 = jnp.asarray(spec_lengths, jnp.int32).reshape(b, 1)

    path = pl.pallas_call(
        _mas_kernel,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, t_y, t_x), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, t_y, t_x), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_y, t_x), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bb, t_y, t_x), jnp.float32)],
        interpret=interpret,
    )(neg_cent.astype(jnp.float32), text2, spec2)

    # zero out padded text columns (cursor starts at text_len-1, so only
    # padded-frame rows needed masking in-kernel)
    x_idx = jnp.arange(t_x)
    path = path * (x_idx[None, None, :] < text_lengths[:, None, None])
    return jax.lax.stop_gradient(path)
