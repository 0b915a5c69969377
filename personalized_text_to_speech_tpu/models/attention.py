"""Relative-position multi-head attention and the text-encoder stack.

Counterpart of the reference encoder (reference ``attentions.py:13-254``):
pre-mask scaled-dot attention with a windowed relative-position bias
(window_size=4, embeddings shared across heads) on both keys and values,
post-LayerNorm residual blocks with conv-FFNs.

The rel→abs index shuffles are the standard pad+reshape tricks (reference
``attentions.py:214-243``); they are pure reshapes, which XLA lowers to
layout changes — no gathers.

Unlike the reference, the windowed rel-pos bias is computed *banded*: the
reference zero-pads the (2·window+1)-row embedding table to 2L−1 rows
(reference ``attentions.py:199-212``) and contracts q against all 2L−1
rows, materialising [B, H, L, 2L−1] intermediates of which only the
±window band is non-zero.  Here the contraction stays at the table's true
K = 2·window+1 rows ([B, H, L, K]) and a pad+reshape band↔full shuffle
places the band into the [L, L] score matrix — (2L−1)/K ≈ 44× fewer
rel-pos FLOPs and bytes at L = 200, K = 9, with bitwise-identical results
(the dropped terms are exact zeros).  The reference-shaped 2L−1 path is
kept for L < 2·window+1 (where the shuffle's row-width precondition
L ≥ 2·window fails) and as the exactness oracle in tests.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from personalized_text_to_speech_tpu.models.layers import Conv1d, FFN, LayerNorm

Dtype = Any


def _relative_to_absolute(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, L, 2L−1] relative logits → [B, H, L, L] absolute
    (reference ``attentions.py:214-229``)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, 1)])
    x_flat = x.reshape(b, h, l * 2 * l)
    x_flat = jnp.pad(x_flat, [(0, 0), (0, 0), (0, l - 1)])
    return x_flat.reshape(b, h, l + 1, 2 * l - 1)[:, :, :l, l - 1 :]


def _absolute_to_relative(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, L, L] attention weights → [B, H, L, 2L−1] relative
    (reference ``attentions.py:231-243``)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, l - 1)])
    x_flat = x.reshape(b, h, l * l + l * (l - 1))
    x_flat = jnp.pad(x_flat, [(0, 0), (0, 0), (l, 0)])
    return x_flat.reshape(b, h, l, 2 * l)[:, :, :, 1:]


def _band_to_full(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B, H, L, K] banded rel-pos values → [B, H, L, L] absolute, where
    ``out[t, s] = x[t, s − t + window]`` for |s − t| ≤ window else 0.

    Pure pad+flatten+shift+reshape (no gather): padding each row to width
    L+1 makes the per-row start stride exceed the row length by exactly
    one, so a constant left-shift of ``window`` lands every band element on
    its absolute column.  Requires K = 2·window+1 ≤ L+1 (callers guard
    with L ≥ 2·window); out-of-range band slots are masked to zero first
    so the shift cannot smear them into neighbouring rows.
    """
    b, h, l, k = x.shape
    t_idx = jnp.arange(l)[:, None]
    k_idx = jnp.arange(k)[None, :]
    s_idx = t_idx + k_idx - window
    x = jnp.where((s_idx >= 0) & (s_idx < l), x, 0.0)
    x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, l + 1 - k)])
    x_flat = x.reshape(b, h, l * (l + 1))
    x_flat = jnp.pad(x_flat[:, :, window:], [(0, 0), (0, 0), (0, window)])
    return x_flat[:, :, : l * l].reshape(b, h, l, l)


def _full_to_band(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B, H, L, L] attention weights → [B, H, L, K] band, where
    ``out[t, k] = x[t, t + k − window]`` for valid columns else 0.

    Inverse shuffle of :func:`_band_to_full` (same L ≥ 2·window
    precondition): mask to the band, right-shift the flattened matrix by
    ``window``, and re-read it with row stride L+1 so column s of row t
    appears at band slot s − t + window.
    """
    b, h, l, _ = x.shape
    t_idx = jnp.arange(l)[:, None]
    s_idx = jnp.arange(l)[None, :]
    x = jnp.where(jnp.abs(s_idx - t_idx) <= window, x, 0.0)
    x_flat = x.reshape(b, h, l * l)
    x_flat = jnp.pad(x_flat, [(0, 0), (0, 0), (window, l - window)])
    return x_flat.reshape(b, h, l, l + 1)[:, :, :, : 2 * window + 1]


class MultiHeadAttention(nn.Module):
    """Self/cross attention with optional windowed relative-position bias
    (reference ``attentions.py:101-254``)."""

    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    window_size: Optional[int] = None
    heads_share: bool = True
    proximal_bias: bool = False
    banded_rel: bool = True  # False forces the reference-shaped 2T-1 path (test oracle)
    dtype: Dtype = jnp.float32

    def _rel_embeddings(self, emb: jnp.ndarray, length: int) -> jnp.ndarray:
        """Center-crop/pad the ±window relative table to 2·length−1 rows
        (reference ``attentions.py:199-212``)."""
        w = self.window_size
        pad_len = max(length - (w + 1), 0)
        start = max((w + 1) - length, 0)
        if pad_len > 0:
            emb = jnp.pad(emb, [(0, 0), (pad_len, pad_len), (0, 0)])
        return emb[:, start : start + 2 * length - 1]

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        c: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        k_channels = self.channels // self.n_heads
        q = Conv1d(self.channels, 1, dtype=self.dtype, name="conv_q")(x)
        k = Conv1d(self.channels, 1, dtype=self.dtype, name="conv_k")(c)
        v = Conv1d(self.channels, 1, dtype=self.dtype, name="conv_v")(c)

        b, t_t, _ = q.shape
        t_s = k.shape[1]
        # [B, T, C] → [B, H, T, Dk]
        q = q.reshape(b, t_t, self.n_heads, k_channels).transpose(0, 2, 1, 3)
        k = k.reshape(b, t_s, self.n_heads, k_channels).transpose(0, 2, 1, 3)
        v = v.reshape(b, t_s, self.n_heads, k_channels).transpose(0, 2, 1, 3)

        scale = 1.0 / math.sqrt(k_channels)
        scores = jnp.einsum(
            "bhtd,bhsd->bhts", q * scale, k, preferred_element_type=jnp.float32
        )

        if self.window_size is not None:
            assert t_s == t_t, "relative attention needs self-attention"
            n_heads_rel = 1 if self.heads_share else self.n_heads
            rel_stddev = k_channels ** -0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                lambda key, shape: jax.random.normal(key, shape) * rel_stddev,
                (n_heads_rel, 2 * self.window_size + 1, k_channels),
            )
            emb_rel_v = self.param(
                "emb_rel_v",
                lambda key, shape: jax.random.normal(key, shape) * rel_stddev,
                (n_heads_rel, 2 * self.window_size + 1, k_channels),
            )
            use_band = self.banded_rel and t_s >= 2 * self.window_size + 1
            if use_band:
                # Contract against the true K-row table and band-shuffle —
                # identical math, (2T-1)/K fewer FLOPs/bytes (see module doc).
                rel_band = jnp.einsum(
                    "bhtd,gkd->bhtk",
                    q * scale,
                    emb_rel_k,
                    preferred_element_type=jnp.float32,
                )
                scores = scores + _band_to_full(rel_band, self.window_size)
            else:
                key_rel = self._rel_embeddings(emb_rel_k, t_s)  # [1|H, 2T-1, Dk]
                rel_logits = jnp.einsum(
                    "bhtd,gmd->bhtm",
                    q * scale,
                    key_rel,
                    preferred_element_type=jnp.float32,
                )
                scores = scores + _relative_to_absolute(rel_logits)

        if self.proximal_bias:
            r = jnp.arange(t_s, dtype=jnp.float32)
            diff = r[None, :] - r[:, None]
            scores = scores - jnp.log1p(jnp.abs(diff))[None, None]

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)

        p_attn = jax.nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.p_dropout)(p_attn, deterministic=deterministic)
        output = jnp.einsum(
            "bhts,bhsd->bhtd",
            p_attn.astype(self.dtype),
            v,
            preferred_element_type=jnp.float32,
        )
        if self.window_size is not None:
            if use_band:
                band_weights = _full_to_band(p_attn, self.window_size)
                output = output + jnp.einsum(
                    "bhtk,gkd->bhtd",
                    band_weights.astype(self.dtype),
                    emb_rel_v,
                    preferred_element_type=jnp.float32,
                )
            else:
                rel_weights = _absolute_to_relative(p_attn)
                value_rel = self._rel_embeddings(emb_rel_v, t_s)
                output = output + jnp.einsum(
                    "bhtm,gmd->bhtd",
                    rel_weights.astype(self.dtype),
                    value_rel,
                    preferred_element_type=jnp.float32,
                )

        output = output.transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
        return Conv1d(
            self.out_channels, 1, dtype=self.dtype, name="conv_o"
        )(output.astype(self.dtype))


class Decoder(nn.Module):
    """Causal self-attention + encoder-decoder cross-attention stack.

    API-parity module: the reference defines this decoder but never
    instantiates it (reference ``attentions.py:50-98``, noted dead in
    SURVEY §2); provided complete here for downstream use.
    """

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    proximal_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        h: jnp.ndarray,
        h_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        t = x.shape[1]
        causal = jnp.tril(jnp.ones((t, t), dtype=jnp.float32))
        self_attn_mask = causal[None, None]  # [1, 1, T, T]
        encdec_mask = (h_mask[:, None, :] * x_mask[:, :, None])[:, None]
        x = x * x_mask[..., None]
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, proximal_bias=self.proximal_bias,
                dtype=self.dtype, name=f"self_attn_layers_{i}",
            )(x, x, self_attn_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(
                self.hidden_channels, dtype=self.dtype, name=f"norm_layers_0_{i}"
            )(x + y)
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, dtype=self.dtype,
                name=f"encdec_attn_layers_{i}",
            )(x, h, encdec_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(
                self.hidden_channels, dtype=self.dtype, name=f"norm_layers_1_{i}"
            )(x + y)
            y = FFN(
                self.hidden_channels, self.filter_channels, self.kernel_size,
                p_dropout=self.p_dropout, causal=True, dtype=self.dtype,
                name=f"ffn_layers_{i}",
            )(x, x_mask[..., None], deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(
                self.hidden_channels, dtype=self.dtype, name=f"norm_layers_2_{i}"
            )(x + y)
        return x * x_mask[..., None]


class Encoder(nn.Module):
    """Rel-pos transformer encoder with post-LN residuals
    (reference ``attentions.py:13-47``)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        attn_mask = x_mask[:, :, None] * x_mask[:, None, :]  # [B, T, T]
        attn_mask = attn_mask[:, None]  # [B, 1, T, T]
        x = x * x_mask[..., None]
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                p_dropout=self.p_dropout,
                window_size=self.window_size,
                dtype=self.dtype,
                name=f"attn_layers_{i}",
            )(x, x, attn_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(
                self.hidden_channels, dtype=self.dtype, name=f"norm_layers_1_{i}"
            )(x + y)
            y = FFN(
                self.hidden_channels,
                self.filter_channels,
                self.kernel_size,
                p_dropout=self.p_dropout,
                dtype=self.dtype,
                name=f"ffn_layers_{i}",
            )(x, x_mask[..., None], deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(
                self.hidden_channels, dtype=self.dtype, name=f"norm_layers_2_{i}"
            )(x + y)
        return x * x_mask[..., None]
