"""Normalizing-flow layers: elementwise flows, affine coupling, spline coupling.

Counterparts of the reference flow zoo (reference ``modules.py:259-391``),
layout ``[B, T, C]``, masks ``[B, T, 1]``.  Every flow is bidirectional:
``reverse=False`` returns ``(y, logdet)``; ``reverse=True`` returns ``x``.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from personalized_text_to_speech_tpu.models.layers import Conv1d, DDSConv, WN
from personalized_text_to_speech_tpu.ops.spline import (
    piecewise_rational_quadratic_transform,
)

Dtype = Any


class Log(nn.Module):
    """y = log(x) elementwise flow (reference ``modules.py:259-267``)."""

    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False, **kwargs):
        if not reverse:
            y = jnp.log(jnp.maximum(x, 1e-5)) * x_mask
            logdet = jnp.sum(-y, axis=(1, 2))
            return y, logdet
        return jnp.exp(x) * x_mask


class Flip(nn.Module):
    """Channel-order reversal (reference ``modules.py:270-277``)."""

    @nn.compact
    def __call__(self, x, *args, reverse: bool = False, **kwargs):
        x = jnp.flip(x, axis=-1)
        if not reverse:
            return x, jnp.zeros(x.shape[0], dtype=x.dtype)
        return x


class ElementwiseAffine(nn.Module):
    """Per-channel affine flow (reference ``modules.py:280-295``)."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False, **kwargs):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not reverse:
            y = (m + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs[None, None, :] * x_mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * x_mask


class ResidualCouplingLayer(nn.Module):
    """Affine (mean-only in VITS) coupling with a WN inner net
    (reference ``modules.py:298-343``)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    p_dropout: float = 0.0
    gin_channels: int = 0
    mean_only: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        x_mask,
        g: Optional[jnp.ndarray] = None,
        reverse: bool = False,
        deterministic: bool = True,
    ):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, dtype=self.dtype, name="pre")(x0) * x_mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            p_dropout=self.p_dropout,
            dtype=self.dtype,
            name="enc",
        )(h, x_mask, g=g, deterministic=deterministic)
        stats = (
            Conv1d(
                half * (2 - self.mean_only),
                1,
                kernel_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="post",
            )(h)
            * x_mask
        )
        if not self.mean_only:
            m, logs = stats[..., :half], stats[..., half:]
        else:
            m, logs = stats, jnp.zeros_like(stats)

        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    """4 × (coupling + flip) prior/posterior bridge
    (reference ``models.py:179-209``)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.flows = [
            ResidualCouplingLayer(
                self.channels,
                self.hidden_channels,
                self.kernel_size,
                self.dilation_rate,
                self.n_layers,
                gin_channels=self.gin_channels,
                mean_only=True,
                dtype=self.dtype,
                name=f"coupling_{i}",
            )
            for i in range(self.n_flows)
        ]

    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        if not reverse:
            for flow in self.flows:
                x, _ = flow(x, x_mask, g=g, reverse=False)
                x = jnp.flip(x, axis=-1)
            return x
        for flow in reversed(self.flows):
            x = jnp.flip(x, axis=-1)
            x = flow(x, x_mask, g=g, reverse=True)
        return x


class ConvFlow(nn.Module):
    """Spline coupling: DDSConv conditioner → rational-quadratic spline on the
    second half-channels (reference ``modules.py:346-391``)."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        x_mask,
        g: Optional[jnp.ndarray] = None,
        reverse: bool = False,
        deterministic: bool = True,
    ):
        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.filter_channels, 1, dtype=self.dtype, name="pre")(x0)
        h = DDSConv(
            self.filter_channels,
            self.kernel_size,
            self.n_layers,
            p_dropout=0.0,
            dtype=self.dtype,
            name="convs",
        )(h, x_mask, g=g, deterministic=deterministic)
        h = (
            Conv1d(
                half * (self.num_bins * 3 - 1),
                1,
                kernel_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="proj",
            )(h)
            * x_mask
        )
        b, t, _ = x0.shape
        # channel-major grouping matches the reference reshape
        # (modules.py:370: [b, c·P, t] → [b, c, P, t])
        h = h.reshape(b, t, half, self.num_bins * 3 - 1)

        denom = math.sqrt(self.filter_channels)
        uw = h[..., : self.num_bins] / denom
        uh = h[..., self.num_bins : 2 * self.num_bins] / denom
        ud = h[..., 2 * self.num_bins :]

        x1, logabsdet = piecewise_rational_quadratic_transform(
            x1.astype(jnp.float32),
            uw.astype(jnp.float32),
            uh.astype(jnp.float32),
            ud.astype(jnp.float32),
            inverse=reverse,
            tails="linear",
            tail_bound=self.tail_bound,
        )
        x = jnp.concatenate([x0, x1.astype(x0.dtype)], axis=-1) * x_mask
        logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
        if not reverse:
            return x, logdet
        return x
