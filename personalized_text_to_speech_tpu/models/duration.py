"""Duration models: stochastic (flow-based) and deterministic predictors.

Counterparts of the reference predictors (reference ``models.py:17-132``).
The stochastic duration predictor is a conditional normalizing flow over
``(log-duration, auxiliary)`` 2-channel latents:

* training (``reverse=False``): variational posterior flows q(u, ν | w, x)
  over 4 spline couplings produce the NLL + log-q duration loss per example,
* inference (``reverse=True``): Gaussian noise × ``noise_scale_w`` is pulled
  back through the reversed main flows to sample log-durations; like the
  reference, the first spline coupling is skipped on the reverse path
  (reference ``models.py:89``, "remove a useless vflow").

Noise is drawn from the linen ``'noise'`` RNG stream unless an explicit
``noise`` array is supplied (deterministic tests / seeded serving).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from personalized_text_to_speech_tpu.models.flows import (
    ConvFlow,
    ElementwiseAffine,
    Log,
)
from personalized_text_to_speech_tpu.models.layers import Conv1d, DDSConv, LayerNorm

Dtype = Any

_LOG_2PI = math.log(2 * math.pi)


class StochasticDurationPredictor(nn.Module):
    """Flow-based duration model (reference ``models.py:17-95``)."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float
    n_flows: int = 4
    gin_channels: int = 0
    dtype: Dtype = jnp.float32

    def setup(self):
        # NOTE: the reference overrides filter_channels = in_channels
        # (models.py:20, "it needs to be removed from future version")
        fc = self.in_channels

        self.log_flow = Log(name="log_flow")
        self.flow_pre = ElementwiseAffine(2, name="flows_pre")
        self.flow_couplings = [
            ConvFlow(2, fc, self.kernel_size, n_layers=3, dtype=self.dtype,
                     name=f"flows_conv_{i}")
            for i in range(self.n_flows)
        ]

        self.post_pre = Conv1d(fc, 1, dtype=self.dtype, name="post_pre")
        self.post_proj = Conv1d(fc, 1, dtype=self.dtype, name="post_proj")
        self.post_convs = DDSConv(
            fc, self.kernel_size, n_layers=3, p_dropout=self.p_dropout,
            dtype=self.dtype, name="post_convs",
        )
        self.post_flow_pre = ElementwiseAffine(2, name="post_flows_pre")
        self.post_flow_couplings = [
            ConvFlow(2, fc, self.kernel_size, n_layers=3, dtype=self.dtype,
                     name=f"post_flows_conv_{i}")
            for i in range(4)
        ]

        self.pre = Conv1d(fc, 1, dtype=self.dtype, name="pre")
        self.proj = Conv1d(fc, 1, dtype=self.dtype, name="proj")
        self.convs = DDSConv(
            fc, self.kernel_size, n_layers=3, p_dropout=self.p_dropout,
            dtype=self.dtype, name="convs",
        )
        if self.gin_channels != 0:
            self.cond = Conv1d(fc, 1, dtype=self.dtype, name="cond")

    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        w: Optional[jnp.ndarray] = None,
        g: Optional[jnp.ndarray] = None,
        reverse: bool = False,
        noise_scale: float = 1.0,
        noise: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """x: [B, T, C] text hiddens; x_mask: [B, T, 1]; w: [B, T, 1]
        durations (training); g: [B, 1, gin] speaker conditioning."""
        x = jax.lax.stop_gradient(x)
        x = self.pre(x)
        if g is not None:
            g = jax.lax.stop_gradient(g)
            x = x + self.cond(g)
        x = self.convs(x, x_mask, deterministic=deterministic)
        x = self.proj(x) * x_mask

        if not reverse:
            assert w is not None
            b, t, _ = x.shape

            h_w = self.post_pre(w)
            h_w = self.post_convs(h_w, x_mask, deterministic=deterministic)
            h_w = self.post_proj(h_w) * x_mask

            if noise is None:
                noise = jax.random.normal(
                    self.make_rng("noise"), (b, t, 2), dtype=jnp.float32
                )
            e_q = noise.astype(x.dtype) * x_mask
            z_q = e_q
            logdet_tot_q = jnp.zeros(b, dtype=jnp.float32)
            z_q, ld = self.post_flow_pre(z_q, x_mask)
            logdet_tot_q += ld
            for flow in self.post_flow_couplings:
                z_q, ld = flow(
                    z_q, x_mask, g=(x + h_w), deterministic=deterministic
                )
                logdet_tot_q += ld
                z_q = jnp.flip(z_q, axis=-1)

            z_u, z1 = z_q[..., :1], z_q[..., 1:]
            u = jax.nn.sigmoid(z_u) * x_mask
            z0 = (w - u) * x_mask
            logdet_tot_q += jnp.sum(
                (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * x_mask,
                axis=(1, 2),
            )
            logq = (
                jnp.sum(-0.5 * (_LOG_2PI + e_q ** 2) * x_mask, axis=(1, 2))
                - logdet_tot_q
            )

            logdet_tot = jnp.zeros(b, dtype=jnp.float32)
            z0, ld = self.log_flow(z0, x_mask)
            logdet_tot += ld
            z = jnp.concatenate([z0, z1], axis=-1)
            z, ld = self.flow_pre(z, x_mask)
            logdet_tot += ld
            for flow in self.flow_couplings:
                z, ld = flow(z, x_mask, g=x, deterministic=deterministic)
                logdet_tot += ld
                z = jnp.flip(z, axis=-1)
            nll = (
                jnp.sum(0.5 * (_LOG_2PI + z ** 2) * x_mask, axis=(1, 2))
                - logdet_tot
            )
            return nll + logq  # [B]

        # ---- reverse: sample log-durations -------------------------------
        b, t, _ = x.shape
        if noise is None:
            noise = jax.random.normal(
                self.make_rng("noise"), (b, t, 2), dtype=jnp.float32
            )
        z = noise.astype(x.dtype) * noise_scale
        # reversed flow order; the first coupling (index 0) is skipped
        # (reference models.py:88-89) — its paired Flip is kept.
        for i in range(self.n_flows - 1, -1, -1):
            z = jnp.flip(z, axis=-1)
            if i != 0:
                z = self.flow_couplings[i](z, x_mask, g=x, reverse=True,
                                           deterministic=deterministic)
        z = self.flow_pre(z, x_mask, reverse=True)
        logw = z[..., :1]
        return logw


class DurationPredictor(nn.Module):
    """Deterministic conv duration predictor (reference ``models.py:98-132``)."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float
    gin_channels: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = jax.lax.stop_gradient(x)
        if g is not None:
            g = jax.lax.stop_gradient(g)
            x = x + Conv1d(self.in_channels, 1, dtype=self.dtype, name="cond")(g)
        x = Conv1d(
            self.filter_channels, self.kernel_size, dtype=self.dtype, name="conv_1"
        )(x * x_mask)
        x = jax.nn.relu(x)
        x = LayerNorm(self.filter_channels, dtype=self.dtype, name="norm_1")(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = Conv1d(
            self.filter_channels, self.kernel_size, dtype=self.dtype, name="conv_2"
        )(x * x_mask)
        x = jax.nn.relu(x)
        x = LayerNorm(self.filter_channels, dtype=self.dtype, name="norm_2")(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = Conv1d(1, 1, dtype=self.dtype, name="proj")(x * x_mask)
        return x * x_mask
