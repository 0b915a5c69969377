"""GAN discriminators: multi-scale (1-D) + multi-period (2-D) ensemble.

Counterpart of the reference discriminators (reference ``models.py:299-386``):
``DiscriminatorS`` is a grouped-conv 1-D stack; ``DiscriminatorP`` reshapes the
waveform into a ``[T/p, p]`` 2-D grid per period ``p ∈ {2,3,5,7,11}`` with
reflect padding.  The ensemble runs all six on (real, generated) pairs and
returns logits plus feature maps for the feature-matching loss.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from personalized_text_to_speech_tpu.models.layers import (
    Conv1d,
    Conv2d,
    LRELU_SLOPE,
)

Dtype = Any


class DiscriminatorP(nn.Module):
    """Period discriminator (reference ``models.py:299-333``).

    ``use_spectral_norm=True`` selects torch-parity spectral normalization
    instead of weight norm (reference ``models.py:304``)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    use_spectral_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        # x: [B, L] → [B, T/p, p, 1]
        b, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, [(0, 0), (0, n_pad)], mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, 1).astype(self.dtype)

        sn = self.use_spectral_norm
        fmap = []
        pad = (self.kernel_size - 1) // 2
        channels = [32, 128, 512, 1024]
        for i, ch in enumerate(channels):
            x = Conv2d(
                ch,
                (self.kernel_size, 1),
                strides=(self.stride, 1),
                padding=(pad, 0),
                weight_norm=not sn,
                spectral_norm=sn,
                dtype=self.dtype,
                name=f"convs_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv2d(
            1024,
            (self.kernel_size, 1),
            strides=(1, 1),
            padding=(pad, 0),
            weight_norm=not sn,
            spectral_norm=sn,
            dtype=self.dtype,
            name="convs_4",
        )(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = Conv2d(
            1, (3, 1), padding=(1, 0), weight_norm=not sn, spectral_norm=sn,
            dtype=self.dtype, name="conv_post",
        )(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator (reference ``models.py:336-361``)."""

    use_spectral_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        # x: [B, L] → [B, L, 1]
        b = x.shape[0]
        x = x[..., None].astype(self.dtype)
        sn = self.use_spectral_norm
        fmap = []
        specs = [
            # (features, kernel, stride, groups, padding)
            (16, 15, 1, 1, 7),
            (64, 41, 4, 4, 20),
            (256, 41, 4, 16, 20),
            (1024, 41, 4, 64, 20),
            (1024, 41, 4, 256, 20),
            (1024, 5, 1, 1, 2),
        ]
        for i, (f, k, s, gps, p) in enumerate(specs):
            x = Conv1d(
                f, k, stride=s, groups=gps, padding=p, weight_norm=not sn,
                spectral_norm=sn, dtype=self.dtype, name=f"convs_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv1d(
            1, 3, padding=1, weight_norm=not sn, spectral_norm=sn,
            dtype=self.dtype, name="conv_post",
        )(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """1 scale + 5 period discriminators over (real, generated) pairs
    (reference ``models.py:364-386``)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    use_spectral_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        sn = self.use_spectral_norm
        discs = [
            DiscriminatorS(use_spectral_norm=sn, dtype=self.dtype, name="disc_s")
        ] + [
            DiscriminatorP(
                p, use_spectral_norm=sn, dtype=self.dtype, name=f"disc_p{p}"
            )
            for p in self.periods
        ]
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d in discs:
            y_d_r, fmap_r = d(y)
            y_d_g, fmap_g = d(y_hat)
            y_d_rs.append(y_d_r)
            y_d_gs.append(y_d_g)
            fmap_rs.append(fmap_r)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
