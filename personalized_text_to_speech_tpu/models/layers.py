"""NN building blocks: torch-semantics convs (incl. weight norm), LayerNorm,
DDSConv, WaveNet stack, HiFi-GAN residual blocks, conv-FFN.

Counterparts of the reference blocks (reference ``modules.py:20-256``,
``attentions.py:257-303``) in TPU layout ``[B, T, C]`` (channels-last, lane-dim
friendly).  Convolution parameter conventions are chosen so the PyTorch
checkpoint bridge is a pure transpose:

* ``Conv1d.kernel``: ``[K, C_in/groups, C_out]`` (= torch ``weight.permute(2,1,0)``),
* weight-normalized convs store ``(v, g)`` exactly like torch's
  ``weight_norm`` (dim 0): for Conv1d the norm is per-output-channel over
  ``(K, C_in)``; for ConvTranspose1d it is per-INPUT-channel over
  ``(K, C_out)`` because torch's transposed-conv weight has ``C_in`` first.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1

Dtype = Any


def _normal_init(std: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


def torch_conv_default_init(key, shape, dtype=jnp.float32):
    """Torch Conv1d default (kaiming-uniform a=√5 → U(-b, b) with
    b = 1/sqrt(fan_in)); shape is [K, C_in/groups, C_out]."""
    fan_in = shape[0] * shape[1]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Torch ``F.normalize`` semantics: x / max(‖x‖₂, eps)."""
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


def spectral_norm_kernel(
    mod: nn.Module,
    kshape: Tuple[int, ...],
    torch_perm: Tuple[int, ...],
    kernel_init: Callable,
) -> jnp.ndarray:
    """Spectrally-normalized conv kernel with torch parity
    (``torch.nn.utils.spectral_norm``: dim 0, one power iteration per
    training forward, eps 1e-12 — the reference's discriminator variant,
    reference ``models.py:304,339``).

    The raw weight is the ``w_orig`` param (→ torch ``weight_orig``); the
    left/right singular-vector estimates live in the ``spectral`` variable
    collection (→ ``weight_u``/``weight_v``), flattened in torch's
    ``weight.reshape(C_out, -1)`` column order so checkpoints round-trip
    verbatim.  The power iteration runs only when the caller marks
    ``spectral`` mutable (training D-step); it is skipped under init and
    frozen evaluation, exactly like torch's train/eval split.
    """
    w = mod.param("w_orig", kernel_init, kshape)
    n_out = kshape[torch_perm[0]]
    n_rest = 1
    for d in kshape:
        n_rest *= d
    n_rest //= n_out

    if mod.is_initializing():
        ku, kv = jax.random.split(mod.make_rng("params"))
        u0 = _l2_normalize(jax.random.normal(ku, (n_out,), jnp.float32))
        v0 = _l2_normalize(jax.random.normal(kv, (n_rest,), jnp.float32))
    else:
        u0 = v0 = None
    u_var = mod.variable("spectral", "u", lambda: u0)
    v_var = mod.variable("spectral", "v", lambda: v0)

    w32 = w.astype(jnp.float32)
    w2d = jnp.transpose(w32, torch_perm).reshape(n_out, n_rest)
    u, v = u_var.value, v_var.value
    if not mod.is_initializing() and mod.is_mutable_collection("spectral"):
        # one power iteration under stop_gradient (torch runs it in no_grad)
        v = _l2_normalize(jax.lax.stop_gradient(w2d).T @ u)
        u = _l2_normalize(jax.lax.stop_gradient(w2d) @ v)
        u_var.value, v_var.value = u, v
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = jnp.dot(u, w2d @ v)
    return (w32 / sigma).astype(w.dtype)


class Conv1d(nn.Module):
    """1-D convolution over [B, T, C] with torch-style symmetric padding.

    ``weight_norm=True`` stores the torch (v, g) decomposition so reference
    checkpoints load without folding (reference keeps WN at train AND
    inference time, e.g. ``modules.py:128-145``, ``models.py:254``).
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: Optional[int] = None  # None → torch "same" for odd kernels
    use_bias: bool = True
    weight_norm: bool = False
    spectral_norm: bool = False
    kernel_init: Callable = torch_conv_default_init
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kshape = (self.kernel_size, in_ch // self.groups, self.features)
        if self.spectral_norm:
            # torch weight [C_out, C_in/g, K] ← our [K, C_in/g, C_out]
            kernel = spectral_norm_kernel(
                self, kshape, (2, 1, 0), self.kernel_init
            )
        elif self.weight_norm:
            v = self.param("v", self.kernel_init, kshape)
            g = self.param(
                "g",
                lambda key, shape: jnp.linalg.norm(
                    v.reshape(-1, self.features), axis=0
                ),
                (self.features,),
            )
            norm = jnp.sqrt(
                jnp.sum(jnp.square(v.astype(jnp.float32)), axis=(0, 1), keepdims=True)
                + 1e-12
            )
            kernel = v / norm * g[None, None, :]
        else:
            kernel = self.param("kernel", self.kernel_init, kshape)

        pad = self.padding
        if pad is None:
            pad = get_padding(self.kernel_size, self.dilation)

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(self.stride,),
            padding=[(pad, pad)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            fan_in = self.kernel_size * in_ch // self.groups
            bound = 1.0 / math.sqrt(fan_in)
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound, bound
                ),
                (self.features,),
            )
            y = y + bias
        return y.astype(self.dtype)


class ConvTranspose1d(nn.Module):
    """Transposed 1-D conv matching torch ``ConvTranspose1d(stride=s,
    padding=p)``: ``L_out = (L_in-1)·s − 2p + K``.

    Implemented as an input-dilated regular conv (``lhs_dilation=s``) with
    padding ``K−1−p`` and a spatially flipped kernel — the standard
    XLA-native formulation.  Kernel param layout ``[K, C_in, C_out]``
    (= torch ``weight.permute(2,0,1)``); weight-norm ``g`` is per input
    channel (torch dim-0 of its ``[C_in, C_out, K]`` weight).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False
    kernel_init: Callable = torch_conv_default_init
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kshape = (self.kernel_size, in_ch, self.features)
        if self.weight_norm:
            v = self.param("v", self.kernel_init, kshape)
            g = self.param(
                "g",
                lambda key, shape: jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=(0, 2))
                ),
                (in_ch,),
            )
            norm = jnp.sqrt(
                jnp.sum(
                    jnp.square(v.astype(jnp.float32)), axis=(0, 2), keepdims=True
                )
                + 1e-12
            )
            kernel = v / norm * g[None, :, None]
        else:
            kernel = self.param("kernel", self.kernel_init, kshape)

        pad = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.flip(kernel, axis=0).astype(self.dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            fan_in = self.kernel_size * in_ch
            bound = 1.0 / math.sqrt(fan_in)
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound, bound
                ),
                (self.features,),
            )
            y = y + bias
        return y.astype(self.dtype)


class Conv2d(nn.Module):
    """2-D convolution over [B, H, W, C] (for the period discriminators);
    torch-style per-axis symmetric padding, optional weight norm (torch
    layout bridge: kernel = torch ``weight.permute(2,3,1,0)``)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    weight_norm: bool = False
    spectral_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        kshape = (kh, kw, in_ch, self.features)

        def kinit(key, shape, dtype=jnp.float32):
            fan_in = kh * kw * in_ch
            bound = 1.0 / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        if self.spectral_norm:
            # torch weight [C_out, C_in, kh, kw] ← our [kh, kw, C_in, C_out]
            kernel = spectral_norm_kernel(self, kshape, (3, 2, 0, 1), kinit)
        elif self.weight_norm:
            v = self.param("v", kinit, kshape)
            g = self.param(
                "g",
                lambda key, shape: jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=(0, 1, 2))
                ),
                (self.features,),
            )
            norm = jnp.sqrt(
                jnp.sum(
                    jnp.square(v.astype(jnp.float32)),
                    axis=(0, 1, 2),
                    keepdims=True,
                )
                + 1e-12
            )
            kernel = v / norm * g[None, None, None, :]
        else:
            kernel = self.param("kernel", kinit, kshape)

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=self.strides,
            padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            fan_in = kh * kw * in_ch
            bound = 1.0 / math.sqrt(fan_in)
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound, bound
                ),
                (self.features,),
            )
            y = y + bias
        return y.astype(self.dtype)


class LayerNorm(nn.Module):
    """Channel LayerNorm over the last axis, fp32 statistics
    (reference ``modules.py:20-32`` normalizes the channel dim)."""

    channels: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * gamma + beta).astype(self.dtype)


class DDSConv(nn.Module):
    """Dilated depth-separable conv stack (reference ``modules.py:70-108``):
    n layers of [depthwise conv (dilation kᶦ) → LN → GELU → 1×1 → LN → GELU →
    dropout] with residual."""

    channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            dilation = self.kernel_size ** i
            y = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=dilation,
                groups=self.channels,
                dtype=self.dtype,
                name=f"convs_sep_{i}",
            )(x * x_mask)
            y = LayerNorm(self.channels, dtype=self.dtype, name=f"norms_1_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = Conv1d(self.channels, 1, dtype=self.dtype, name=f"convs_1x1_{i}")(y)
            y = LayerNorm(self.channels, dtype=self.dtype, name=f"norms_2_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = x + y
        return x * x_mask


class WN(nn.Module):
    """WaveNet residual stack with gated-tanh units and global conditioning
    (reference ``modules.py:111-176``): per-layer dilated conv (weight norm),
    one shared 1×1 cond projection for all layers, res/skip split."""

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h = self.hidden_channels
        output = jnp.zeros_like(x)
        if g is not None:
            g = Conv1d(
                2 * h * self.n_layers,
                1,
                weight_norm=True,
                dtype=self.dtype,
                name="cond_layer",
            )(g)
        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            x_in = Conv1d(
                2 * h,
                self.kernel_size,
                dilation=dilation,
                weight_norm=True,
                dtype=self.dtype,
                name=f"in_layers_{i}",
            )(x)
            if g is not None:
                g_l = g[..., i * 2 * h : (i + 1) * 2 * h]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = jnp.tanh((x_in + g_l)[..., :h]) * jax.nn.sigmoid(
                (x_in + g_l)[..., h:]
            )
            acts = nn.Dropout(self.p_dropout)(acts, deterministic=deterministic)
            res_skip_ch = 2 * h if i < self.n_layers - 1 else h
            res_skip = Conv1d(
                res_skip_ch,
                1,
                weight_norm=True,
                dtype=self.dtype,
                name=f"res_skip_layers_{i}",
            )(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return output * x_mask


class ResBlock1(nn.Module):
    """HiFi-GAN MRF block, 3×(dilated + plain) conv pairs
    (reference ``modules.py:187-229``)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, x_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        for j, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=d,
                weight_norm=True,
                kernel_init=_normal_init(0.01),
                dtype=self.dtype,
                name=f"convs1_{j}",
            )(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=1,
                weight_norm=True,
                kernel_init=_normal_init(0.01),
                dtype=self.dtype,
                name=f"convs2_{j}",
            )(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class ResBlock2(nn.Module):
    """HiFi-GAN light MRF block, 2 dilated convs (reference
    ``modules.py:232-256``)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, x_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        for j, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=d,
                weight_norm=True,
                kernel_init=_normal_init(0.01),
                dtype=self.dtype,
                name=f"convs_{j}",
            )(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class FFN(nn.Module):
    """Conv feed-forward block of the text encoder (reference
    ``attentions.py:257-303``); torch-asymmetric same padding
    ((k−1)//2 left, k//2 right) or causal padding."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    activation: Optional[str] = None
    causal: bool = False
    dtype: Dtype = jnp.float32

    def _pad(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.kernel_size == 1:
            return x
        if self.causal:
            pad_l, pad_r = self.kernel_size - 1, 0
        else:
            pad_l, pad_r = (self.kernel_size - 1) // 2, self.kernel_size // 2
        return jnp.pad(x, [(0, 0), (pad_l, pad_r), (0, 0)])

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        y = Conv1d(
            self.filter_channels,
            self.kernel_size,
            padding=0,
            dtype=self.dtype,
            name="conv_1",
        )(self._pad(x * x_mask))
        if self.activation == "gelu":
            y = y * jax.nn.sigmoid(1.702 * y)
        else:
            y = jax.nn.relu(y)
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = Conv1d(
            self.out_channels,
            self.kernel_size,
            padding=0,
            dtype=self.dtype,
            name="conv_2",
        )(self._pad(y * x_mask))
        return y * x_mask
