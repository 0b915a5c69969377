"""The VITS synthesizer: text encoder, posterior encoder, flow bridge,
duration predictors, HiFi-GAN decoder, and the training/inference graphs.

Counterpart of the reference meta-model (reference ``models.py:135-533``),
redesigned for TPU execution:

* layout ``[B, T, C]`` everywhere; static bucketed shapes under ``jit``,
* MAS is the on-device scan kernel (:mod:`..ops.mas`) instead of a host
  Cython round-trip (reference ``models.py:480``),
* inference produces a fixed ``max_len``-frame canvas plus valid lengths —
  the dynamic-output-length ``w_ceil`` sum (reference ``models.py:510-513``)
  becomes masking over the static canvas, which is what keeps XLA to a single
  compiled program per bucket,
* all sampling (posterior reparameterization, SDP noise, prior noise, random
  training windows) threads explicit PRNG streams: ``'noise'`` and
  ``'slice'``.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from personalized_text_to_speech_tpu.models.attention import Encoder
from personalized_text_to_speech_tpu.models.duration import (
    DurationPredictor,
    StochasticDurationPredictor,
)
from personalized_text_to_speech_tpu.models.flows import ResidualCouplingBlock
from personalized_text_to_speech_tpu.models.layers import (
    Conv1d,
    ConvTranspose1d,
    LRELU_SLOPE,
    ResBlock1,
    ResBlock2,
    WN,
    _normal_init,
)
from personalized_text_to_speech_tpu.ops.mas import maximum_path
from personalized_text_to_speech_tpu.ops.masking import (
    generate_path,
    rand_slice_segments,
    sequence_mask,
)

Dtype = Any

_LOG_2PI = math.log(2 * math.pi)


class TextEncoder(nn.Module):
    """Symbol embedding → rel-pos transformer → prior stats
    (reference ``models.py:135-176``)."""

    n_vocab: int
    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, x_lengths: jnp.ndarray, deterministic: bool = True
    ):
        emb = self.param(
            "emb",
            lambda key, shape: jax.random.normal(key, shape)
            * (self.hidden_channels ** -0.5),
            (self.n_vocab, self.hidden_channels),
        )
        h = emb[x] * math.sqrt(self.hidden_channels)  # [B, T, H]
        x_mask = sequence_mask(x_lengths, x.shape[1])  # [B, T]
        h = Encoder(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            dtype=self.dtype,
            name="encoder",
        )(h.astype(self.dtype), x_mask, deterministic=deterministic)
        stats = (
            Conv1d(self.out_channels * 2, 1, dtype=self.dtype, name="proj")(h)
            * x_mask[..., None]
        )
        m, logs = stats[..., : self.out_channels], stats[..., self.out_channels :]
        return h, m, logs, x_mask[..., None]


class PosteriorEncoder(nn.Module):
    """Linear spectrogram → WN stack → posterior stats + reparameterized
    sample (reference ``models.py:212-241``)."""

    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        y: jnp.ndarray,
        y_lengths: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        noise: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        y_mask = sequence_mask(y_lengths, y.shape[1])[..., None]  # [B, T, 1]
        h = Conv1d(self.hidden_channels, 1, dtype=self.dtype, name="pre")(
            y.astype(self.dtype)
        ) * y_mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            dtype=self.dtype,
            name="enc",
        )(h, y_mask, g=g, deterministic=deterministic)
        stats = (
            Conv1d(self.out_channels * 2, 1, dtype=self.dtype, name="proj")(h)
            * y_mask
        )
        m, logs = stats[..., : self.out_channels], stats[..., self.out_channels :]
        if noise is None:
            noise = jax.random.normal(
                self.make_rng("noise"), m.shape, dtype=jnp.float32
            )
        z = (m + noise.astype(m.dtype) * jnp.exp(logs)) * y_mask
        return z, m, logs, y_mask


class Generator(nn.Module):
    """HiFi-GAN decoder: 4× transposed-conv upsampling (×256 total) with
    multi-receptive-field fusion resblocks (reference ``models.py:244-296``)."""

    initial_channel: int
    resblock: str
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gin_channels: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        x_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: [B, T, C] latent frames; x_mask: optional [B, T, 1].

        With a mask, activations are re-zeroed beyond each utterance's
        boundary after every conv stage, so a padded static canvas produces
        bit-identical audio to running each utterance at its exact length
        (conv zero-padding at the true boundary) — required for batched
        bucketed serving.
        """
        num_kernels = len(self.resblock_kernel_sizes)
        block_cls = ResBlock1 if self.resblock == "1" else ResBlock2
        mask = x_mask
        x = Conv1d(
            self.upsample_initial_channel, 7, padding=3, dtype=self.dtype,
            name="conv_pre",
        )(x.astype(self.dtype))
        if g is not None:
            x = x + Conv1d(
                self.upsample_initial_channel, 1, dtype=self.dtype, name="cond"
            )(g)
        if mask is not None:
            x = x * mask
        for i, (u, k) in enumerate(
            zip(self.upsample_rates, self.upsample_kernel_sizes)
        ):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(
                ch,
                k,
                stride=u,
                padding=(k - u) // 2,
                weight_norm=True,
                kernel_init=_normal_init(0.01),
                dtype=self.dtype,
                name=f"ups_{i}",
            )(x)
            if mask is not None:
                mask = jnp.repeat(mask, u, axis=1)
                x = x * mask
            xs = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                block = block_cls(
                    ch, rk, tuple(rd), dtype=self.dtype,
                    name=f"resblocks_{i * num_kernels + j}",
                )(x, mask)
                xs = block if xs is None else xs + block
            x = xs / num_kernels
        x = nn.leaky_relu(x)  # default slope 0.01 (torch F.leaky_relu default)
        x = Conv1d(
            1, 7, padding=3, use_bias=False, dtype=self.dtype, name="conv_post"
        )(x)
        x = jnp.tanh(x)
        if mask is not None:
            x = x * mask
        return x


class SynthesizerTrn(nn.Module):
    """End-to-end VITS synthesizer (reference ``models.py:390-533``).

    Methods: ``__call__`` (training graph), ``infer`` (TTS), and
    ``voice_conversion``.  Use ``apply(..., method=...)`` for the latter two.
    """

    n_vocab: int
    spec_channels: int
    segment_size: int  # in frames
    inter_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    resblock: str
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    n_speakers: int = 0
    gin_channels: int = 0
    use_sdp: bool = True
    dtype: Dtype = jnp.float32

    @classmethod
    def from_hparams(cls, hps, **overrides) -> "SynthesizerTrn":
        kw = dict(
            n_vocab=len(hps.symbols),
            spec_channels=hps.data.filter_length // 2 + 1,
            segment_size=hps.train.segment_size // hps.data.hop_length,
            inter_channels=hps.model.inter_channels,
            hidden_channels=hps.model.hidden_channels,
            filter_channels=hps.model.filter_channels,
            n_heads=hps.model.n_heads,
            n_layers=hps.model.n_layers,
            kernel_size=hps.model.kernel_size,
            p_dropout=hps.model.p_dropout,
            resblock=hps.model.resblock,
            resblock_kernel_sizes=tuple(hps.model.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in hps.model.resblock_dilation_sizes
            ),
            upsample_rates=tuple(hps.model.upsample_rates),
            upsample_initial_channel=hps.model.upsample_initial_channel,
            upsample_kernel_sizes=tuple(hps.model.upsample_kernel_sizes),
            n_speakers=hps.data.n_speakers,
            gin_channels=hps.model.gin_channels,
        )
        kw.update(overrides)
        return cls(**kw)

    def setup(self):
        self.enc_p = TextEncoder(
            self.n_vocab,
            self.inter_channels,
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            dtype=self.dtype,
        )
        self.dec = Generator(
            self.inter_channels,
            self.resblock,
            self.resblock_kernel_sizes,
            self.resblock_dilation_sizes,
            self.upsample_rates,
            self.upsample_initial_channel,
            self.upsample_kernel_sizes,
            gin_channels=self.gin_channels,
            dtype=self.dtype,
        )
        self.enc_q = PosteriorEncoder(
            self.spec_channels,
            self.inter_channels,
            self.hidden_channels,
            5,
            1,
            16,
            gin_channels=self.gin_channels,
            dtype=self.dtype,
        )
        self.flow = ResidualCouplingBlock(
            self.inter_channels,
            self.hidden_channels,
            5,
            1,
            4,
            gin_channels=self.gin_channels,
            dtype=self.dtype,
        )
        if self.use_sdp:
            self.dp = StochasticDurationPredictor(
                self.hidden_channels, 192, 3, 0.5, 4,
                gin_channels=self.gin_channels, dtype=self.dtype,
            )
        else:
            self.dp = DurationPredictor(
                self.hidden_channels, 256, 3, 0.5,
                gin_channels=self.gin_channels, dtype=self.dtype,
            )
        if self.n_speakers >= 1:
            self.emb_g = nn.Embed(
                self.n_speakers,
                self.gin_channels,
                embedding_init=nn.initializers.normal(1.0),
                name="emb_g",
            )

    def _speaker(self, sid: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
        if self.n_speakers > 0 and sid is not None:
            return self.emb_g(sid)[:, None, :].astype(self.dtype)  # [B, 1, gin]
        return None

    # ------------------------------------------------------------------
    # training graph (reference models.py:459-497)
    # ------------------------------------------------------------------
    def __call__(
        self,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        y: jnp.ndarray,
        y_lengths: jnp.ndarray,
        sid: Optional[jnp.ndarray] = None,
        deterministic: bool = False,
        slice_ids: Optional[jnp.ndarray] = None,
        posterior_noise: Optional[jnp.ndarray] = None,
        dp_noise: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Training forward.  ``posterior_noise`` ([B, Ts, C]) and ``dp_noise``
        ([B, Tt, 2]) override the ``'noise'`` RNG stream — used by the
        cross-framework training-graph parity suite, which must feed both
        frameworks bit-identical samples (reference models.py:240, 67)."""
        h_text, m_p, logs_p, x_mask = self.enc_p(
            x, x_lengths, deterministic=deterministic
        )
        g = self._speaker(sid)

        z, m_q, logs_q, y_mask = self.enc_q(
            y, y_lengths, g=g, noise=posterior_noise,
            deterministic=deterministic,
        )
        z_p = self.flow(z, y_mask, g=g)

        # ---- MAS scores (stop-gradient region, models.py:470-480) --------
        m_p32 = jax.lax.stop_gradient(m_p.astype(jnp.float32))
        logs_p32 = jax.lax.stop_gradient(logs_p.astype(jnp.float32))
        z_p32 = jax.lax.stop_gradient(z_p.astype(jnp.float32))
        s_p_sq_r = jnp.exp(-2.0 * logs_p32)  # [B, Tt, D]
        neg_cent1 = jnp.sum(
            -0.5 * _LOG_2PI - logs_p32, axis=-1
        )  # [B, Tt]
        neg_cent2 = jnp.einsum(
            "bsd,btd->bst", -0.5 * z_p32 ** 2, s_p_sq_r,
            preferred_element_type=jnp.float32,
        )
        neg_cent3 = jnp.einsum(
            "bsd,btd->bst", z_p32, m_p32 * s_p_sq_r,
            preferred_element_type=jnp.float32,
        )
        neg_cent4 = jnp.sum(-0.5 * m_p32 ** 2 * s_p_sq_r, axis=-1)  # [B, Tt]
        neg_cent = (
            neg_cent1[:, None, :] + neg_cent2 + neg_cent3 + neg_cent4[:, None, :]
        )  # [B, Ts, Tt]
        attn = maximum_path(neg_cent, x_lengths, y_lengths)  # [B, Ts, Tt]

        w = jnp.sum(attn, axis=1, keepdims=False)[..., None]  # [B, Tt, 1]
        if self.use_sdp:
            l_length = self.dp(
                h_text, x_mask, w=w, g=g, noise=dp_noise,
                deterministic=deterministic,
            )
            l_length = l_length / jnp.sum(x_mask)
        else:
            logw_ = jnp.log(w + 1e-6) * x_mask
            logw = self.dp(h_text, x_mask, g=g, deterministic=deterministic)
            l_length = jnp.sum((logw - logw_) ** 2, axis=(1, 2)) / jnp.sum(x_mask)

        # expand prior over frames (models.py:492-493)
        m_p_exp = jnp.einsum(
            "bst,btd->bsd", attn.astype(m_p.dtype), m_p,
            preferred_element_type=jnp.float32,
        )
        logs_p_exp = jnp.einsum(
            "bst,btd->bsd", attn.astype(logs_p.dtype), logs_p,
            preferred_element_type=jnp.float32,
        )

        if slice_ids is None:
            z_slice, slice_ids = rand_slice_segments(
                z, y_lengths, self.segment_size, self.make_rng("slice")
            )
        else:
            from personalized_text_to_speech_tpu.ops.masking import (
                slice_segments,
            )

            z_slice = slice_segments(z, slice_ids, self.segment_size)
        o = self.dec(z_slice, g=g)  # [B, seg*hop, 1]

        return {
            "wav_hat": o[..., 0],
            "l_length": l_length,
            "attn": attn,
            "x_mask": x_mask,
            "y_mask": y_mask,
            "z": z,
            "z_p": z_p,
            "m_p": m_p_exp,
            "logs_p": logs_p_exp,
            "m_q": m_q,
            "logs_q": logs_q,
        }

    # ------------------------------------------------------------------
    # inference graph (reference models.py:499-523)
    # ------------------------------------------------------------------
    def infer(
        self,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        sid: Optional[jnp.ndarray] = None,
        noise_scale: float = 0.667,
        length_scale: float = 1.0,
        noise_scale_w: float = 0.8,
        max_len: int = 1000,
        dp_noise: Optional[jnp.ndarray] = None,
        prior_noise: Optional[jnp.ndarray] = None,
    ):
        """Text IDs → waveform canvas.

        Returns ``(wav [B, max_len·hop], y_lengths [B] frames, attn, y_mask)``;
        samples beyond ``y_lengths·hop`` are masked to zero.
        """
        h_text, m_p, logs_p, x_mask = self.enc_p(x, x_lengths)
        g = self._speaker(sid)

        if self.use_sdp:
            logw = self.dp(
                h_text, x_mask, g=g, reverse=True,
                noise_scale=noise_scale_w, noise=dp_noise,
            )
        else:
            logw = self.dp(h_text, x_mask, g=g)
        w = jnp.exp(logw.astype(jnp.float32)) * x_mask * length_scale
        w_ceil = jnp.ceil(w)[..., 0]  # [B, Tt]
        y_lengths = jnp.clip(
            jnp.sum(w_ceil, axis=-1), 1, max_len
        ).astype(jnp.int32)
        y_mask = sequence_mask(y_lengths, max_len)[..., None]  # [B, S, 1]
        attn_mask = x_mask[:, None, :, 0] * y_mask  # [B, S, Tt]
        attn = generate_path(w_ceil, max_len, attn_mask)  # [B, S, Tt]

        m_p_exp = jnp.einsum(
            "bst,btd->bsd", attn.astype(m_p.dtype), m_p,
            preferred_element_type=jnp.float32,
        )
        logs_p_exp = jnp.einsum(
            "bst,btd->bsd", attn.astype(logs_p.dtype), logs_p,
            preferred_element_type=jnp.float32,
        )

        if prior_noise is None:
            prior_noise = jax.random.normal(
                self.make_rng("noise"), m_p_exp.shape, dtype=jnp.float32
            )
        z_p = (
            m_p_exp
            + prior_noise.astype(m_p_exp.dtype)
            * jnp.exp(logs_p_exp)
            * noise_scale
        )
        z = self.flow(z_p, y_mask, g=g, reverse=True)
        o = self.dec(z * y_mask, g=g, x_mask=y_mask)[..., 0]  # [B, S*hop]
        hop = o.shape[1] // max_len
        sample_mask = sequence_mask(y_lengths * hop, o.shape[1])
        return o * sample_mask, y_lengths, attn, y_mask

    # ------------------------------------------------------------------
    # two-stage inference for bucketed serving: the cheap text/duration
    # stage compiles per text bucket; the frame-count-dependent decode
    # stage compiles per (text bucket, frame bucket) and is only run at
    # the smallest frame bucket that fits the predicted length.
    # ------------------------------------------------------------------
    def infer_encode(
        self,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        sid: Optional[jnp.ndarray] = None,
        length_scale: float = 1.0,
        noise_scale_w: float = 0.8,
        dp_noise: Optional[jnp.ndarray] = None,
    ):
        """Text → (token durations, prior stats).  Output frame count is
        ``sum(w_ceil)`` — the caller picks a decode bucket from it."""
        h_text, m_p, logs_p, x_mask = self.enc_p(x, x_lengths)
        g = self._speaker(sid)
        if self.use_sdp:
            logw = self.dp(
                h_text, x_mask, g=g, reverse=True,
                noise_scale=noise_scale_w, noise=dp_noise,
            )
        else:
            logw = self.dp(h_text, x_mask, g=g)
        w = jnp.exp(logw.astype(jnp.float32)) * x_mask * length_scale
        w_ceil = jnp.ceil(w)[..., 0]  # [B, Tt]
        return w_ceil, m_p, logs_p, x_mask

    def infer_decode(
        self,
        w_ceil: jnp.ndarray,
        m_p: jnp.ndarray,
        logs_p: jnp.ndarray,
        x_mask: jnp.ndarray,
        sid: Optional[jnp.ndarray] = None,
        noise_scale: float = 0.667,
        max_len: int = 1000,
        prior_noise: Optional[jnp.ndarray] = None,
    ):
        """Durations + prior stats → waveform canvas of ``max_len`` frames."""
        z_p, y_mask, y_lengths = self.infer_expand(
            w_ceil, m_p, logs_p, x_mask,
            noise_scale=noise_scale, max_len=max_len, prior_noise=prior_noise,
        )
        o = self.decode_frames(z_p, y_mask, sid)
        hop = o.shape[1] // max_len
        sample_mask = sequence_mask(y_lengths * hop, o.shape[1])
        return o * sample_mask, y_lengths

    def infer_expand(
        self,
        w_ceil: jnp.ndarray,
        m_p: jnp.ndarray,
        logs_p: jnp.ndarray,
        x_mask: jnp.ndarray,
        noise_scale: float = 0.667,
        max_len: int = 1000,
        prior_noise: Optional[jnp.ndarray] = None,
    ):
        """Durations + prior stats → sampled latent canvas ``z_p`` (the
        per-frame part of ``infer_decode``, before the convolutional
        flow/vocoder).  Split out so serving can stream: ``z_p`` frames are
        independent, so chunks of it (with halo) can run through
        ``decode_frames`` incrementally."""
        y_lengths = jnp.clip(
            jnp.sum(w_ceil, axis=-1), 1, max_len
        ).astype(jnp.int32)
        y_mask = sequence_mask(y_lengths, max_len)[..., None]
        attn_mask = x_mask[:, None, :, 0] * y_mask
        attn = generate_path(w_ceil, max_len, attn_mask)
        m_p_exp = jnp.einsum(
            "bst,btd->bsd", attn.astype(m_p.dtype), m_p,
            preferred_element_type=jnp.float32,
        )
        logs_p_exp = jnp.einsum(
            "bst,btd->bsd", attn.astype(logs_p.dtype), logs_p,
            preferred_element_type=jnp.float32,
        )
        if prior_noise is None:
            prior_noise = jax.random.normal(
                self.make_rng("noise"), m_p_exp.shape, dtype=jnp.float32
            )
        z_p = (
            m_p_exp
            + prior_noise.astype(m_p_exp.dtype)
            * jnp.exp(logs_p_exp)
            * noise_scale
        )
        return z_p, y_mask, y_lengths

    def decode_frames(
        self,
        z_p: jnp.ndarray,
        y_mask: jnp.ndarray,
        sid: Optional[jnp.ndarray] = None,
    ):
        """Latent frames → waveform: reverse flow + HiFi-GAN (the
        convolutional tail of ``infer_decode``).  Chunk-safe: running a
        halo-padded slice of ``z_p``/``y_mask`` reproduces the monolithic
        output inside the halo (both nets are masked convs, so zero
        padding at slice edges matches canvas-edge behavior)."""
        g = self._speaker(sid)
        z = self.flow(z_p, y_mask, g=g, reverse=True)
        return self.dec(z * y_mask, g=g, x_mask=y_mask)[..., 0]

    # ------------------------------------------------------------------
    # voice conversion (reference models.py:525-533)
    # ------------------------------------------------------------------
    def voice_conversion(
        self,
        y: jnp.ndarray,
        y_lengths: jnp.ndarray,
        sid_src: jnp.ndarray,
        sid_tgt: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
    ):
        assert self.n_speakers > 0, "voice conversion needs speaker embeddings"
        g_src = self.emb_g(sid_src)[:, None, :].astype(self.dtype)
        g_tgt = self.emb_g(sid_tgt)[:, None, :].astype(self.dtype)
        z, m_q, logs_q, y_mask = self.enc_q(y, y_lengths, g=g_src, noise=noise)
        z_p = self.flow(z, y_mask, g=g_src)
        z_hat = self.flow(z_p, y_mask, g=g_tgt, reverse=True)
        o_hat = self.dec(z_hat * y_mask, g=g_tgt, x_mask=y_mask)[..., 0]
        return o_hat, y_mask, (z, z_p, z_hat)
