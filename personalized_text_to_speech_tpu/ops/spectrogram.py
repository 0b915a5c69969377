"""On-device STFT / mel spectrogram, expressed as MXU matmuls.

Replaces the reference's CPU path (reference ``mel_processing.py:51-112``:
``torch.stft`` with reflect pad ``(n_fft-hop)/2``, ``center=False``, periodic
Hann window, magnitude ``sqrt(re²+im²+1e-6)``, Slaney mel filterbank matmul,
log dynamic-range compression with clamp 1e-5).

TPU-first design: framing is a strided gather and the windowed DFT is folded
into a single ``[n_fft, 2·n_freq]`` constant matrix, so the whole spectrogram
is one batched matmul on the MXU followed by elementwise magnitude — no FFT
butterflies, no host round-trip, fully fusable under ``jit``.  For VITS-scale
shapes (n_fft 1024, 86 frames/s) the O(N²) DFT-as-matmul is far below the MXU
roofline and beats an FFT's scattered memory traffic on this hardware.

Numerical parity: fp32 matmuls with ``preferred_element_type=float32``; parity
vs ``torch.stft`` is asserted to ≤1e-3 max-abs-err in tests (the north-star
tolerance), typically ~1e-5.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Slaney-style mel filterbank (standalone equivalent of librosa.filters.mel
# with htk=False, norm='slaney', as used at reference mel_processing.py:78)
# --------------------------------------------------------------------------

_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = math.log(6.4) / 27.0


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    mel = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mel = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(f, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP,
        mel,
    )
    return mel


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f = m * _F_SP
    log_region = m >= _MIN_LOG_MEL
    f = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), f)
    return f


def mel_filterbank(
    sampling_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """Triangular Slaney-normalized mel filterbank, shape [n_mels, n_freq]."""
    if fmax is None:
        fmax = sampling_rate / 2.0
    n_freq = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sampling_rate / 2.0, n_freq)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# --------------------------------------------------------------------------
# Windowed-DFT constants
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int, win_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Hann-windowed DFT basis: returns (cos_mat, sin_mat) of [n_fft, n_freq].

    re[k] = Σ_n x[n]·w[n]·cos(2πnk/N), im[k] = -Σ_n x[n]·w[n]·sin(2πnk/N);
    only |X| is needed so the sign of im is irrelevant.
    """
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None].astype(np.float64)
    k = np.arange(n_freq)[None, :].astype(np.float64)
    # periodic Hann (torch.hann_window default), centered if win < n_fft
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length))
    window = np.zeros(n_fft)
    pad = (n_fft - win_length) // 2
    window[pad : pad + win_length] = win
    ang = 2.0 * np.pi * n * k / n_fft
    cos_mat = (window[:, None] * np.cos(ang)).astype(np.float32)
    sin_mat = (window[:, None] * np.sin(ang)).astype(np.float32)
    return cos_mat, sin_mat


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """Audio analysis settings (reference ``configs/finetune_speaker.json:24-30``)."""

    sampling_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    fmin: float = 0.0
    fmax: Optional[float] = None

    @property
    def n_freq(self) -> int:
        return self.n_fft // 2 + 1

    @classmethod
    def from_hparams(cls, hps) -> "MelConfig":
        return cls(
            sampling_rate=hps.data.sampling_rate,
            n_fft=hps.data.filter_length,
            hop_length=hps.data.hop_length,
            win_length=hps.data.win_length,
            n_mels=hps.data.n_mel_channels,
            fmin=hps.data.mel_fmin,
            fmax=hps.data.mel_fmax,
        )


def _frame(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[B, L] → [B, n_frames, n_fft] strided frames (post reflect-pad)."""
    length = y.shape[-1]
    n_frames = 1 + (length - n_fft) // hop
    starts = np.arange(n_frames) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return y[..., idx]


def _reflect_pad(y: jnp.ndarray, pad: int) -> jnp.ndarray:
    if pad == 0:
        return y
    cfg = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
    return jnp.pad(y, cfg, mode="reflect")


def linear_spectrogram(y: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Waveform [B, L] → linear magnitude spectrogram [B, n_frames, n_freq].

    Matches reference ``spectrogram_torch`` (``mel_processing.py:51-70``):
    reflect pad (n_fft−hop)/2 on both sides, center=False framing, Hann
    window, magnitude ``sqrt(|X|²+1e-6)``.  Note the TPU layout is
    frames-major [B, T, F] (the reference uses [B, F, T]).
    """
    cos_mat, sin_mat = _dft_matrices(cfg.n_fft, cfg.win_length)
    cos_mat = jnp.asarray(cos_mat)
    sin_mat = jnp.asarray(sin_mat)
    pad = (cfg.n_fft - cfg.hop_length) // 2
    y = _reflect_pad(y.astype(jnp.float32), pad)
    frames = _frame(y, cfg.n_fft, cfg.hop_length)
    re = jnp.einsum("btn,nk->btk", frames, cos_mat, preferred_element_type=jnp.float32)
    im = jnp.einsum("btn,nk->btk", frames, sin_mat, preferred_element_type=jnp.float32)
    return jnp.sqrt(re * re + im * im + 1e-6)


def dynamic_range_compression(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """log-clamp compression (reference ``mel_processing.py:19-25``)."""
    return jnp.log(jnp.maximum(x, clip_val))


def dynamic_range_decompression(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(x)


def spec_to_mel(spec: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Linear spectrogram [B, T, n_freq] → log-mel [B, T, n_mels]
    (reference ``spec_to_mel_torch``, ``mel_processing.py:73-82``)."""
    fb = jnp.asarray(
        _cached_filterbank(
            cfg.sampling_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax
        )
    )
    mel = jnp.einsum("btf,mf->btm", spec, fb, preferred_element_type=jnp.float32)
    return dynamic_range_compression(mel)


@functools.lru_cache(maxsize=8)
def _cached_filterbank(sr, n_fft, n_mels, fmin, fmax) -> np.ndarray:
    return mel_filterbank(sr, n_fft, n_mels, fmin, fmax)


def mel_spectrogram(y: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Waveform [B, L] → log-mel [B, n_frames, n_mels] in one fused graph
    (reference ``mel_spectrogram_torch``, ``mel_processing.py:85-112``)."""
    return spec_to_mel(linear_spectrogram(y, cfg), cfg)
