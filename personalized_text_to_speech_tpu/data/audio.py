"""Waveform IO and resampling without librosa/torchaudio.

The reference reads audio with torchaudio and writes with scipy (reference
``data_utils.py:78``, ``cmd_inference.py:117``); this environment only
guarantees scipy, so both directions go through ``scipy.io.wavfile`` with
normalization matching ``torchaudio.load(normalize=True)`` (integer PCM →
float32 in [-1, 1]).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a wav file → (float32 mono-or-multichannel [C, L] array, sr)."""
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 1:
        data = data[None, :]
    else:
        data = data.T  # [L, C] → [C, L]
    return data, sr


def save_wav(path: str, wav: np.ndarray, sampling_rate: int) -> None:
    """Write float waveform in [-1, 1] as 16-bit PCM."""
    wav = np.asarray(wav, dtype=np.float32)
    if wav.ndim > 1:
        wav = wav.squeeze()
    pcm = np.clip(wav, -1.0, 1.0)
    wavfile.write(path, sampling_rate, (pcm * 32767.0).astype(np.int16))


def to_mono(wav: np.ndarray) -> np.ndarray:
    """[C, L] → [L] by channel averaging."""
    if wav.ndim == 2:
        return wav.mean(axis=0)
    return wav


def resample(wav: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (scipy), matching torchaudio.functional.resample
    semantics closely enough for dataset preparation."""
    if orig_sr == target_sr:
        return wav
    from math import gcd

    g = gcd(orig_sr, target_sr)
    return resample_poly(wav, target_sr // g, orig_sr // g, axis=-1).astype(
        np.float32
    )


def load_wav_mono(path: str, target_sr: int) -> np.ndarray:
    """Read → mono → resample to target_sr → float32 [L]."""
    wav, sr = load_wav(path)
    wav = to_mono(wav)
    return resample(wav, sr, target_sr)
