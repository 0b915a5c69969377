"""Objective speech metrics: MCD, LSD, F0 stats, multi-resolution STFT.

Counterpart of the reference evaluation harness (reference
``eval_pair.py:36-124``) without the librosa dependency: STFT/mel/MFCC, DTW
alignment, and YIN pitch tracking are all implemented here on numpy/scipy.

Definitions match the reference:
* MCD: 13 MFCCs (c0 excluded), DTW-aligned, ``10/ln10·√2 · mean‖Δc‖``,
* LSD: mean over frames of RMS log10-magnitude difference,
* F0: RMSE/MAE/corr over frames voiced in both + voicing-decision error
  (the reference uses pYIN; this uses YIN with a CMNDF threshold, same
  frame/hop/fmin/fmax defaults),
* MRSTFT: spectral convergence + log-magnitude L1 at (1024/2048/512) FFTs.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import numpy as np
from scipy.fft import dct, rfft

from personalized_text_to_speech_tpu.ops.spectrogram import mel_filterbank


# --------------------------------------------------------------------------
# DSP primitives
# --------------------------------------------------------------------------

def stft_mag(
    y: np.ndarray, n_fft: int = 2048, hop: int = 512, win_length: int = None
) -> np.ndarray:
    """Centered magnitude STFT [n_freq, T] (librosa-default conventions:
    reflect pad n_fft//2, periodic Hann)."""
    win_length = win_length or n_fft
    window = np.hanning(win_length + 1)[:-1].astype(np.float64)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    y = np.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = y[idx] * window[None, :]
    return np.abs(rfft(frames, axis=-1)).T.astype(np.float64)  # [F, T]


def mfcc_features(
    y: np.ndarray, sr: int, n_mfcc: int = 13, n_fft: int = 1024,
    hop: int = 256, n_mels: int = 40,
) -> np.ndarray:
    """[n_mfcc, T] MFCCs (power mel → dB → DCT-II ortho), reference
    ``eval_pair.py:36-40`` semantics."""
    S = stft_mag(y, n_fft, hop) ** 2
    fb = mel_filterbank(sr, n_fft, n_mels).astype(np.float64)
    mel = fb @ S
    db = 10.0 * np.log10(np.maximum(mel, 1e-10))
    db = np.maximum(db, db.max() - 80.0)  # librosa power_to_db top_db=80
    return dct(db, type=2, axis=0, norm="ortho")[:n_mfcc]


def dtw_align(A: np.ndarray, B: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Euclidean DTW over time; returns warped (A', B') with equal length."""
    # cost matrix via (a-b)^2 = a² + b² - 2ab
    a2 = np.sum(A ** 2, axis=0)[:, None]
    b2 = np.sum(B ** 2, axis=0)[None, :]
    C = np.sqrt(np.maximum(a2 + b2 - 2.0 * (A.T @ B), 0.0))
    n, m = C.shape
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        row_prev = D[i - 1]
        row = D[i]
        ci = C[i - 1]
        for j in range(1, m + 1):
            row[j] = ci[j - 1] + min(row_prev[j], row[j - 1], row_prev[j - 1])
    # backtrack
    i, j = n, m
    path = []
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        moves = [(D[i - 1, j - 1], i - 1, j - 1), (D[i - 1, j], i - 1, j),
                 (D[i, j - 1], i, j - 1)]
        _, i, j = min(moves)
    path.reverse()
    pa = np.array([p[0] for p in path])
    pb = np.array([p[1] for p in path])
    return A[:, pa], B[:, pb]


def _center_trim(A: np.ndarray, B: np.ndarray):
    T = min(A.shape[1], B.shape[1])
    return A[:, :T], B[:, :T]


# --------------------------------------------------------------------------
# YIN pitch tracking
# --------------------------------------------------------------------------

def yin_f0(
    y: np.ndarray,
    sr: int,
    frame: int = 1024,
    hop: int = 256,
    fmin: float = 50.0,
    fmax: float = 600.0,
    threshold: float = 0.15,
) -> Tuple[np.ndarray, np.ndarray]:
    """Frame-wise YIN (de Cheveigné & Kawahara 2002): cumulative-mean
    normalized difference + absolute threshold + parabolic interpolation.
    Returns (f0 [T], voiced mask [T])."""
    tau_min = max(2, int(sr / fmax))
    tau_max = min(frame - 1, int(sr / fmin))
    n_frames = max(1 + (len(y) - frame) // hop, 0)
    f0 = np.zeros(n_frames, dtype=np.float32)
    voiced = np.zeros(n_frames, dtype=bool)
    for t in range(n_frames):
        x = y[t * hop : t * hop + frame].astype(np.float64)
        # difference function via autocorrelation (O(N log N)):
        # d(τ) = Σ_{j<W-τ} x_j² + Σ_{j≥τ} x_j² − 2·ac(τ)
        w = len(x)
        spec = np.fft.rfft(x, 2 * w)
        ac = np.fft.irfft(spec * np.conj(spec))[:w]
        cumsum = np.cumsum(x * x)
        energy = cumsum[-1]
        d = np.empty(tau_max + 1)
        d[0] = 0.0
        taus = np.arange(1, tau_max + 1)
        term_head = cumsum[w - taus - 1]  # Σ_{j=0}^{W-τ-1} x_j²
        term_tail = energy - cumsum[taus - 1]  # Σ_{j=τ}^{W-1} x_j²
        d[1:] = term_head + term_tail - 2.0 * ac[taus]
        # CMNDF
        cmndf = np.ones_like(d)
        running = np.cumsum(d[1:])
        cmndf[1:] = d[1:] * np.arange(1, tau_max + 1) / np.maximum(running, 1e-12)
        # first dip under threshold within [tau_min, tau_max]
        tau = -1
        for k in range(tau_min, tau_max):
            if cmndf[k] < threshold:
                while k + 1 <= tau_max and cmndf[k + 1] < cmndf[k]:
                    k += 1
                tau = k
                break
        if tau == -1:
            continue
        # parabolic interpolation around the dip
        if 1 <= tau < tau_max:
            a, b, c = d[tau - 1], d[tau], d[tau + 1]
            denom = a - 2 * b + c
            shift = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
            tau_refined = tau + np.clip(shift, -1, 1)
        else:
            tau_refined = tau
        f0[t] = sr / tau_refined
        voiced[t] = True
    return f0, voiced


# --------------------------------------------------------------------------
# Metrics (reference eval_pair.py:42-98)
# --------------------------------------------------------------------------

def MCD(
    ref: np.ndarray, syn: np.ndarray, sr: int, n_mfcc: int = 13,
    exclude_c0: bool = True, use_dtw: bool = True,
) -> float:
    A = mfcc_features(ref, sr, n_mfcc=n_mfcc)
    B = mfcc_features(syn, sr, n_mfcc=n_mfcc)
    if exclude_c0:
        A, B = A[1:], B[1:]
    Aw, Bw = dtw_align(A, B) if use_dtw else _center_trim(A, B)
    const = 10.0 / math.log(10.0) * math.sqrt(2.0)
    return float(const * np.mean(np.linalg.norm(Aw - Bw, axis=0)))


def LSD(
    ref: np.ndarray, syn: np.ndarray, sr: int, n_fft: int = 2048,
    hop: int = 512, use_dtw: bool = True,
) -> float:
    A = np.log10(np.maximum(stft_mag(ref, n_fft, hop), 1e-10))
    B = np.log10(np.maximum(stft_mag(syn, n_fft, hop), 1e-10))
    Aw, Bw = dtw_align(A, B) if use_dtw else _center_trim(A, B)
    return float(np.mean(np.sqrt(np.mean((Aw - Bw) ** 2, axis=0))))


def F0_metrics(
    ref: np.ndarray, syn: np.ndarray, sr: int, frame: int = 1024,
    hop: int = 256, fmin: float = 50.0, fmax: float = 600.0,
) -> Dict[str, float]:
    f0_r, v_r = yin_f0(ref, sr, frame, hop, fmin, fmax)
    f0_s, v_s = yin_f0(syn, sr, frame, hop, fmin, fmax)
    T = min(len(f0_r), len(f0_s))
    f0_r, f0_s, v_r, v_s = f0_r[:T], f0_s[:T], v_r[:T], v_s[:T]
    vde = float(np.mean(v_r != v_s)) if T else float("nan")
    both = v_r & v_s
    if np.any(both):
        d = f0_r[both] - f0_s[both]
        rmse = float(np.sqrt(np.mean(d ** 2)))
        mae = float(np.mean(np.abs(d)))
        corr = (
            float(np.corrcoef(f0_r[both], f0_s[both])[0, 1])
            if np.sum(both) >= 2
            else float("nan")
        )
    else:
        rmse = mae = corr = float("nan")
    return {"f0_rmse": rmse, "f0_mae": mae, "f0_corr": corr, "vde": vde}


def MRSTFT(
    ref: np.ndarray, syn: np.ndarray, sr: int,
    fft_sizes=(1024, 2048, 512), hops=(256, 512, 128), wins=(1024, 2048, 512),
) -> Dict[str, float]:
    eps = 1e-7
    sc_list, lmag_list = [], []
    for n_fft, hop, win in zip(fft_sizes, hops, wins):
        A = stft_mag(ref, n_fft, hop, win)
        B = stft_mag(syn, n_fft, hop, win)
        A, B = _center_trim(A, B)
        sc = np.linalg.norm(A - B, "fro") / (np.linalg.norm(A, "fro") + eps)
        lmag = np.mean(
            np.abs(np.log(np.maximum(A, 1e-10)) - np.log(np.maximum(B, 1e-10)))
        )
        sc_list.append(sc)
        lmag_list.append(lmag)
    return {
        "mrstft_sc": float(np.mean(sc_list)),
        "mrstft_logmag": float(np.mean(lmag_list)),
    }


def evaluate_pair(
    ref: np.ndarray, syn: np.ndarray, sr: int, use_dtw: bool = True
) -> Dict[str, float]:
    """All metrics for one (reference, synthesized) waveform pair."""
    return {
        "MCD": MCD(ref, syn, sr, use_dtw=use_dtw),
        "LSD": LSD(ref, syn, sr, use_dtw=use_dtw),
        **F0_metrics(ref, syn, sr),
        **MRSTFT(ref, syn, sr),
    }
