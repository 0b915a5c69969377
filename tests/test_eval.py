"""Evaluation-metric tests: identity pairs score perfectly, perturbed pairs
score worse, YIN recovers known pitch."""

import numpy as np
import pytest

from personalized_text_to_speech_tpu.eval import metrics


def synth_tone(f0=220.0, sr=22050, dur=0.8, harmonics=4):
    t = np.linspace(0, dur, int(sr * dur), endpoint=False)
    wav = sum(
        (0.5 ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t) for k in range(harmonics)
    )
    return (0.4 * wav / np.abs(wav).max()).astype(np.float32)


class TestYin:
    def test_recovers_pitch(self):
        sr = 22050
        wav = synth_tone(f0=220.0, sr=sr)
        f0, voiced = metrics.yin_f0(wav, sr)
        assert voiced.mean() > 0.8
        est = np.median(f0[voiced])
        assert abs(est - 220.0) < 5.0

    def test_unvoiced_noise(self):
        rng = np.random.default_rng(0)
        wav = rng.normal(size=11025).astype(np.float32) * 0.1
        f0, voiced = metrics.yin_f0(wav, 22050)
        assert voiced.mean() < 0.5


class TestPairMetrics:
    def test_identity_is_best(self):
        sr = 22050
        wav = synth_tone(f0=180.0, sr=sr)
        m_same = metrics.evaluate_pair(wav, wav, sr)
        assert m_same["MCD"] < 1e-6
        assert m_same["LSD"] < 1e-6
        assert m_same["mrstft_sc"] < 1e-6
        assert m_same["vde"] == 0.0
        assert m_same["f0_rmse"] < 1e-3

        noisy = wav + np.random.default_rng(1).normal(size=len(wav)).astype(
            np.float32
        ) * 0.05
        m_noisy = metrics.evaluate_pair(wav, noisy, sr)
        assert m_noisy["MCD"] > m_same["MCD"]
        assert m_noisy["LSD"] > m_same["LSD"]

    def test_pitch_shift_detected(self):
        sr = 22050
        a = synth_tone(f0=200.0, sr=sr)
        b = synth_tone(f0=240.0, sr=sr)
        m = metrics.F0_metrics(a, b, sr)
        assert m["f0_mae"] > 30.0

    def test_dtw_handles_length_mismatch(self):
        sr = 22050
        a = synth_tone(f0=200.0, sr=sr, dur=0.8)
        b = synth_tone(f0=200.0, sr=sr, dur=1.0)
        mcd = metrics.MCD(a, b, sr)
        assert np.isfinite(mcd)
        # same timbre stretched: DTW should keep MCD small
        assert mcd < metrics.MCD(a, synth_tone(f0=330.0, sr=sr, dur=0.8), sr)


class TestLowPitch:
    def test_recovers_low_f0(self):
        # near-fmin pitch: the windowed YIN difference function must still
        # find the dip (the naive full-energy form inflates d at large lags)
        sr = 22050
        wav = synth_tone(f0=60.0, sr=sr, dur=1.0)
        f0, voiced = metrics.yin_f0(wav, sr)
        assert voiced.mean() > 0.5
        est = np.median(f0[voiced])
        assert abs(est - 60.0) < 4.0
