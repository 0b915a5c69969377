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


class TestPyin:
    def test_recovers_pitch(self):
        sr = 22050
        wav = synth_tone(f0=220.0, sr=sr)
        f0, voiced, vprob = metrics.pyin_f0(wav, sr)
        assert voiced.mean() > 0.8
        est = np.median(f0[voiced])
        assert abs(est - 220.0) < 5.0

    def test_unvoiced_noise(self):
        rng = np.random.default_rng(0)
        wav = rng.normal(size=11025).astype(np.float32) * 0.1
        f0, voiced, vprob = metrics.pyin_f0(wav, 22050)
        assert voiced.mean() < 0.5
        assert vprob.mean() < 0.6

    def test_stable_voicing_where_yin_flips(self):
        """A tone buried in noise: plain YIN's hard threshold flips the
        voicing decision frame to frame; pYIN's Viterbi voicing path must
        be markedly smoother (this is WHY the reference uses pYIN)."""
        sr = 22050
        rng = np.random.default_rng(7)
        t = np.linspace(0, 1.2, int(sr * 1.2), endpoint=False)
        wav = (
            0.12 * np.sin(2 * np.pi * 170.0 * t)
            + 0.26 * rng.normal(size=t.size)
        ).astype(np.float32)

        def flips(mask):
            return int(np.sum(mask[1:] != mask[:-1]))

        _, v_yin = metrics.yin_f0(wav, sr)
        _, v_pyin, _ = metrics.pyin_f0(wav, sr)
        assert flips(v_pyin) <= max(flips(v_yin) // 2, 2)

    def test_tracks_glide(self):
        """A slow pitch glide: the banded HMM transitions must follow it
        (no sticking to one bin) without octave jumps."""
        sr = 22050
        t = np.linspace(0, 1.0, sr, endpoint=False)
        inst = 150.0 * (2.0 ** t)  # one octave up over a second
        phase = 2 * np.pi * np.cumsum(inst) / sr
        wav = (0.4 * np.sin(phase)).astype(np.float32)
        f0, voiced, _ = metrics.pyin_f0(wav, sr)
        assert voiced.mean() > 0.8
        fs = f0[voiced]
        # monotone-ish rise across the utterance, no octave error at ends
        assert 130.0 < np.median(fs[: len(fs) // 4]) < 185.0
        assert 240.0 < np.median(fs[-len(fs) // 4 :]) < 330.0

    def test_f0_metrics_default_pyin(self):
        sr = 22050
        a = synth_tone(200.0, sr=sr)
        b = synth_tone(210.0, sr=sr)
        m = metrics.F0_metrics(a, b, sr)
        assert 5.0 < m["f0_rmse"] < 30.0
        assert m["vde"] < 0.2


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
