"""Tests for ops: spectrogram parity vs torch.stft, spline invertibility,
MAS kernel vs numpy oracle, masking utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from personalized_text_to_speech_tpu.ops import (
    MelConfig,
    generate_path,
    linear_spectrogram,
    maximum_path,
    mel_spectrogram,
    rand_slice_segments,
    sequence_mask,
    slice_segments,
    spec_to_mel,
)
from personalized_text_to_speech_tpu.ops.mas import maximum_path_numpy
from personalized_text_to_speech_tpu.ops.spectrogram import mel_filterbank
from personalized_text_to_speech_tpu.ops.spline import (
    piecewise_rational_quadratic_transform,
)


class TestSpectrogram:
    def _torch_spec(self, y_np, cfg):
        """Oracle: the exact torch.stft recipe of the reference
        (mel_processing.py:51-70)."""
        import torch

        y = torch.from_numpy(y_np)
        pad = (cfg.n_fft - cfg.hop_length) // 2
        y = torch.nn.functional.pad(
            y.unsqueeze(1), (pad, pad), mode="reflect"
        ).squeeze(1)
        window = torch.hann_window(cfg.win_length)
        spec = torch.stft(
            y,
            cfg.n_fft,
            hop_length=cfg.hop_length,
            win_length=cfg.win_length,
            window=window,
            center=False,
            pad_mode="reflect",
            normalized=False,
            onesided=True,
            return_complex=True,
        )
        spec = torch.sqrt(spec.abs() ** 2 + 1e-6)
        return spec.numpy()  # [B, F, T]

    def test_parity_with_torch_stft(self):
        cfg = MelConfig()
        rng = np.random.default_rng(0)
        y = rng.uniform(-1, 1, size=(2, 22050)).astype(np.float32)
        ours = np.asarray(linear_spectrogram(jnp.asarray(y), cfg))  # [B,T,F]
        ref = self._torch_spec(y, cfg).transpose(0, 2, 1)  # → [B,T,F]
        assert ours.shape == ref.shape
        err = np.abs(ours - ref).max()
        assert err <= 1e-3, f"max abs err {err}"  # north-star tolerance
        assert err <= 1e-4  # typically much tighter

    def test_frame_count(self):
        cfg = MelConfig()
        y = jnp.zeros((1, 256 * 50))
        spec = linear_spectrogram(y, cfg)
        assert spec.shape == (1, 50, 513)

    def test_mel_filterbank_matches_slaney(self):
        from transformers.audio_utils import mel_filter_bank

        ours = mel_filterbank(22050, 1024, 80, 0.0, None)
        ref = mel_filter_bank(
            num_frequency_bins=513,
            num_mel_filters=80,
            min_frequency=0.0,
            max_frequency=11025.0,
            sampling_rate=22050,
            norm="slaney",
            mel_scale="slaney",
        ).T  # [n_mels, n_freq]
        assert np.abs(ours - ref).max() < 1e-6

    def test_mel_spectrogram_end_to_end(self):
        cfg = MelConfig()
        rng = np.random.default_rng(1)
        y = rng.uniform(-0.5, 0.5, size=(1, 8192)).astype(np.float32)
        mel = mel_spectrogram(jnp.asarray(y), cfg)
        assert mel.shape == (1, 32, 80)
        assert np.isfinite(np.asarray(mel)).all()
        # log compression floor
        assert np.asarray(mel).min() >= np.log(1e-5) - 1e-6

    def test_spec_to_mel_consistency(self):
        cfg = MelConfig()
        rng = np.random.default_rng(2)
        y = rng.uniform(-0.5, 0.5, size=(1, 8192)).astype(np.float32)
        a = mel_spectrogram(jnp.asarray(y), cfg)
        b = spec_to_mel(linear_spectrogram(jnp.asarray(y), cfg), cfg)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-6


class TestSpline:
    def _random_params(self, key, shape, num_bins=10):
        k1, k2, k3 = jax.random.split(key, 3)
        return (
            jax.random.normal(k1, (*shape, num_bins)) * 0.5,
            jax.random.normal(k2, (*shape, num_bins)) * 0.5,
            jax.random.normal(k3, (*shape, num_bins - 1)) * 0.5,
        )

    def test_invertibility(self):
        key = jax.random.PRNGKey(0)
        shape = (4, 17)
        w, h, d = self._random_params(key, shape)
        x = jax.random.uniform(jax.random.PRNGKey(1), shape, minval=-8, maxval=8)
        y, logdet = piecewise_rational_quadratic_transform(
            x, w, h, d, inverse=False, tails="linear", tail_bound=5.0
        )
        x_rec, logdet_inv = piecewise_rational_quadratic_transform(
            y, w, h, d, inverse=True, tails="linear", tail_bound=5.0
        )
        assert np.abs(np.asarray(x_rec - x)).max() < 1e-4
        assert np.abs(np.asarray(logdet + logdet_inv)).max() < 1e-4

    def test_logdet_matches_autodiff(self):
        key = jax.random.PRNGKey(2)
        w, h, d = self._random_params(key, ())
        xs = jnp.linspace(-4.5, 4.5, 5)

        def f(x):
            y, _ = piecewise_rational_quadratic_transform(
                x, w, h, d, tails="linear", tail_bound=5.0
            )
            return y

        for x in xs:
            _, logdet = piecewise_rational_quadratic_transform(
                x, w, h, d, tails="linear", tail_bound=5.0
            )
            grad = jax.grad(f)(x)
            assert np.abs(np.log(np.abs(grad)) - logdet) < 1e-3

    def test_identity_outside_tails(self):
        key = jax.random.PRNGKey(3)
        w, h, d = self._random_params(key, (3,))
        x = jnp.array([-7.0, 6.0, 100.0])
        y, logdet = piecewise_rational_quadratic_transform(
            x, w, h, d, tails="linear", tail_bound=5.0
        )
        assert np.abs(np.asarray(y - x)).max() == 0.0
        assert np.abs(np.asarray(logdet)).max() == 0.0

    def test_monotonicity(self):
        key = jax.random.PRNGKey(4)
        w, h, d = self._random_params(key, ())
        xs = jnp.linspace(-4.9, 4.9, 101)
        ys, _ = piecewise_rational_quadratic_transform(
            xs,
            jnp.broadcast_to(w, (101, 10)),
            jnp.broadcast_to(h, (101, 10)),
            jnp.broadcast_to(d, (101, 9)),
            tails="linear",
            tail_bound=5.0,
        )
        assert bool(jnp.all(jnp.diff(ys) > 0))


class TestMAS:
    def _random_case(self, seed, b=3, t_y=37, t_x=11):
        rng = np.random.default_rng(seed)
        neg = rng.normal(size=(b, t_y, t_x)).astype(np.float32)
        spec_lens = rng.integers(t_x, t_y + 1, size=b).astype(np.int32)
        text_lens = np.minimum(
            rng.integers(2, t_x + 1, size=b), spec_lens
        ).astype(np.int32)
        spec_lens[0], text_lens[0] = t_y, t_x  # one full-size case
        return neg, text_lens, spec_lens

    def test_matches_numpy_oracle(self):
        for seed in range(5):
            neg, text_lens, spec_lens = self._random_case(seed)
            want = maximum_path_numpy(neg, text_lens, spec_lens)
            got = np.asarray(
                maximum_path(jnp.asarray(neg), text_lens, spec_lens)
            )
            np.testing.assert_array_equal(got, want)

    def test_chunked_matches_numpy_oracle(self):
        from personalized_text_to_speech_tpu.ops.mas import (
            _maximum_path_scan_chunked,
        )

        # geometries around / past the chunk boundary, incl. t_y not a
        # multiple of the chunk and a degenerate 1-frame case
        for seed, t_y, t_x, chunk in [
            (0, 37, 11, 16),
            (1, 129, 24, 16),
            (2, 160, 40, 16),
            (3, 64, 8, 8),
            (4, 17, 5, 4),
        ]:
            neg, text_lens, spec_lens = self._random_case(
                seed, t_y=t_y, t_x=t_x
            )
            want = maximum_path_numpy(neg, text_lens, spec_lens)
            got = np.asarray(
                _maximum_path_scan_chunked(
                    jnp.asarray(neg), text_lens, spec_lens, chunk=chunk
                )
            )
            np.testing.assert_array_equal(got, want, err_msg=f"seed={seed}")

    def test_chunked_single_frame(self):
        from personalized_text_to_speech_tpu.ops.mas import (
            _maximum_path_scan_chunked,
        )

        neg = np.random.default_rng(0).normal(size=(2, 1, 1)).astype(np.float32)
        lens = np.ones(2, np.int32)
        got = np.asarray(
            _maximum_path_scan_chunked(jnp.asarray(neg), lens, lens, chunk=8)
        )
        np.testing.assert_array_equal(got, np.ones_like(neg))

    def test_path_properties(self):
        neg, text_lens, spec_lens = self._random_case(7, b=4, t_y=50, t_x=20)
        path = np.asarray(maximum_path(jnp.asarray(neg), text_lens, spec_lens))
        for i in range(4):
            p = path[i, : spec_lens[i], : text_lens[i]]
            # each frame aligned to exactly one token
            np.testing.assert_array_equal(p.sum(-1), 1)
            # durations positive, monotone non-decreasing token index
            tok = p.argmax(-1)
            assert (np.diff(tok) >= 0).all() and (np.diff(tok) <= 1).all()
            assert tok[0] == 0 and tok[-1] == text_lens[i] - 1
            # padding is zero
            assert path[i, spec_lens[i]:, :].sum() == 0
            assert path[i, :, text_lens[i]:].sum() == 0

    def test_lengths_from_mask(self):
        neg, text_lens, spec_lens = self._random_case(3)
        t_y, t_x = neg.shape[1:]
        mask = (
            sequence_mask(jnp.asarray(spec_lens), t_y)[:, :, None]
            * sequence_mask(jnp.asarray(text_lens), t_x)[:, None, :]
        )
        got = np.asarray(
            maximum_path(jnp.asarray(neg), None, None, attn_mask=mask)
        )
        want = maximum_path_numpy(neg, text_lens, spec_lens)
        np.testing.assert_array_equal(got, want)


class TestMasking:
    def test_sequence_mask(self):
        m = np.asarray(sequence_mask(jnp.array([1, 3]), 4))
        np.testing.assert_array_equal(
            m, [[1, 0, 0, 0], [1, 1, 1, 0]]
        )

    def test_generate_path(self):
        dur = jnp.array([[2, 1, 3]], dtype=jnp.float32)
        path = np.asarray(generate_path(dur, 6))
        want = np.array(
            [[[1, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1], [0, 0, 1]]],
            dtype=np.float32,
        )
        np.testing.assert_array_equal(path, want)

    def test_generate_path_matches_mas_durations(self):
        # MAS path summed over frames gives durations; generate_path must
        # reconstruct the same path (inference route, commons.py:131-146)
        rng = np.random.default_rng(0)
        neg = rng.normal(size=(2, 30, 8)).astype(np.float32)
        text_lens = np.array([8, 5], dtype=np.int32)
        spec_lens = np.array([30, 21], dtype=np.int32)
        path = np.asarray(maximum_path(jnp.asarray(neg), text_lens, spec_lens))
        dur = path.sum(axis=1)  # [B, T_x]
        rebuilt = np.asarray(generate_path(jnp.asarray(dur), 30))
        rebuilt = rebuilt * (
            np.asarray(sequence_mask(jnp.asarray(spec_lens), 30))[:, :, None]
        )
        np.testing.assert_array_equal(rebuilt, path)

    def test_slice_segments(self):
        x = jnp.arange(24, dtype=jnp.float32).reshape(2, 12, 1)
        out = np.asarray(slice_segments(x, jnp.array([0, 5]), 4))
        np.testing.assert_array_equal(out[0, :, 0], [0, 1, 2, 3])
        np.testing.assert_array_equal(out[1, :, 0], [17, 18, 19, 20])

    def test_rand_slice_in_bounds(self):
        x = jnp.ones((4, 100, 3))
        lengths = jnp.array([40, 100, 33, 60])
        out, ids = rand_slice_segments(x, lengths, 32, jax.random.PRNGKey(0))
        assert out.shape == (4, 32, 3)
        ids = np.asarray(ids)
        assert (ids >= 0).all()
        assert (ids + 32 <= np.asarray(lengths)).all()


class TestNativeMAS:
    def test_native_matches_oracle(self):
        from personalized_text_to_speech_tpu.ops import native

        if not native.native_available():
            pytest.skip("no native toolchain")
        for seed in range(3):
            rng = np.random.default_rng(seed)
            neg = rng.normal(size=(2, 30, 9)).astype(np.float32)
            sl = rng.integers(9, 31, size=2).astype(np.int32)
            tl = np.minimum(rng.integers(2, 10, size=2), sl).astype(np.int32)
            got = native.maximum_path_native(neg, tl, sl)
            want = maximum_path_numpy(neg, tl, sl)
            np.testing.assert_array_equal(got, want)


class TestPallasMAS:
    def test_interpret_matches_oracle(self):
        from personalized_text_to_speech_tpu.ops.mas_pallas import (
            maximum_path_pallas,
        )

        for seed in range(3):
            rng = np.random.default_rng(seed)
            b, t_y, t_x = 4, 37, 11
            neg = rng.normal(size=(b, t_y, t_x)).astype(np.float32)
            sl = rng.integers(t_x, t_y + 1, size=b).astype(np.int32)
            tl = np.minimum(rng.integers(2, t_x + 1, size=b), sl).astype(
                np.int32
            )
            got = np.asarray(
                maximum_path_pallas(
                    jnp.asarray(neg), jnp.asarray(tl), jnp.asarray(sl),
                    interpret=True,
                )
            )
            want = maximum_path_numpy(neg, tl, sl)
            np.testing.assert_array_equal(got, want)
