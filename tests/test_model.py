"""Model-level smoke tests on a tiny configuration: shapes, masks,
determinism, and loss finiteness of the full training graph."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from personalized_text_to_speech_tpu.models import (
    MultiPeriodDiscriminator,
    SynthesizerTrn,
)
from personalized_text_to_speech_tpu.train import losses


def tiny_model(**over):
    kw = dict(
        n_vocab=20,
        spec_channels=33,  # n_fft 64 → 33 bins
        segment_size=8,
        inter_channels=8,
        hidden_channels=8,
        filter_channels=16,
        n_heads=2,
        n_layers=1,
        kernel_size=3,
        p_dropout=0.1,
        resblock="1",
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16,
        n_speakers=4,
        gin_channels=6,
    )
    kw.update(over)
    return SynthesizerTrn(**kw)


HOP = 8  # product of upsample rates


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    rng = jax.random.PRNGKey(0)
    x = jnp.array([[1, 2, 3, 4, 0, 0], [5, 6, 7, 8, 9, 10]], dtype=jnp.int32)
    x_lengths = jnp.array([4, 6])
    y = jnp.zeros((2, 20, 33))
    y_lengths = jnp.array([20, 16])
    sid = jnp.array([0, 1])
    params = model.init(
        {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
        x, x_lengths, y, y_lengths, sid,
    )
    return model, params


class TestTrainingGraph:
    def test_forward_shapes(self, model_and_params):
        model, params = model_and_params
        x = jnp.array([[1, 2, 3, 4, 0, 0], [5, 6, 7, 8, 9, 10]], dtype=jnp.int32)
        x_lengths = jnp.array([4, 6])
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.normal(size=(2, 20, 33)), dtype=jnp.float32)
        y_lengths = jnp.array([20, 16])
        sid = jnp.array([0, 1])
        out = model.apply(
            params, x, x_lengths, y, y_lengths, sid,
            rngs={"noise": jax.random.PRNGKey(1), "slice": jax.random.PRNGKey(2),
                  "dropout": jax.random.PRNGKey(3)},
        )
        assert out["wav_hat"].shape == (2, 8 * HOP)
        assert out["attn"].shape == (2, 20, 6)
        assert out["l_length"].shape == (2,) or out["l_length"].ndim == 1
        assert out["z"].shape == (2, 20, 8)
        # attn respects lengths: each valid frame maps to exactly one token
        attn = np.asarray(out["attn"])
        assert attn[0, :20, :4].sum() == 20
        assert attn[0, :, 4:].sum() == 0
        for k in ("wav_hat", "z_p", "m_p", "logs_p", "m_q", "logs_q"):
            assert np.isfinite(np.asarray(out[k])).all(), k

    def test_losses_finite(self, model_and_params):
        model, params = model_and_params
        x = jnp.array([[1, 2, 3, 4, 0, 0], [5, 6, 7, 8, 9, 10]], dtype=jnp.int32)
        x_lengths = jnp.array([4, 6])
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.normal(size=(2, 20, 33)) * 0.1, dtype=jnp.float32)
        y_lengths = jnp.array([20, 16])
        sid = jnp.array([0, 1])
        out = model.apply(
            params, x, x_lengths, y, y_lengths, sid,
            rngs={"noise": jax.random.PRNGKey(1), "slice": jax.random.PRNGKey(2),
                  "dropout": jax.random.PRNGKey(3)},
        )
        kl = losses.kl_loss(
            out["z_p"], out["logs_q"], out["m_p"], out["logs_p"], out["y_mask"]
        )
        assert np.isfinite(float(kl))

        disc = MultiPeriodDiscriminator(periods=(2, 3))
        wav_real = jnp.asarray(
            rng.normal(size=out["wav_hat"].shape) * 0.1, dtype=jnp.float32
        )
        dparams = disc.init(jax.random.PRNGKey(0), wav_real, out["wav_hat"])
        y_d_r, y_d_g, fmap_r, fmap_g = disc.apply(dparams, wav_real, out["wav_hat"])
        d_loss, _, _ = losses.discriminator_loss(y_d_r, y_d_g)
        g_loss, _ = losses.generator_loss(y_d_g)
        fm = losses.feature_loss(fmap_r, fmap_g)
        for v in (d_loss, g_loss, fm):
            assert np.isfinite(float(v))


class TestInference:
    def test_infer_shapes_and_mask(self, model_and_params):
        model, params = model_and_params
        x = jnp.array([[1, 2, 3, 4, 5, 0]], dtype=jnp.int32)
        x_lengths = jnp.array([5])
        sid = jnp.array([2])
        max_len = 40
        wav, y_lengths, attn, y_mask = model.apply(
            params, x, x_lengths, sid, method=model.infer, max_len=max_len,
            rngs={"noise": jax.random.PRNGKey(9)},
        )
        assert wav.shape == (1, max_len * HOP)
        n = int(y_lengths[0])
        assert 1 <= n <= max_len
        # samples beyond the valid length are zeroed
        assert np.abs(np.asarray(wav)[0, n * HOP:]).max() == 0.0
        assert np.isfinite(np.asarray(wav)).all()

    def test_infer_deterministic_with_fixed_noise(self, model_and_params):
        model, params = model_and_params
        x = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
        x_lengths = jnp.array([4])
        sid = jnp.array([0])
        max_len = 30
        dp_noise = jnp.zeros((1, 4, 2))
        prior_noise = jnp.zeros((1, max_len, 8))
        outs = []
        for _ in range(2):
            wav, y_len, _, _ = model.apply(
                params, x, x_lengths, sid, method=model.infer, max_len=max_len,
                dp_noise=dp_noise, prior_noise=prior_noise,
                rngs={"noise": jax.random.PRNGKey(0)},
            )
            outs.append(np.asarray(wav))
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_length_scale_changes_duration(self, model_and_params):
        model, params = model_and_params
        x = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
        x_lengths = jnp.array([4])
        sid = jnp.array([0])
        dp_noise = jnp.zeros((1, 4, 2))
        _, len_fast, _, _ = model.apply(
            params, x, x_lengths, sid, method=model.infer, max_len=64,
            length_scale=0.5, dp_noise=dp_noise,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        _, len_slow, _, _ = model.apply(
            params, x, x_lengths, sid, method=model.infer, max_len=64,
            length_scale=2.0, dp_noise=dp_noise,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        assert int(len_slow[0]) > int(len_fast[0])


class TestVoiceConversion:
    def test_vc_shapes(self, model_and_params):
        model, params = model_and_params
        rng = np.random.default_rng(2)
        y = jnp.asarray(rng.normal(size=(1, 12, 33)) * 0.1, dtype=jnp.float32)
        y_lengths = jnp.array([12])
        o, y_mask, _ = model.apply(
            params, y, y_lengths, jnp.array([0]), jnp.array([1]),
            method=model.voice_conversion,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        assert o.shape == (1, 12 * HOP)
        assert np.isfinite(np.asarray(o)).all()


class TestDeterministicDurationPath:
    def test_use_sdp_false(self):
        model = tiny_model(use_sdp=False)
        rng = jax.random.PRNGKey(0)
        x = jnp.ones((1, 6), dtype=jnp.int32)
        xl = jnp.array([6])
        y = jnp.zeros((1, 20, 33))
        yl = jnp.array([20])
        sid = jnp.array([0])
        params = model.init(
            {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
            x, xl, y, yl, sid,
        )
        out = model.apply(
            params, x, xl, y, yl, sid,
            rngs={"noise": rng, "slice": rng, "dropout": rng},
        )
        assert np.isfinite(np.asarray(out["l_length"])).all()
        wav, y_len, _, _ = model.apply(
            params, x, xl, sid, method=model.infer, max_len=32,
            rngs={"noise": rng},
        )
        assert np.isfinite(np.asarray(wav)).all()
        # DP key naming matches the reference scheme (conv_1/norm_1 literal)
        from personalized_text_to_speech_tpu.utils import torch_compat as tc
        keys = set(tc.flax_to_torch(params).keys())
        for k in ("dp.conv_1.weight", "dp.norm_1.gamma", "dp.proj.weight",
                  "dp.cond.weight"):
            assert k in keys, k
