#!/usr/bin/env python
"""Training-throughput benchmark: fused GAN step time on synthetic batches.

Measures the full fine-tuning hot loop (on-device STFT → generator forward
incl. MAS → D update → G update) at reference-realistic shapes (batch 16,
400-frame bucket ≈ 4.6 s clips, the reference's per-GPU batch), printing one
JSON line. The reference publishes no training-speed numbers (BASELINE.md),
so the value stands alone as our recorded baseline.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from personalized_text_to_speech_tpu.config import default_model_config
    from personalized_text_to_speech_tpu.models.discriminator import (
        MultiPeriodDiscriminator,
    )
    from personalized_text_to_speech_tpu.models.synthesizer import SynthesizerTrn
    from personalized_text_to_speech_tpu.train.state import create_train_state
    from personalized_text_to_speech_tpu.train.step import Batch, make_train_step
    from personalized_text_to_speech_tpu.utils import runtime

    runtime.enable_compilation_cache()
    runtime.warmup_transfers()

    batch = int(os.environ.get("PTTS_BENCH_BATCH", "16"))
    frames = int(os.environ.get("PTTS_BENCH_FRAMES", "400"))
    tt = int(os.environ.get("PTTS_BENCH_TOKENS", "128"))
    reps = int(os.environ.get("PTTS_BENCH_REPS", "10"))
    dtype = os.environ.get("PTTS_BENCH_DTYPE", "bfloat16")

    hps = default_model_config(n_speakers=999)
    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    g_model = SynthesizerTrn.from_hparams(hps, dtype=jdtype)
    d_model = MultiPeriodDiscriminator(dtype=jdtype)
    hop = hps.data.hop_length

    rng = jax.random.PRNGKey(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        g_vars = g_model.init(
            {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
            jnp.ones((1, 16), jnp.int32), jnp.array([16]),
            jnp.zeros((1, 64, hps.data.filter_length // 2 + 1)),
            jnp.array([64]), jnp.array([0]),
        )
        wav0 = jnp.zeros((1, hps.train.segment_size))
        d_vars = d_model.init(jax.random.PRNGKey(0), wav0, wav0)
    dev = jax.devices()[0]
    g_state = jax.device_put(
        create_train_state(g_model.apply, g_vars["params"], hps, 100), dev
    )
    d_state = jax.device_put(
        create_train_state(d_model.apply, d_vars["params"], hps, 100), dev
    )

    np_rng = np.random.default_rng(0)
    b = Batch(
        text=jnp.asarray(
            np_rng.integers(1, 60, size=(batch, tt)), dtype=jnp.int32
        ),
        text_lengths=jnp.full((batch,), tt, jnp.int32),
        wav=jnp.asarray(
            np_rng.normal(size=(batch, frames * hop)) * 0.1, dtype=jnp.float32
        ),
        wav_lengths=jnp.full((batch,), frames * hop, jnp.int32),
        sid=jnp.asarray(np_rng.integers(0, 10, size=batch), dtype=jnp.int32),
    )

    step = jax.jit(make_train_step(g_model, d_model, hps), donate_argnums=(0, 1))
    key = jax.random.PRNGKey(1)
    for _ in range(2):  # compile + settle
        g_state, d_state, metrics = step(g_state, d_state, b, key)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(reps):
        g_state, d_state, metrics = step(g_state, d_state, b, key)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / reps

    audio_sec = batch * frames * hop / hps.data.sampling_rate
    print(
        json.dumps(
            {
                "metric": "train step time (fused GAN update)",
                "value": round(dt * 1000, 1),
                "unit": "ms/step",
                "vs_baseline": None,
                "audio_sec_per_step": round(audio_sec, 1),
                "audio_sec_per_wall_sec": round(audio_sec / dt, 1),
                "batch": batch,
                "frames": frames,
                "dtype": dtype,
                "loss_g": float(metrics["loss/g/total"]),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
