#!/usr/bin/env python
"""Training-throughput benchmark: fused GAN step time on synthetic batches.

Measures the full fine-tuning hot loop (on-device STFT → generator forward
incl. MAS → D update → G update) at reference-realistic shapes (batch 16,
400-frame bucket ≈ 4.6 s clips, the reference's per-GPU batch), printing one
JSON line. The reference publishes no training-speed numbers (BASELINE.md),
so the value stands alone as our recorded baseline.

Flags:
  --scaling    also sweep batch sizes (8/16/32/64) and print a row each
  --pipeline   also measure the threaded host batcher's production rate on
               real wav decode vs the device's consumption rate

MFU is always reported: XLA cost-analysis FLOPs for the compiled step
divided by wall time and the chip's peak (TPU v5e ≈ 197 TFLOP/s bf16).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_FLOPS = 197e12  # bf16 per chip


def _step_flops(step, g_state, d_state, b, key) -> float:
    """FLOPs of the compiled train step from XLA cost analysis."""
    try:
        ca = step.lower(g_state, d_state, b, key).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def build_step(batch, frames, tokens=128, dtype="bfloat16", seed=0):
    """Construct the fused GAN train step on synthetic data.

    Returns ``(step_once, state)`` where ``state`` is the
    ``(g_state, d_state, batch, key)`` tuple and ``step_once(state)`` runs
    one compiled update and returns the new state.  Shared by the MFU bench
    below and the per-op roofline audit (``tools/profile_ops.py``).
    """
    import jax
    import jax.numpy as jnp

    from personalized_text_to_speech_tpu.config import default_model_config
    from personalized_text_to_speech_tpu.models.discriminator import (
        MultiPeriodDiscriminator,
    )
    from personalized_text_to_speech_tpu.models.synthesizer import SynthesizerTrn
    from personalized_text_to_speech_tpu.train.state import create_train_state
    from personalized_text_to_speech_tpu.train.step import Batch, make_train_step

    hps = default_model_config(n_speakers=999)
    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    g_model = SynthesizerTrn.from_hparams(hps, dtype=jdtype)
    d_model = MultiPeriodDiscriminator(dtype=jdtype)
    hop = hps.data.hop_length

    rng = jax.random.PRNGKey(seed)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        g_vars = g_model.init(
            {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
            jnp.ones((1, 16), jnp.int32), jnp.array([16]),
            jnp.zeros((1, 64, hps.data.filter_length // 2 + 1)),
            jnp.array([64]), jnp.array([0]),
        )
        wav0 = jnp.zeros((1, hps.train.segment_size))
        d_vars = d_model.init(jax.random.PRNGKey(seed), wav0, wav0)
    dev = jax.devices()[0]
    g_state = jax.device_put(
        create_train_state(g_model.apply, g_vars["params"], hps, 100), dev
    )
    d_state = jax.device_put(
        create_train_state(d_model.apply, d_vars["params"], hps, 100), dev
    )
    np_rng = np.random.default_rng(seed)
    b = Batch(
        text=jnp.asarray(
            np_rng.integers(1, 60, size=(batch, tokens)), dtype=jnp.int32
        ),
        text_lengths=jnp.full((batch,), tokens, jnp.int32),
        wav=jnp.asarray(
            np_rng.normal(size=(batch, frames * hop)) * 0.1,
            dtype=jnp.float32,
        ),
        wav_lengths=jnp.full((batch,), frames * hop, jnp.int32),
        sid=jnp.asarray(np_rng.integers(0, 10, size=batch), dtype=jnp.int32),
    )
    step = jax.jit(
        make_train_step(g_model, d_model, hps), donate_argnums=(0, 1)
    )

    def step_once(state):
        g_state, d_state, b, key = state
        g_state, d_state, metrics = step(g_state, d_state, b, key)
        return (g_state, d_state, b, key), metrics

    return step_once, (g_state, d_state, b, jax.random.PRNGKey(seed + 1))


def main():
    # fail fast instead of futex-hanging when the TPU tunnel relay is
    # dead (utils/runtime.require_tpu_reachable; CLAUDE.md ops notes)
    from personalized_text_to_speech_tpu.utils.runtime import (
        require_tpu_reachable,
    )

    require_tpu_reachable()
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

    parser = argparse.ArgumentParser()
    parser.add_argument("--scaling", action="store_true",
                        help="sweep batch 8/16/32/64")
    parser.add_argument("--pipeline", action="store_true",
                        help="measure host batcher occupancy on real wavs")
    parser.add_argument("--data_dir", default="/tmp/ftrun",
                        help="corpus dir for --pipeline (make_dataset output)")
    args = parser.parse_args()

    batch = int(os.environ.get("PTTS_BENCH_BATCH", "16"))
    frames = int(os.environ.get("PTTS_BENCH_FRAMES", "400"))
    tt = int(os.environ.get("PTTS_BENCH_TOKENS", "128"))
    reps = int(os.environ.get("PTTS_BENCH_REPS", "10"))
    dtype = os.environ.get("PTTS_BENCH_DTYPE", "bfloat16")
    batches = [8, 16, 32, 64] if args.scaling else [batch]

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

    def make_states():
        return (
            jax.device_put(
                create_train_state(g_model.apply, g_vars["params"], hps, 100),
                dev,
            ),
            jax.device_put(
                create_train_state(d_model.apply, d_vars["params"], hps, 100),
                dev,
            ),
        )

    np_rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    def make_batch(bsz):
        return Batch(
            text=jnp.asarray(
                np_rng.integers(1, 60, size=(bsz, tt)), dtype=jnp.int32
            ),
            text_lengths=jnp.full((bsz,), tt, jnp.int32),
            wav=jnp.asarray(
                np_rng.normal(size=(bsz, frames * hop)) * 0.1,
                dtype=jnp.float32,
            ),
            wav_lengths=jnp.full((bsz,), frames * hop, jnp.int32),
            sid=jnp.asarray(np_rng.integers(0, 10, size=bsz), dtype=jnp.int32),
        )

    rows = []
    for bsz in batches:
        g_state, d_state = make_states()
        b = make_batch(bsz)
        step = jax.jit(
            make_train_step(g_model, d_model, hps), donate_argnums=(0, 1)
        )
        flops = _step_flops(step, g_state, d_state, b, key)
        for _ in range(2):  # compile + settle
            g_state, d_state, metrics = step(g_state, d_state, b, key)
        jax.block_until_ready(metrics)

        t0 = time.perf_counter()
        for _ in range(reps):
            g_state, d_state, metrics = step(g_state, d_state, b, key)
        jax.block_until_ready(metrics)
        dt = (time.perf_counter() - t0) / reps

        audio_sec = bsz * frames * hop / hps.data.sampling_rate
        mfu = flops / dt / V5E_PEAK_FLOPS if flops else None
        rows.append(
            {
                "metric": "train step time (fused GAN update)",
                "value": round(dt * 1000, 1),
                "unit": "ms/step",
                "vs_baseline": None,
                "audio_sec_per_step": round(audio_sec, 1),
                "audio_sec_per_wall_sec": round(audio_sec / dt, 1),
                "batch": bsz,
                "frames": frames,
                "dtype": dtype,
                "tflops_per_step": round(flops / 1e12, 2) if flops else None,
                "mfu": round(mfu, 4) if mfu is not None else None,
                "loss_g": float(metrics["loss/g/total"]),
                "device": str(jax.devices()[0]),
            }
        )

    # host input-pipeline occupancy: can the threaded batcher (real wav
    # decode + tokenized text, padded static buckets) outrun the device?
    if args.pipeline:
        anno = os.path.join(args.data_dir, "final_annotation_train.txt")
        if os.path.exists(anno):
            from personalized_text_to_speech_tpu.data.dataset import (
                BucketBatcher,
                DatasetConfig,
                TextAudioSpeakerDataset,
            )

            cwd = os.getcwd()
            os.chdir(args.data_dir)  # annotations use relative wav paths
            try:
                ds_cfg = DatasetConfig.from_hparams(hps)
                ds = TextAudioSpeakerDataset(anno, ds_cfg, hps.symbols, seed=0)
                batcher = BucketBatcher(ds, batch_size=batch, seed=0)
                n = 0
                t0 = time.perf_counter()
                for _ in range(2):  # two epochs of pure host production
                    batcher.set_epoch(n)
                    for _batch_np in batcher.iter_prefetch():
                        n += 1
                host_dt = (time.perf_counter() - t0) / max(n, 1)
            finally:
                os.chdir(cwd)
            device_dt = rows[0]["value"] / 1000.0
            rows.append(
                {
                    "metric": "host batcher production rate (real wav decode)",
                    "value": round(host_dt * 1000, 2),
                    "unit": "ms/batch",
                    "vs_baseline": None,
                    "batches_measured": n,
                    "device_step_ms": rows[0]["value"],
                    "producer_occupancy": round(host_dt / device_dt, 3),
                    "keeps_up": host_dt < device_dt,
                }
            )
        else:
            rows.append(
                {
                    "metric": "host batcher production rate",
                    "value": None,
                    "unit": "ms/batch",
                    "vs_baseline": None,
                    "error": f"no corpus at {anno}; run tools/make_dataset.py",
                }
            )

    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
