#!/usr/bin/env python
"""Serving roofline: per-stage timing + XLA cost analysis → MFU and HBM
bandwidth utilization for the two compiled inference stages.

Answers "where is the ceiling?": the encode (text→durations, attention-heavy)
and decode (flow reverse + HiFi-GAN, conv-heavy) stages are timed in
isolation on device (blocked, no D2H payload) and divided against their XLA
cost-analysis FLOPs / bytes.  Peaks default to TPU v5e (197 bf16 TFLOPS,
819 GB/s HBM) — override with --peak_tflops / --peak_gbps.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # fail fast instead of futex-hanging when the TPU tunnel relay is
    # dead (utils/runtime.require_tpu_reachable; CLAUDE.md ops notes)
    from personalized_text_to_speech_tpu.utils.runtime import (
        require_tpu_reachable,
    )

    require_tpu_reachable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--peak_tflops", type=float, default=197.0)
    ap.add_argument("--peak_gbps", type=float, default=819.0)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "")
    import jax

    from personalized_text_to_speech_tpu.config import default_model_config
    from personalized_text_to_speech_tpu.infer import TTSEngine
    from personalized_text_to_speech_tpu.utils import runtime

    runtime.enable_compilation_cache()
    runtime.warmup_transfers()

    hps = default_model_config(n_speakers=999)
    eng = TTSEngine(hps, dtype=args.dtype)

    b = args.batch
    t_bucket = eng.text_buckets[-2]
    cost = eng.cost_analysis(b, t_bucket=t_bucket)
    f_bucket = int(cost["buckets"]["frames"])

    x = np.zeros((b, t_bucket), np.int32)
    x[:, :8] = 1
    x_lengths = np.full((b,), t_bucket, np.int32)
    sid = np.zeros((b,), np.int32)
    rng = np.uint32(0)
    enc = eng._encode_fn(t_bucket)
    enc_out = enc(eng.params, x, x_lengths, sid,
                  np.float32(1.0), np.float32(0.8), rng)
    w_ceil, m_p, logs_p, x_mask, _ = enc_out
    dec = eng._decode_fn(t_bucket, f_bucket)

    def time_stage(fn):
        fn()  # warm
        fn()
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.reps

    t_enc = time_stage(
        lambda: enc(eng.params, x, x_lengths, sid,
                    np.float32(1.0), np.float32(0.8), rng)
    )
    t_dec = time_stage(
        lambda: dec(eng.params, w_ceil, m_p, logs_p, x_mask, sid,
                    np.float32(0.667), rng, pcm16=True)
    )

    def roofline(stats, secs):
        fl = stats.get("flops", 0.0)
        by = stats.get("bytes_accessed", 0.0)
        return {
            "ms": round(secs * 1000, 2),
            "gflops": round(fl / 1e9, 1),
            "tflops_per_s": round(fl / secs / 1e12, 2),
            "mfu_pct": round(fl / secs / (args.peak_tflops * 1e12) * 100, 2),
            "gbytes": round(by / 1e9, 2),
            "gbps": round(by / secs / 1e9, 1),
            "hbm_util_pct": round(by / secs / 1e9 / args.peak_gbps * 100, 1),
        }

    audio_s = b * f_bucket * eng.hop_length / eng.sampling_rate
    result = {
        "metric": "serving roofline (per-stage device time vs XLA cost)",
        "batch": b,
        "text_bucket": t_bucket,
        "frame_bucket": f_bucket,
        "encode": roofline(cost["encode"], t_enc),
        "decode": roofline(cost["decode"], t_dec),
        "compute_only_x_realtime": round(audio_s / (t_enc + t_dec), 1),
        "dtype": args.dtype,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result, ensure_ascii=False))


if __name__ == "__main__":
    main()
