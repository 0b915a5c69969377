#!/usr/bin/env python
"""Streaming latency benchmark: time-to-first-audio (TTFA) of the
within-sentence chunked decode (``TTSEngine.stream_tts``) vs the monolithic
single-shot render (``tts``).

Prints one JSON line with p50 TTFA, p50 monolithic latency, per-chunk cadence
and the real-time margin (chunk audio seconds / chunk wall seconds must stay
> 1 for gapless playback).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LONG_SENTENCE = (
    "The lighthouse keeper climbed the winding staircase every evening at "
    "dusk to light the great lamp, watching the fishing boats return across "
    "the darkening bay while gulls wheeled and cried above the harbor walls."
)


def main():
    # fail fast instead of futex-hanging when the TPU tunnel relay is
    # dead (utils/runtime.require_tpu_reachable; CLAUDE.md ops notes)
    from personalized_text_to_speech_tpu.utils.runtime import (
        require_tpu_reachable,
    )

    require_tpu_reachable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--chunk_frames", type=int, default=96)
    ap.add_argument("--halo_frames", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
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
    key = jax.random.PRNGKey(0)

    def run_stream():
        """Returns (ttfa_s, total_s, chunk_gaps, audio_s)."""
        t0 = time.perf_counter()
        times, audio = [], 0.0
        for sr, piece in eng.stream_tts(
            LONG_SENTENCE, 0, "English",
            chunk_frames=args.chunk_frames, halo_frames=args.halo_frames,
            rng=key,
        ):
            times.append(time.perf_counter() - t0)
            audio += len(piece) / sr
        return times[0], times[-1], np.diff(times), audio

    # warmup both paths (compile + channel)
    run_stream()
    run_stream()
    eng.tts(LONG_SENTENCE, 0, "English", rng=key)
    eng.tts(LONG_SENTENCE, 0, "English", rng=key)

    ttfas, totals, gaps, audio_s = [], [], [], 0.0
    for _ in range(args.reps):
        f, t, g, audio_s = run_stream()
        ttfas.append(f)
        totals.append(t)
        gaps.extend(g)
    mono = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        sr, wav = eng.tts(LONG_SENTENCE, 0, "English", rng=key)
        mono.append(time.perf_counter() - t0)

    chunk_audio_s = args.chunk_frames * eng.hop_length / eng.sampling_rate
    p50_gap = float(np.percentile(gaps, 50)) if len(gaps) else 0.0
    result = {
        "metric": "time_to_first_audio_ms (stream_tts)",
        "value": round(float(np.percentile(ttfas, 50)) * 1000, 1),
        "unit": "ms",
        "monolithic_p50_ms": round(float(np.percentile(mono, 50)) * 1000, 1),
        "stream_total_p50_ms": round(float(np.percentile(totals, 50)) * 1000, 1),
        "chunk_p50_ms": round(p50_gap * 1000, 1),
        "chunk_audio_ms": round(chunk_audio_s * 1000, 1),
        "realtime_margin": round(chunk_audio_s / p50_gap, 1) if p50_gap else None,
        "sentence_audio_s": round(audio_s, 2),
        "chunk_frames": args.chunk_frames,
        "halo_frames": args.halo_frames,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result, ensure_ascii=False))


if __name__ == "__main__":
    main()
