#!/usr/bin/env python
"""Concurrent-load serving benchmark: aggregate throughput and per-request
latency of the micro-batched engine under N simultaneous clients.

Drives ``MicroBatcher`` directly (no HTTP overhead — that path is covered
by tests) with a closed-loop load: each of N client threads issues
back-to-back ``tts`` calls for ``--duration`` seconds.  Reports aggregate
synthesized-audio seconds per wall second (the serving 1/RTF under load),
p50/p95 request latency, and the dispatch batching factor actually achieved.

Compare ``--clients 1`` (no batching possible) with ``--clients 8/16`` to
see the micro-batcher turning concurrency into batch throughput.

Overload regime: with ``--clients`` well past saturation (e.g. 64) the
bounded admission queue (``--max_queue``) sheds excess load instead of
letting latency grow without bound; shed requests are counted and the
client backs off briefly before retrying.  Reports p99 latency and the
shed rate so the saturation behavior is characterized, not just the
throughput curve.
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SENTENCES = [
    "The quick brown fox jumps over the lazy dog.",
    "A watched pot never boils, but it certainly steams.",
    "She sells seashells by the seashore every morning.",
    "Better late than never, but never late is better.",
    "The early bird catches the worm before sunrise.",
    "Practice makes perfect when patience guides the hand.",
    "Every cloud has a silver lining somewhere above.",
    "Actions speak louder than words in every language.",
]


def parse_client_specs(spec_list: str, default_queue: int):
    """``'1,8,16,64/16'`` → ``[(1, q), (8, q), (16, q), (64, 16)]``.

    Each comma-separated point is ``N`` (clients, default queue) or
    ``N/queue``.  All points run in one process — a fresh TPU process per
    point risks the axon chip-claim wedge (CLAUDE.md)."""
    points = []
    for spec in spec_list.split(","):
        spec = spec.strip()
        if not spec:
            continue
        if "/" in spec:
            n_str, q_str = spec.split("/")
            points.append((int(n_str), int(q_str)))
        else:
            points.append((int(spec), default_queue))
    if not points:
        raise ValueError(f"no load points in --clients={spec_list!r}")
    return points


def main():
    # fail fast instead of futex-hanging when the TPU tunnel relay is
    # dead (utils/runtime.require_tpu_reachable; CLAUDE.md ops notes)
    from personalized_text_to_speech_tpu.utils.runtime import (
        require_tpu_reachable,
    )

    require_tpu_reachable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=str, default="8",
                    help="comma list of load points; each point is 'N' or "
                         "'N/queue' (e.g. '1,8,16,64/16'). All points run "
                         "in ONE process — a fresh TPU process per point "
                         "risks the axon chip-claim wedge (CLAUDE.md)")
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--max_queue", type=int, default=64)
    ap.add_argument("--backoff_ms", type=float, default=50.0,
                    help="client sleep after a shed before retrying")
    ap.add_argument("--window_ms", type=float, default=5.0)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tiny", action="store_true",
                    help="toy-geometry engine (config.tiny_model_config) — "
                         "for CPU-host behavioral runs (overload/shedding "
                         "dynamics); absolute throughput is meaningless")
    ap.add_argument("--compare", action="store_true",
                    help="lone-client overhead isolation: run the SAME "
                         "sentences through direct engine.tts and through "
                         "batcher.tts (one client) in the same ambient "
                         "window, report both p50s and the delta — "
                         "cross-window comparisons conflate batcher "
                         "overhead with ambient tunnel variance")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "")

    from personalized_text_to_speech_tpu.config import default_model_config
    from personalized_text_to_speech_tpu.infer import TTSEngine
    from personalized_text_to_speech_tpu.infer.batching import (
        MicroBatcher,
        OverloadedError,
    )
    from personalized_text_to_speech_tpu.utils import runtime

    runtime.enable_compilation_cache()
    runtime.warmup_transfers()

    if args.tiny:
        from personalized_text_to_speech_tpu.config import tiny_model_config

        hps = tiny_model_config()
    else:
        hps = default_model_config(n_speakers=999)
    eng = TTSEngine(hps, dtype=args.dtype)
    batcher = MicroBatcher(
        eng, max_batch=args.max_batch, window_ms=args.window_ms,
        max_queue=args.max_queue,
    )

    # warm every sentence's bucket at every power-of-two batch size the
    # batcher can emit (the batcher pads to pow2 precisely so this bounded
    # warm covers all serving shapes)
    batcher.warmup(SENTENCES, language="English")

    if args.compare:
        # interleave A/B rounds so a mid-run ambient drift hits both paths
        half = max(1, int(args.duration) // 2)
        direct_lat, batched_lat = [], []
        deadline = time.monotonic() + 2 * half
        j = 0
        while time.monotonic() < deadline:
            text = SENTENCES[j % len(SENTENCES)]
            t0 = time.perf_counter()
            eng.tts(text, speaker=j % 8, language="English")
            direct_lat.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            batcher.tts(text, speaker=j % 8, language="English")
            batched_lat.append(time.perf_counter() - t0)
            j += 1
        d50 = float(np.percentile(direct_lat, 50)) * 1000
        b50 = float(np.percentile(batched_lat, 50)) * 1000
        print(json.dumps({
            "metric": "micro-batcher lone-client overhead (same window)",
            "pairs": len(direct_lat),
            "direct_p50_ms": round(d50, 1),
            "batched_p50_ms": round(b50, 1),
            "overhead_ms": round(b50 - d50, 1),
            "direct_p95_ms": round(
                float(np.percentile(direct_lat, 95)) * 1000, 1),
            "batched_p95_ms": round(
                float(np.percentile(batched_lat, 95)) * 1000, 1),
            "window_ms": args.window_ms,
            "dtype": args.dtype,
            "engine": "tiny-behavioral" if args.tiny else "full",
        }))
        return

    batcher.close()
    n_sid = min(8, int(hps.data.n_speakers))

    def run_point(n_clients: int, max_queue: int):
        point = MicroBatcher(
            eng, max_batch=args.max_batch, window_ms=args.window_ms,
            max_queue=max_queue,
        )
        warm_done = threading.Event()
        lat, audio_s = [], []
        sheds = [0]
        lock = threading.Lock()
        stop_holder = [0.0]

        def client(i):
            warm_done.wait()
            j = i
            while time.monotonic() < stop_holder[0]:
                text = SENTENCES[j % len(SENTENCES)]
                j += 1
                t0 = time.perf_counter()
                try:
                    sr, wav = point.tts(
                        text, speaker=i % n_sid, language="English"
                    )
                except OverloadedError:
                    with lock:
                        sheds[0] += 1
                    time.sleep(args.backoff_ms / 1000.0)
                    continue
                dt = time.perf_counter() - t0
                with lock:
                    lat.append(dt)
                    audio_s.append(len(wav) / sr)

        threads = [
            threading.Thread(target=client, args=(i,))
            for i in range(n_clients)
        ]
        for t in threads:
            t.start()
        t_start = time.perf_counter()
        stop_holder[0] = time.monotonic() + args.duration
        warm_done.set()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t_start

        lat_np = np.asarray(lat)
        result = {
            "metric": "serving throughput under concurrent load "
                      "(micro-batched)",
            "clients": n_clients,
            "requests": len(lat),
            "wall_s": round(wall, 2),
            "requests_per_s": round(len(lat) / wall, 2),
            "audio_s_per_wall_s": round(float(np.sum(audio_s)) / wall, 1),
            "latency_p50_ms": round(
                float(np.percentile(lat_np, 50)) * 1000, 1),
            "latency_p95_ms": round(
                float(np.percentile(lat_np, 95)) * 1000, 1),
            "latency_p99_ms": round(
                float(np.percentile(lat_np, 99)) * 1000, 1),
            "shed": sheds[0],
            "shed_rate": round(sheds[0] / max(sheds[0] + len(lat), 1), 3),
            "max_queue": max_queue,
            "dispatches": point.stats["dispatches"],
            "mean_batch": round(
                point.stats["requests"]
                / max(point.stats["dispatches"], 1), 2
            ),
            "max_batch_seen": point.stats["max_batch_seen"],
            "window_ms": args.window_ms,
            "dtype": args.dtype,
            "engine": "tiny-behavioral" if args.tiny else "full",
        }
        print(json.dumps(result), flush=True)
        point.close()

    for n_clients, max_queue in parse_client_specs(
        args.clients, args.max_queue
    ):
        run_point(n_clients, max_queue)


if __name__ == "__main__":
    main()
