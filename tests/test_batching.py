"""MicroBatcher unit tests against a fake engine (no device, no jax):
grouping, pow2 padding, result ordering, error delivery."""

import threading
import time

import numpy as np
import pytest

from personalized_text_to_speech_tpu.infer.batching import (
    MicroBatcher,
    OverloadedError,
)


class FakeEngine:
    sampling_rate = 16000

    def __init__(self, delay=0.0):
        self.calls = []  # (batch_size_padded, params)
        self.delay = delay

    def text_to_ids(self, text, language=None):
        return [ord(c) % 60 for c in text]

    def speaker_id(self, speaker):
        return int(speaker)

    def synthesize_ids(self, id_seqs, sids, noise_scale=0.667,
                       noise_scale_w=0.8, length_scale=1.0):
        self.calls.append(
            (len(id_seqs), (noise_scale, noise_scale_w, length_scale))
        )
        if self.delay:
            time.sleep(self.delay)
        # wav length encodes the ids length so callers can check their own
        return [np.full(len(ids), float(sid), np.float32)
                for ids, sid in zip(id_seqs, sids)]


class TestMicroBatcher:
    def test_single_request_passthrough(self):
        eng = FakeEngine()
        mb = MicroBatcher(eng, max_batch=8, window_ms=1.0)
        sr, wav = mb.tts("abc", speaker=3)
        assert sr == 16000
        assert wav.shape == (3,) and wav[0] == 3.0
        assert eng.calls[0][0] == 1  # no padding for batch 1
        mb.close()

    def test_concurrent_requests_batch_and_pad_pow2(self):
        eng = FakeEngine(delay=0.05)
        mb = MicroBatcher(eng, max_batch=8, window_ms=100.0)
        results = {}

        def call(i):
            results[i] = mb.tts("x" * (i + 1), speaker=i)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        # every caller got ITS wav (length i+1, filled with its speaker id)
        for i in range(3):
            sr, wav = results[i]
            assert wav.shape == (i + 1,)
            assert wav[0] == float(i)
        # 3 concurrent same-params requests → one dispatch padded to 4
        sizes = [c[0] for c in eng.calls]
        assert max(sizes) == 4
        assert mb.stats["max_batch_seen"] == 3
        assert mb.stats["dispatches"] < mb.stats["requests"]
        mb.close()

    def test_different_params_split_groups(self):
        eng = FakeEngine(delay=0.05)
        mb = MicroBatcher(eng, max_batch=8, window_ms=100.0)
        out = {}

        def call(key, **kw):
            out[key] = mb.tts("hello", speaker=0, **kw)

        threads = [
            threading.Thread(target=call, args=("a",),
                             kwargs={"noise_scale": 0.5}),
            threading.Thread(target=call, args=("b",),
                             kwargs={"noise_scale": 0.9}),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert len(eng.calls) == 2  # incompatible scalars never share a call
        assert {c[1][0] for c in eng.calls} == {0.5, 0.9}
        mb.close()

    def test_overload_sheds_with_bounded_queue(self):
        # slow device + tiny admission queue: a burst larger than
        # queue + in-flight must shed, not queue unboundedly
        eng = FakeEngine(delay=0.2)
        mb = MicroBatcher(eng, max_batch=1, window_ms=0.0, max_queue=2)
        ok, shed = [], []
        lock = threading.Lock()

        def call(i):
            try:
                sr, wav = mb.tts("abcd", speaker=i)
                with lock:
                    ok.append((i, wav))
            except OverloadedError:
                with lock:
                    shed.append(i)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert len(ok) + len(shed) == 10
        assert shed, "burst of 10 into queue of 2 must shed"
        assert ok, "admitted requests must still complete"
        for i, wav in ok:
            assert wav[0] == float(i)  # shed never corrupts admitted results
        assert mb.stats["shed"] == len(shed)
        snap = mb.stats_snapshot()
        assert snap["max_queue"] == 2 and "queue_depth" in snap
        mb.close()

    def test_no_shed_under_bound(self):
        eng = FakeEngine()
        mb = MicroBatcher(eng, max_batch=8, window_ms=1.0, max_queue=64)
        for _ in range(5):
            mb.tts("abc", speaker=0)
        assert mb.stats["shed"] == 0
        mb.close()

    def test_error_delivered_not_fatal(self):
        eng = FakeEngine()

        def boom(*a, **k):
            raise RuntimeError("synth failed")

        eng.synthesize_ids = boom
        mb = MicroBatcher(eng, max_batch=4, window_ms=1.0)
        with pytest.raises(RuntimeError, match="synth failed"):
            mb.tts("abc", speaker=0)
        # worker survives the error and handles the next request
        eng2_wavs = [np.zeros(3, np.float32)]
        eng.synthesize_ids = lambda ids, sids, **k: eng2_wavs * len(ids)
        sr, wav = mb.tts("abc", speaker=0)
        assert wav.shape == (3,)
        mb.close()


class TestParseClientSpecs:
    """bench_serve's one-process multi-point sweep spec: 'N' or 'N/queue',
    comma-separated (tools/bench_serve.py parse_client_specs)."""

    def test_single_point_default_queue(self):
        from tools.bench_serve import parse_client_specs

        assert parse_client_specs("8", 64) == [(8, 64)]

    def test_sweep_with_per_point_queue(self):
        from tools.bench_serve import parse_client_specs

        assert parse_client_specs("1,8,16,64/16", 64) == [
            (1, 64), (8, 64), (16, 64), (64, 16),
        ]

    def test_whitespace_and_empty_segments_tolerated(self):
        from tools.bench_serve import parse_client_specs

        assert parse_client_specs(" 4 , , 32/8 ", 64) == [(4, 64), (32, 8)]

    def test_empty_spec_rejected(self):
        from tools.bench_serve import parse_client_specs

        with pytest.raises(ValueError):
            parse_client_specs("", 64)
