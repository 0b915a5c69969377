"""HTTP serving tests: stdlib JSON API + chunked-transfer streaming,
exercised in-process against the tiny CPU engine."""

import io
import json
import struct
import threading
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest

from tests.test_engine import tiny_engine_hps


@pytest.fixture(scope="module")
def server():
    import argparse

    from personalized_text_to_speech_tpu.infer.engine import TTSEngine
    from personalized_text_to_speech_tpu.text.symbols import SYMBOLS

    hps = tiny_engine_hps()
    hps["symbols"] = list(SYMBOLS)
    eng = TTSEngine(hps, dtype="float32")
    # warm the jit caches so request threads don't compile concurrently
    eng.tts("Warm up now.", speaker=0, language="English")

    args = argparse.Namespace(
        host="127.0.0.1", port=0, max_body_mb=1, share=False,
        max_batch=8, batch_window_ms=50.0, max_queue=64,
    )

    import tools.serve as serve_mod

    # build the server without serve_forever: replicate serve_http wiring
    holder = {}

    def run():
        # serve_http blocks; patch ThreadingHTTPServer to capture instance
        import http.server as hs

        orig = hs.ThreadingHTTPServer

        class Capture(orig):
            def __init__(self, *a, **k):
                super().__init__(*a, **k)
                holder["server"] = self

        try:
            hs.ThreadingHTTPServer = Capture
            serve_mod.ThreadingHTTPServer = Capture  # if imported directly
        except Exception:
            pass
        try:
            serve_mod.serve_http(eng, args)
        except Exception:
            pass
        finally:
            hs.ThreadingHTTPServer = orig

    t = threading.Thread(target=run, daemon=True)
    t.start()
    import time

    # engine construction inside the thread can take minutes when the host
    # core is contended (e.g. a trainer running alongside the suite) — wait
    # long, but bail as soon as the thread itself dies
    for _ in range(3000):
        if "server" in holder or not t.is_alive():
            break
        time.sleep(0.1)
    assert "server" in holder, "server did not start"
    srv = holder["server"]
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, payload, timeout=300):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=timeout)


class TestHttpApi:
    def test_healthz_and_speakers(self, server):
        assert urllib.request.urlopen(f"{server}/healthz").read() == b"ok"
        speakers = json.loads(
            urllib.request.urlopen(f"{server}/speakers").read()
        )
        assert speakers.get("alice") == 0

    def test_tts_returns_wav(self, server):
        resp = _post(f"{server}/tts", {
            "text": "Hello there.", "speaker": 0, "language": "English",
        })
        body = resp.read()
        assert resp.headers["Content-Type"] == "audio/wav"
        with wave.open(io.BytesIO(body)) as w:
            assert w.getframerate() == 8000
            assert w.getnframes() > 0

    def test_body_cap_413(self, server):
        req = urllib.request.Request(
            f"{server}/tts", data=b"x" * (2 * 1024 * 1024)
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 413

    def test_tts_stream_chunked_wav(self, server):
        resp = _post(f"{server}/tts_stream", {
            "text": "Streaming synthesis test sentence.",
            "speaker": 0, "language": "English", "chunk_frames": 16,
        })
        assert resp.headers["Content-Type"] == "audio/wav"
        body = resp.read()  # urllib reassembles the chunked transfer
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        # streaming header: unknown RIFF/data sizes
        assert struct.unpack("<I", body[4:8])[0] == 0xFFFFFFFF
        pcm = np.frombuffer(body[44:], dtype="<i2")
        assert len(pcm) > 16 * 64  # more than one chunk of audio
        assert np.abs(pcm).max() > 0

    def test_concurrent_tts_micro_batches(self, server):
        """Concurrent /tts requests must share device dispatches (the
        micro-batcher, infer/batching.py) — and every caller still gets
        its own correct wav back."""
        n = 6
        results = [None] * n
        errors = []

        def call(i):
            try:
                resp = _post(f"{server}/tts", {
                    "text": f"Concurrent request number {i}.",
                    "speaker": 0, "language": "English",
                })
                results[i] = resp.read()
            except Exception as e:  # pragma: no cover - failure path
                errors.append(e)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        for body in results:
            assert body is not None
            with wave.open(io.BytesIO(body)) as w:
                assert w.getnframes() > 0
        stats = json.loads(urllib.request.urlopen(f"{server}/stats").read())
        assert stats["requests"] >= n
        # at least one dispatch carried multiple requests, and batching
        # strictly beat one-dispatch-per-request
        assert stats["max_batch_seen"] >= 2
        assert stats["dispatches"] < stats["requests"]

    def test_error_surfaces_as_json(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{server}/tts", {"speaker": 0})  # missing "text"
        assert e.value.code == 400
        assert "error" in json.loads(e.value.read())
