#!/usr/bin/env python
"""Web TTS serving — parity with the reference Gradio app (``VC_inference.py``).

With ``gradio`` installed, launches the same Blocks UI (textbox, speaker
dropdown from the config's speaker map, language dropdown, speed slider
0.1–5, reference ``VC_inference.py:77-99``).  Without it, falls back to a
dependency-free HTTP JSON API on the standard library:

    POST /tts   {"text": ..., "speaker": ..., "language": ..., "speed": ...}
      → audio/wav bytes
    GET  /speakers → JSON speaker map
    GET  /healthz  → ok
"""

import argparse
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_engine(args):
    from personalized_text_to_speech_tpu.config import load_hparams
    from personalized_text_to_speech_tpu.infer import TTSEngine
    from personalized_text_to_speech_tpu.utils import runtime

    runtime.enable_compilation_cache()
    hps = load_hparams(args.config_dir)
    return TTSEngine(
        hps,
        checkpoint_path=None if args.random_init else args.model_dir,
        dtype=args.dtype,
    )


def wav_bytes(sr, wav) -> bytes:
    import numpy as np
    from scipy.io import wavfile

    buf = io.BytesIO()
    pcm = (np.clip(wav, -1, 1) * 32767.0).astype(np.int16)
    wavfile.write(buf, sr, pcm)
    return buf.getvalue()


def serve_gradio(eng, args):
    import gradio as gr

    speakers = list(eng.speakers.keys()) or ["0"]
    langs = ["English", "Chinese", "Japanese", "Mix"]

    def tts_fn(text, speaker, language, speed):
        sr, wav = eng.tts(
            text, speaker=speaker if eng.speakers else 0,
            language=None if language == "Mix" else language, speed=speed,
            noise_scale=0.667, noise_scale_w=0.8,
        )
        return "Success", (sr, wav)

    app = gr.Blocks()
    with app:
        gr.Markdown("# Personalized Text-to-Speech (TPU)")
        with gr.Tab("Text-to-Speech"):
            with gr.Row():
                with gr.Column():
                    textbox = gr.TextArea(
                        label="Text",
                        placeholder="Type your sentence here",
                        value="Hello, this is a test of my custom voice.",
                    )
                    char_dropdown = gr.Dropdown(
                        choices=speakers, value=speakers[0], label="character"
                    )
                    language_dropdown = gr.Dropdown(
                        choices=langs, value=langs[0], label="language"
                    )
                    duration_slider = gr.Slider(
                        minimum=0.1, maximum=5, value=1, step=0.1, label="Speed"
                    )
                with gr.Column():
                    text_output = gr.Textbox(label="Message")
                    audio_output = gr.Audio(label="Output Audio")
                    btn = gr.Button("Generate!", variant="primary")
                    btn.click(
                        tts_fn,
                        inputs=[textbox, char_dropdown, language_dropdown,
                                duration_slider],
                        outputs=[text_output, audio_output],
                    )
    app.launch(share=args.share, server_port=args.port)


def serve_http(eng, args):
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from personalized_text_to_speech_tpu.infer.batching import (
        MicroBatcher,
        OverloadedError,
    )

    # requests are handled concurrently (slow clients don't block others
    # during response transfer) but device work is serialized: the engine's
    # jit caches and RNG counter are not re-entrant.  /tts goes through the
    # micro-batcher (concurrent requests share one device dispatch); the
    # streaming/VC/long-form paths take the same device lock directly.
    batcher = MicroBatcher(
        eng, max_batch=args.max_batch, window_ms=args.batch_window_ms,
        max_queue=args.max_queue,
    )
    synth_lock = batcher.device_lock

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            elif self.path == "/speakers":
                self._send(200, json.dumps(eng.speakers).encode())
            elif self.path == "/stats":
                self._send(200, json.dumps(batcher.stats_snapshot()).encode())
            else:
                self._send(404, b"{}")

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length > args.max_body_mb * 1024 * 1024:
                    # drain in constant memory so the client sees the 413
                    # instead of a broken pipe, then reject
                    remaining = length
                    while remaining > 0:
                        chunk = self.rfile.read(min(remaining, 65536))
                        if not chunk:
                            break
                        remaining -= len(chunk)
                    self._send(413, json.dumps(
                        {"error": f"body exceeds {args.max_body_mb} MiB cap"}
                    ).encode())
                    return
                body = self.rfile.read(length)
                if self.path == "/tts":
                    req = json.loads(body or b"{}")
                    text = req["text"]
                    speaker = req.get("speaker", 0)
                    language = req.get("language", None)
                    speed = float(req.get("speed", 1.0))
                    long_form = bool(req.get("long_form", False))
                    if long_form:
                        with synth_lock:
                            sr, wav = eng.long_form(
                                text, speaker=speaker, language=language,
                                speed=speed,
                            )
                    else:
                        # micro-batched: concurrent requests ride one
                        # device dispatch (batching.py)
                        sr, wav = batcher.tts(
                            text, speaker=speaker, language=language,
                            speed=speed,
                        )
                    self._send(200, wav_bytes(sr, wav), "audio/wav")
                elif self.path == "/tts_stream":
                    # chunked-transfer streaming: WAV header with unknown
                    # length, then PCM16 pieces as the engine produces
                    # them (within-sentence chunks, halo-exact seams)
                    import struct

                    import numpy as np

                    req = json.loads(body or b"{}")
                    text = req["text"]
                    speaker = req.get("speaker", 0)
                    language = req.get("language", None)
                    speed = float(req.get("speed", 1.0))
                    chunk_frames = int(req.get("chunk_frames", 96))
                    sr = eng.sampling_rate
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()

                    def emit(b: bytes):
                        self.wfile.write(f"{len(b):X}\r\n".encode())
                        self.wfile.write(b)
                        self.wfile.write(b"\r\n")

                    # streaming WAV header: 0xFFFFFFFF RIFF/data sizes
                    hdr = (
                        b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
                        + b"fmt " + struct.pack(
                            "<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16
                        )
                        + b"data" + struct.pack("<I", 0xFFFFFFFF)
                    )
                    emit(hdr)
                    with synth_lock:
                        for _, piece in eng.stream_long_form(
                            text, speaker=speaker, language=language,
                            speed=speed, chunk_frames=chunk_frames,
                        ):
                            pcm = (
                                np.clip(piece, -1.0, 1.0) * 32767.0
                            ).astype("<i2").tobytes()
                            if pcm:
                                emit(pcm)
                    self.wfile.write(b"0\r\n\r\n")
                elif self.path == "/vc":
                    # voice conversion: wav body, speakers via query-ish JSON
                    # header X-VC: {"source": ..., "target": ...}
                    import numpy as np
                    from scipy.io import wavfile as _wavfile

                    meta = json.loads(self.headers.get("X-VC", "{}"))
                    sr_in, data = _wavfile.read(io.BytesIO(body))
                    from personalized_text_to_speech_tpu.data.audio import (
                        resample,
                        to_mono,
                    )

                    wav_in = to_mono(
                        data.T.astype(np.float32) / 32768.0
                        if data.dtype == np.int16
                        else data.T.astype(np.float32)
                    )
                    wav_in = resample(wav_in, sr_in, eng.sampling_rate)
                    with synth_lock:
                        sr, wav = eng.voice_conversion(
                            wav_in, meta.get("source", 0), meta.get("target", 0)
                        )
                    self._send(200, wav_bytes(sr, wav), "audio/wav")
                else:
                    self._send(404, b"{}")
            except OverloadedError:
                # bounded admission queue full — shed load so latency stays
                # bounded; clients should back off and retry
                self.send_response(503)
                body = json.dumps({"error": "server overloaded"}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Retry-After", "1")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # surface the error to the client
                self._send(
                    400, json.dumps({"error": f"{type(e).__name__}: {e}"}).encode()
                )

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"HTTP TTS API on {args.host}:{args.port}  (POST /tts, GET /speakers)")
    server.serve_forever()


def main():
    # fail fast instead of futex-hanging when the TPU tunnel relay is
    # dead (utils/runtime.require_tpu_reachable; CLAUDE.md ops notes)
    from personalized_text_to_speech_tpu.utils.runtime import (
        require_tpu_reachable,
    )

    require_tpu_reachable()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", default="./G_latest.pth")
    parser.add_argument("--config_dir", default="./finetune_speaker.json")
    parser.add_argument("--share", default=False, action="store_true")
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--host", default="127.0.0.1",
                        help="HTTP bind address (default loopback; set "
                             "0.0.0.0 explicitly to expose externally)")
    parser.add_argument("--max-body-mb", type=int, default=32,
                        help="reject request bodies larger than this (MiB)")
    parser.add_argument("--max-batch", type=int, default=16,
                        help="micro-batcher: max concurrent /tts requests "
                             "per device dispatch")
    parser.add_argument("--max-queue", type=int, default=64,
                        help="micro-batcher admission-queue bound; beyond "
                             "it /tts sheds load with HTTP 503")
    parser.add_argument("--batch-window-ms", type=float, default=5.0,
                        help="micro-batcher: how long the first queued "
                             "request waits for stragglers (0 disables "
                             "batching in all but back-to-back load)")
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--http", action="store_true",
                        help="force the stdlib HTTP API even if gradio exists")
    args = parser.parse_args()

    eng = build_engine(args)
    if not args.http:
        try:
            serve_gradio(eng, args)
            return
        except ImportError:
            print("gradio not installed — falling back to HTTP JSON API")
    serve_http(eng, args)


if __name__ == "__main__":
    main()
