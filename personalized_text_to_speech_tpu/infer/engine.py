"""The TTS serving engine: text → waveform with static-shape bucketed jit.

Serving counterpart of the reference inference scripts (reference
``VC_inference.py:31-53``, ``cmd_inference.py:47-117``), rebuilt for XLA's
compile-once model:

* text IDs are padded to the smallest **text bucket**; the cheap
  encoder+duration stage compiles once per bucket,
* the predicted frame count selects the smallest **frame bucket**; the
  expensive flow+HiFi-GAN decode stage compiles once per (text, frame)
  bucket pair and always runs full-canvas, masked to the true length,
* long-form input is sentence-split and synthesized as a length-bucketed
  batch, then concatenated — the capability the reference leaves to the
  user (one Gradio call = one utterance).

Default sampling knobs match the reference UI (noise 0.667, noise_w 0.8,
speed slider → ``length_scale = 1/speed``, ``VC_inference.py:48-49``).
"""

from __future__ import annotations

import functools
import logging
import re
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from personalized_text_to_speech_tpu import text as text_frontend
from personalized_text_to_speech_tpu.config import HParams
from personalized_text_to_speech_tpu.models.synthesizer import SynthesizerTrn
from personalized_text_to_speech_tpu.text.cleaners import auto_tag

LANGUAGE_MARKS = {
    "Japanese": "[JA]",
    "日本語": "[JA]",
    "Chinese": "[ZH]",
    "简体中文": "[ZH]",
    "English": "[EN]",
    "Korean": "[KO]",
    "Mix": "",
    None: None,
}

_SENTENCE_SPLIT = re.compile(r"(?<=[.!?。！？；;…])\s*")

logger = logging.getLogger(__name__)


def _chunk_ids(seq: Sequence[int], cap: int) -> List[List[int]]:
    """Split an over-long ID sequence into ≤``cap`` pieces.  Each piece is
    synthesized as its own utterance, so no text is ever silently dropped
    (the reference has no length limit because it pads dynamically;
    static buckets need an explicit overflow policy)."""
    seq = list(seq)
    if len(seq) <= cap:
        return [seq]
    return [seq[i : i + cap] for i in range(0, len(seq), cap)]


def _next_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _as_key(rng) -> jax.Array:
    """Accept a typed PRNG key, a raw uint32[2] key, or a scalar seed
    (trace-time branch — each form is its own jit specialization)."""
    arr = jnp.asarray(rng)
    if jnp.issubdtype(arr.dtype, jax.dtypes.prng_key):
        return rng
    if arr.ndim >= 1 and arr.shape[-1] == 2:
        return rng  # raw key data works with jax.random fns directly
    return jax.random.PRNGKey(arr)


class TTSEngine:
    """Checkpoint + config → a callable synthesizer with jit caching."""

    def __init__(
        self,
        hps: HParams,
        params: Optional[dict] = None,
        checkpoint_path: Optional[str] = None,
        dtype: str = "float32",
        seed: int = 1234,
    ):
        self.hps = hps
        self.sampling_rate = hps.data.sampling_rate
        self.hop_length = hps.data.hop_length
        self.add_blank = hps.data.add_blank
        self.symbols = list(hps.symbols)
        self.cleaners = list(hps.data.text_cleaners)
        self.speakers: Dict[str, int] = dict(
            hps.speakers.items() if hasattr(hps.speakers, "items") else {}
        )
        self.text_buckets = list(hps.tpu.text_buckets)
        self.frame_buckets = list(hps.tpu.frame_buckets)

        self.model = SynthesizerTrn.from_hparams(
            hps, dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        )
        self._seed = seed
        self._call_counter = 0

        if params is not None:
            self.params = params
        elif checkpoint_path is not None:
            self.params = self._load_checkpoint(checkpoint_path)
        else:
            self.params = self._random_init()

        # jit caches
        self._encode_fns: Dict[int, callable] = {}
        self._decode_fns: Dict[Tuple[int, int], callable] = {}

    # ------------------------------------------------------------------
    def _random_init(self) -> dict:
        """Initialize parameters eagerly on CPU (no XLA compile of the full
        graph just to create weights — compiling on the target backend costs
        minutes), then ship to the default device.  Uses the TRAINING graph
        so every submodule materializes (the inference path alone would skip
        enc_q and the SDP posterior flows, breaking checkpoint loading and
        voice conversion)."""
        rng = jax.random.PRNGKey(0)
        cpu = jax.devices("cpu")[0]
        ts = max(self.model.segment_size + 1, 16)
        with jax.default_device(cpu):
            variables = self.model.init(
                {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
                jnp.zeros((1, 8), dtype=jnp.int32),
                jnp.array([8]),
                jnp.zeros((1, ts, self.model.spec_channels)),
                jnp.array([ts]),
                jnp.array([0]) if self.model.n_speakers > 0 else None,
            )
        return jax.device_put(variables, jax.devices()[0])

    def _load_checkpoint(self, path: str) -> dict:
        template = self._random_init()
        if path.endswith(".pth"):
            from personalized_text_to_speech_tpu.utils import torch_compat as tc

            state, _ = tc.load_torch_state_dict(path)
            return tc.torch_to_flax(state, template)
        from personalized_text_to_speech_tpu.utils import checkpoint as ckpt

        return ckpt.restore_params(path, template)

    def _next_rng(self) -> np.uint32:
        """Per-call seed as a host scalar — the PRNG key is built in-graph
        (a host-side jax.random.split would be an eager device op)."""
        self._call_counter += 1
        return np.uint32((self._seed * 1000003 + self._call_counter) % (2 ** 31))

    # ------------------------------------------------------------------
    # text handling
    # ------------------------------------------------------------------
    def text_to_ids(
        self,
        text: str,
        language: Optional[str] = None,
        is_symbol: bool = False,
    ) -> List[int]:
        """Tag + clean + map text to IDs.  ``is_symbol=True`` treats the
        input as already-cleaned IPA and skips the G2P cleaners (the
        reference's ``get_text(..., is_symbol)`` path,
        ``VC_inference.py:31-36``)."""
        if is_symbol:
            seq = text_frontend.cleaned_text_to_sequence(text, self.symbols)
        else:
            mark = LANGUAGE_MARKS.get(language) if language else None
            if mark:
                text = mark + text + mark
            elif mark is None and "[" not in text:
                # no/unknown language → detect per script run
                text = auto_tag(text)
            seq = text_frontend.text_to_sequence(
                text, self.symbols, self.cleaners
            )
        if self.add_blank:
            seq = text_frontend.intersperse(seq, 0)
        return seq

    def speaker_id(self, speaker) -> int:
        if isinstance(speaker, str):
            if speaker in self.speakers:
                return self.speakers[speaker]
            if speaker.lstrip("-").isdigit():
                return int(speaker)  # numeric id given as a string (CLI -s 3)
            raise KeyError(
                f"unknown speaker {speaker!r}; have {list(self.speakers)[:8]}"
            )
        return int(speaker)

    # ------------------------------------------------------------------
    # compiled stages
    # ------------------------------------------------------------------
    def _encode_fn(self, t_bucket: int):
        if t_bucket not in self._encode_fns:
            model = self.model

            @jax.jit
            def run(params, x, x_lengths, sid, length_scale, noise_scale_w, rng):
                # rng derivation happens in-graph: eager ops on a tunneled
                # attach cost ~20ms each, so the host path stays pure numpy
                rng = _as_key(rng)
                rng = jax.random.fold_in(rng, 0)
                dp_noise = jax.random.normal(
                    rng, (x.shape[0], x.shape[1], 2), dtype=jnp.float32
                )
                w_ceil, m_p, logs_p, x_mask = model.apply(
                    params,
                    x,
                    x_lengths,
                    sid,
                    length_scale,
                    noise_scale_w,
                    dp_noise,
                    method=model.infer_encode,
                )
                # max frame count computed in-graph: one scalar D2H fetch
                # instead of several eager dispatches
                n_frames = jnp.max(jnp.sum(w_ceil, axis=-1)).astype(jnp.int32)
                return w_ceil, m_p, logs_p, x_mask, n_frames

            self._encode_fns[t_bucket] = run
        return self._encode_fns[t_bucket]

    def _decode_fn(self, t_bucket: int, f_bucket: int):
        key = (t_bucket, f_bucket)
        if key not in self._decode_fns:
            model = self.model

            @functools.partial(
                jax.jit, static_argnames=("max_len", "pcm16")
            )
            def run(params, w_ceil, m_p, logs_p, x_mask, sid, noise_scale, rng,
                    max_len, pcm16):
                rng = _as_key(rng)
                rng = jax.random.fold_in(rng, 1)
                prior_noise = jax.random.normal(
                    rng,
                    (m_p.shape[0], max_len, m_p.shape[-1]),
                    dtype=jnp.float32,
                )
                wav, y_lengths = model.apply(
                    params,
                    w_ceil,
                    m_p,
                    logs_p,
                    x_mask,
                    sid,
                    noise_scale,
                    max_len,
                    prior_noise,
                    method=model.infer_decode,
                )
                if pcm16:
                    # 16-bit PCM quantization on device: 4× smaller D2H
                    # transfer, and the host skips the float→int pass
                    wav = jnp.clip(wav, -1.0, 1.0)
                    wav = (wav * 32767.0).astype(jnp.int16)
                return wav, y_lengths

            self._decode_fns[key] = functools.partial(run, max_len=f_bucket)
        return self._decode_fns[key]

    def cost_analysis(
        self, batch: int, t_bucket: Optional[int] = None,
        f_bucket: Optional[int] = None, pcm16: bool = True,
    ) -> Dict[str, Dict[str, float]]:
        """XLA cost analysis (FLOPs / bytes accessed) of the two compiled
        serving stages at the given batch/buckets — the roofline inputs for
        MFU and HBM-bandwidth-utilization reporting (tools/bench_cost.py)."""
        from personalized_text_to_speech_tpu.utils.profiling import (
            compiled_stats,
        )

        t_bucket = t_bucket or self.text_buckets[-2]
        x = np.zeros((batch, t_bucket), np.int32)
        x[:, :8] = 1
        x_lengths = np.full((batch,), t_bucket, np.int32)
        sid = np.zeros((batch,), np.int32)
        rng = np.uint32(0)
        enc = self._encode_fn(t_bucket)
        enc_stats = compiled_stats(
            enc, self.params, x, x_lengths, sid,
            np.float32(1.0), np.float32(0.8), rng,
        )
        w_ceil, m_p, logs_p, x_mask, n_frames = enc(
            self.params, x, x_lengths, sid,
            np.float32(1.0), np.float32(0.8), rng,
        )
        f_bucket = f_bucket or _next_bucket(
            max(int(n_frames), 1), self.frame_buckets
        )
        dec = self._decode_fn(t_bucket, f_bucket)
        dec_stats = compiled_stats(
            dec.func, self.params, w_ceil, m_p, logs_p, x_mask, sid,
            np.float32(0.667), rng, max_len=f_bucket, pcm16=pcm16,
        )
        return {
            "encode": enc_stats,
            "decode": dec_stats,
            "buckets": {"text": float(t_bucket), "frames": float(f_bucket)},
        }

    # ------------------------------------------------------------------
    # synthesis
    # ------------------------------------------------------------------
    def submit_ids(
        self,
        id_seqs: Sequence[Sequence[int]],
        speaker_ids: Sequence[int],
        noise_scale: float = 0.667,
        noise_scale_w: float = 0.8,
        length_scale: float = 1.0,
        rng: Optional[jax.Array] = None,
        pcm16: bool = False,
    ):
        """Dispatch a batch and return device futures ``(wav, y_lengths)``
        without blocking — lets callers pipeline synthesis against fetch."""
        if rng is None:
            rng = self._next_rng()
        b = len(id_seqs)
        # submit_ids keeps a strict 1:1 input→output contract, so an
        # over-long sequence cannot be split here — it is truncated WITH a
        # warning; `synthesize_ids` (and everything built on it) chunks
        # over-long input upstream so full text survives
        cap = self.text_buckets[-1]
        for i, s in enumerate(id_seqs):
            if len(s) > cap:
                logger.warning(
                    "submit_ids: sequence %d has %d ids > largest text "
                    "bucket %d; truncating. Use synthesize_ids/long_form "
                    "for automatic chunking.", i, len(s), cap,
                )
        id_seqs = [list(s)[:cap] for s in id_seqs]
        lengths = [len(s) for s in id_seqs]
        t_bucket = _next_bucket(max(lengths), self.text_buckets)
        x = np.zeros((b, t_bucket), dtype=np.int32)
        for i, s in enumerate(id_seqs):
            x[i, : len(s)] = s
        # host side stays pure numpy: all transfers ride the jit call (each
        # separate eager dispatch costs ~20ms on a tunneled attach); rngs are
        # derived in-graph via fold_in, scalars go in as np arrays so
        # changing speed/noise never retraces
        x_lengths = np.asarray(lengths, dtype=np.int32)
        sid = np.asarray([int(s) for s in speaker_ids], dtype=np.int32)

        w_ceil, m_p, logs_p, x_mask, n_frames_dev = self._encode_fn(t_bucket)(
            self.params, x, x_lengths, sid,
            np.float32(length_scale), np.float32(noise_scale_w), rng,
        )
        n_frames = int(n_frames_dev)  # one scalar sync picks the bucket
        f_bucket = _next_bucket(max(n_frames, 1), self.frame_buckets)
        return self._decode_fn(t_bucket, f_bucket)(
            self.params, w_ceil, m_p, logs_p, x_mask, sid,
            np.float32(noise_scale), rng, pcm16=pcm16,
        )

    @staticmethod
    def collect(handle, hop_length: int, dtype=np.float32) -> List[np.ndarray]:
        """Fetch a ``submit_ids`` result → list of true-length wavs."""
        wav_dev, y_len_dev = handle
        wav = np.asarray(jax.device_get(wav_dev))
        if wav.dtype == np.int16 and dtype == np.float32:
            wav = wav.astype(np.float32) / 32767.0
        y_lengths = np.asarray(y_len_dev)
        return [
            wav[i, : int(y_lengths[i]) * hop_length]
            for i in range(wav.shape[0])
        ]

    def synthesize_ids(
        self,
        id_seqs: Sequence[Sequence[int]],
        speaker_ids: Sequence[int],
        noise_scale: float = 0.667,
        noise_scale_w: float = 0.8,
        length_scale: float = 1.0,
        rng: Optional[jax.Array] = None,
        pcm16: bool = False,
    ) -> List[np.ndarray]:
        """Batched synthesis of pre-tokenized sequences → list of wavs.

        Sequences longer than the largest text bucket are transparently
        chunked, synthesized piecewise, and concatenated — no text is
        dropped (fixes the silent truncation flagged in round 1)."""
        cap = self.text_buckets[-1]
        chunked: List[List[int]] = []
        owner: List[int] = []  # flat index → original sequence index
        for i, s in enumerate(id_seqs):
            pieces = _chunk_ids(s, cap)
            if len(pieces) > 1:
                logger.warning(
                    "synthesize_ids: sequence %d (%d ids) exceeds the "
                    "largest text bucket (%d); splitting into %d chunks.",
                    i, len(s), cap, len(pieces),
                )
            for p in pieces:
                chunked.append(p)
                owner.append(i)
        handle = self.submit_ids(
            chunked, [speaker_ids[i] for i in owner],
            noise_scale=noise_scale, noise_scale_w=noise_scale_w,
            length_scale=length_scale, rng=rng, pcm16=pcm16,
        )
        out_dtype = np.int16 if pcm16 else np.float32
        flat = self.collect(handle, self.hop_length, dtype=out_dtype)
        if len(flat) == len(id_seqs):
            return flat
        joined: List[List[np.ndarray]] = [[] for _ in id_seqs]
        for w, i in zip(flat, owner):
            joined[i].append(w)
        return [np.concatenate(ws) for ws in joined]

    def tts(
        self,
        text: str,
        speaker=0,
        language: Optional[str] = None,
        speed: float = 1.0,
        noise_scale: float = 0.667,
        noise_scale_w: float = 0.8,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[int, np.ndarray]:
        """Single-utterance API, Gradio-parity semantics
        (reference ``VC_inference.py:39-51``)."""
        ids = self.text_to_ids(text, language)
        wavs = self.synthesize_ids(
            [ids],
            [self.speaker_id(speaker)],
            noise_scale=noise_scale,
            noise_scale_w=noise_scale_w,
            length_scale=1.0 / speed,
            rng=rng,
        )
        return self.sampling_rate, wavs[0]

    def split_sentences(self, text: str) -> List[str]:
        parts = [p.strip() for p in _SENTENCE_SPLIT.split(text)]
        return [p for p in parts if p]

    def stream_long_form(
        self,
        text: str,
        speaker=0,
        language: Optional[str] = None,
        speed: float = 1.0,
        chunk_frames: Optional[int] = None,
        **kwargs,
    ):
        """Generator yielding ``(sr, wav)`` per sentence as soon as each is
        ready, pipelining the next sentence's synthesis against the current
        fetch — streaming playback starts after the first sentence instead
        of after the whole document.

        With ``chunk_frames`` set, each sentence additionally streams
        WITHIN itself via ``stream_tts`` (fixed-frame chunks, halo-exact
        seams) — first audio lands after one chunk, not one sentence."""
        if chunk_frames is not None:
            for sent in self.split_sentences(text) or [text]:
                yield from self.stream_tts(
                    sent, speaker=speaker, language=language, speed=speed,
                    chunk_frames=chunk_frames, **kwargs,
                )
            return
        sentences = self.split_sentences(text) or [text]
        sid = self.speaker_id(speaker)
        pending = self.submit_ids(
            [self.text_to_ids(sentences[0], language)], [sid],
            length_scale=1.0 / speed, **kwargs,
        )
        for nxt in sentences[1:]:
            nxt_handle = self.submit_ids(
                [self.text_to_ids(nxt, language)], [sid],
                length_scale=1.0 / speed, **kwargs,
            )
            yield self.sampling_rate, self.collect(pending, self.hop_length)[0]
            pending = nxt_handle
        yield self.sampling_rate, self.collect(pending, self.hop_length)[0]

    def long_form(
        self,
        text: str,
        speaker=0,
        language: Optional[str] = None,
        speed: float = 1.0,
        pause_ms: float = 120.0,
        **kwargs,
    ) -> Tuple[int, np.ndarray]:
        """Long-form synthesis: sentence split → one bucketed batch →
        concatenate with inter-sentence pauses."""
        sentences = self.split_sentences(text) or [text]
        sid = self.speaker_id(speaker)
        id_seqs = [self.text_to_ids(s, language) for s in sentences]
        wavs = self.synthesize_ids(
            id_seqs,
            [sid] * len(id_seqs),
            length_scale=1.0 / speed,
            **kwargs,
        )
        pause = np.zeros(int(self.sampling_rate * pause_ms / 1000.0), np.float32)
        pieces: List[np.ndarray] = []
        for i, w in enumerate(wavs):
            pieces.append(w)
            if i != len(wavs) - 1:
                pieces.append(pause)
        return self.sampling_rate, np.concatenate(pieces)

    # ------------------------------------------------------------------
    # within-sentence streaming: the latent canvas z_p is per-frame
    # independent (only the flow reverse + HiFi-GAN tail are convolutional),
    # so audio streams out in fixed-size frame chunks decoded with a halo
    # overlap — time-to-first-audio stops scaling with sentence length
    # ------------------------------------------------------------------
    def _expand_fn(self, t_bucket: int, f_bucket: int, halo: int, chunk: int):
        key = ("expand", t_bucket, f_bucket, halo, chunk)
        if key not in self._decode_fns:
            model = self.model

            @functools.partial(
                jax.jit, static_argnames=("max_len", "halo", "chunk")
            )
            def run(params, w_ceil, m_p, logs_p, x_mask, noise_scale, rng,
                    max_len, halo, chunk):
                rng = jax.random.fold_in(_as_key(rng), 1)
                prior_noise = jax.random.normal(
                    rng, (m_p.shape[0], max_len, m_p.shape[-1]),
                    dtype=jnp.float32,
                )
                z_p, y_mask, y_lengths = model.apply(
                    params, w_ceil, m_p, logs_p, x_mask,
                    noise_scale=noise_scale, max_len=max_len,
                    prior_noise=prior_noise, method=model.infer_expand,
                )
                # pad so every chunk slice [start, start+chunk+2H) is in
                # bounds without dynamic_slice clamping: halo zeros in
                # front, halo+chunk zeros behind
                z_p = jnp.pad(z_p, ((0, 0), (halo, halo + chunk), (0, 0)))
                y_mask = jnp.pad(
                    y_mask, ((0, 0), (halo, halo + chunk), (0, 0))
                )
                return z_p, y_mask, y_lengths

            self._decode_fns[key] = functools.partial(
                run, max_len=f_bucket, halo=halo, chunk=chunk
            )
        return self._decode_fns[key]

    def _chunk_decode_fn(self, halo: int, chunk: int):
        key = ("chunk", halo, chunk)
        if key not in self._decode_fns:
            model = self.model
            size = chunk + 2 * halo

            @jax.jit
            def run(params, z_p_pad, y_mask_pad, sid, start):
                # start is in PADDED coordinates (= original start index)
                zs = jax.lax.dynamic_slice_in_dim(z_p_pad, start, size, 1)
                ms = jax.lax.dynamic_slice_in_dim(y_mask_pad, start, size, 1)
                wav = model.apply(
                    params, zs, ms, sid, method=model.decode_frames
                )
                return wav

            self._decode_fns[key] = run
        return self._decode_fns[key]

    def stream_tts(
        self,
        text: str,
        speaker=0,
        language: Optional[str] = None,
        speed: float = 1.0,
        noise_scale: float = 0.667,
        noise_scale_w: float = 0.8,
        chunk_frames: int = 96,
        halo_frames: int = 64,
        rng: Optional[jax.Array] = None,
    ):
        """Generator yielding ``(sr, wav_piece)`` every ``chunk_frames``
        frames (~``chunk_frames·hop/sr`` seconds of audio) WITHIN a
        sentence.  The pieces concatenate to exactly the monolithic
        render (seam test in ``tests/test_engine.py``); the halo covers
        the flow + HiFi-GAN receptive field across chunk edges."""
        if rng is None:
            rng = self._next_rng()
        all_ids = self.text_to_ids(text, language)
        sid = np.asarray([self.speaker_id(speaker)], np.int32)
        hop = self.hop_length
        # over-bucket text streams piece by piece — never truncated
        for ids in _chunk_ids(all_ids, self.text_buckets[-1]):
            t_bucket = _next_bucket(len(ids), self.text_buckets)
            x = np.zeros((1, t_bucket), dtype=np.int32)
            x[0, : len(ids)] = ids
            x_lengths = np.asarray([len(ids)], np.int32)

            w_ceil, m_p, logs_p, x_mask, n_frames_dev = self._encode_fn(
                t_bucket
            )(
                self.params, x, x_lengths, sid,
                np.float32(1.0 / speed), np.float32(noise_scale_w), rng,
            )
            n_frames = int(n_frames_dev)
            f_bucket = _next_bucket(max(n_frames, 1), self.frame_buckets)
            n_frames = min(n_frames, f_bucket)
            z_p_pad, y_mask_pad, _ = self._expand_fn(
                t_bucket, f_bucket, halo_frames, chunk_frames
            )(self.params, w_ceil, m_p, logs_p, x_mask,
              np.float32(noise_scale), rng)

            decode = self._chunk_decode_fn(halo_frames, chunk_frames)
            pending = None  # submit chunk i+1 before fetching chunk i
            pending_take = 0
            for start in range(0, n_frames, chunk_frames):
                handle = decode(
                    self.params, z_p_pad, y_mask_pad, sid, np.int32(start)
                )
                take = min(chunk_frames, n_frames - start)
                if pending is not None:
                    wav = np.asarray(jax.device_get(pending))
                    yield self.sampling_rate, wav[
                        0,
                        halo_frames * hop : (halo_frames + pending_take) * hop,
                    ]
                pending, pending_take = handle, take
            if pending is not None:
                wav = np.asarray(jax.device_get(pending))
                yield self.sampling_rate, wav[
                    0, halo_frames * hop : (halo_frames + pending_take) * hop
                ]

    # ------------------------------------------------------------------
    # fused low-latency path: encoder+duration+decode in ONE program, no
    # mid-pipeline host sync — the frame canvas is chosen from a
    # frames-per-token heuristic instead of the predicted length; if the
    # prediction saturates the canvas (rare), fall back to the two-stage
    # path for a correct full render
    # ------------------------------------------------------------------
    def _fused_fn(self, t_bucket: int, f_bucket: int):
        key = ("fused", t_bucket, f_bucket)
        if key not in self._decode_fns:
            model = self.model

            @functools.partial(jax.jit, static_argnames=("max_len",))
            def run(params, x, x_lengths, sid, noise_scale, length_scale,
                    noise_scale_w, rng, max_len):
                k = jax.random.fold_in(_as_key(rng), 3)
                dp_noise = jax.random.normal(
                    k, (x.shape[0], x.shape[1], 2), dtype=jnp.float32
                )
                prior_noise = jax.random.normal(
                    jax.random.fold_in(k, 1),
                    (x.shape[0], max_len, model.inter_channels),
                    dtype=jnp.float32,
                )
                wav, y_lengths, _, _ = model.apply(
                    params, x, x_lengths, sid,
                    method=model.infer,
                    noise_scale=noise_scale, length_scale=length_scale,
                    noise_scale_w=noise_scale_w, max_len=max_len,
                    dp_noise=dp_noise, prior_noise=prior_noise,
                )
                return wav, y_lengths

            self._decode_fns[key] = functools.partial(run, max_len=f_bucket)
        return self._decode_fns[key]

    def tts_low_latency(
        self,
        text: str,
        speaker=0,
        language: Optional[str] = None,
        speed: float = 1.0,
        noise_scale: float = 0.667,
        noise_scale_w: float = 0.8,
        frames_per_token: float = 2.5,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[int, np.ndarray]:
        """Single-dispatch synthesis (one device round trip).  With blank
        interspersal, real speech runs ~2 frames/token, so the default
        2.5 frames/token canvas carries ~25% headroom; saturation (or an
        over-bucket text) falls back to the exact two-stage path, which
        chunks instead of truncating."""
        if rng is None:
            rng = self._next_rng()
        ids = self.text_to_ids(text, language)
        if len(ids) > self.text_buckets[-1]:
            return self.tts(
                text, speaker=speaker, language=language, speed=speed,
                noise_scale=noise_scale, noise_scale_w=noise_scale_w, rng=rng,
            )
        sid = np.asarray([self.speaker_id(speaker)], np.int32)
        t_bucket = _next_bucket(len(ids), self.text_buckets)
        f_bucket = _next_bucket(
            max(int(len(ids) * frames_per_token / speed), 1),
            self.frame_buckets,
        )
        x = np.zeros((1, t_bucket), dtype=np.int32)
        x[0, : len(ids)] = ids
        wav, y_lengths = self._fused_fn(t_bucket, f_bucket)(
            self.params, x, np.asarray([len(ids)], np.int32), sid,
            np.float32(noise_scale), np.float32(1.0 / speed),
            np.float32(noise_scale_w), rng,
        )
        wav = np.asarray(jax.device_get(wav), dtype=np.float32)
        n = int(y_lengths[0])
        if n >= f_bucket:  # canvas saturated → exact re-render
            return self.tts(
                text, speaker=speaker, language=language, speed=speed,
                noise_scale=noise_scale, noise_scale_w=noise_scale_w, rng=rng,
            )
        return self.sampling_rate, wav[0, : n * self.hop_length]

    # ------------------------------------------------------------------
    # voice conversion (reference models.py:525-533 — API the reference
    # defines but never wires into its UI; exposed here end-to-end)
    # ------------------------------------------------------------------
    def _vc_fn(self, f_bucket: int):
        key = ("vc", f_bucket)
        if key not in self._decode_fns:
            model = self.model
            from personalized_text_to_speech_tpu.ops.spectrogram import (
                MelConfig,
                linear_spectrogram,
            )

            mel_cfg = MelConfig.from_hparams(self.hps)

            @jax.jit
            def run(params, wav, wav_len, sid_src, sid_tgt, rng):
                rng = _as_key(rng)
                spec = linear_spectrogram(wav, mel_cfg)
                spec_len = (wav_len // mel_cfg.hop_length).astype(jnp.int32)
                noise = jax.random.normal(
                    jax.random.fold_in(rng, 2), spec.shape[:2] + (model.inter_channels,)
                )
                o, y_mask, _ = model.apply(
                    params, spec, spec_len, sid_src, sid_tgt,
                    method=model.voice_conversion, noise=noise,
                )
                return o, spec_len

            self._decode_fns[key] = run
        return self._decode_fns[key]

    def voice_conversion(
        self, wav: np.ndarray, speaker_src, speaker_tgt,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[int, np.ndarray]:
        """Convert a waveform from one known speaker's voice to another's
        (posterior-encode with the source embedding, flow round-trip,
        decode with the target embedding)."""
        if rng is None:
            rng = self._next_rng()
        hop = self.hop_length
        n = (len(wav) // hop) * hop
        f_bucket = _next_bucket(max(n // hop, 1), self.frame_buckets)
        padded = np.zeros((1, f_bucket * hop), dtype=np.float32)
        padded[0, :n] = wav[:n]
        o, spec_len = self._vc_fn(f_bucket)(
            self.params, padded, np.asarray([n], np.int32),
            np.asarray([self.speaker_id(speaker_src)], np.int32),
            np.asarray([self.speaker_id(speaker_tgt)], np.int32),
            rng,
        )
        out = np.asarray(jax.device_get(o), dtype=np.float32)[0]
        return self.sampling_rate, out[: int(spec_len[0]) * hop]

    # ------------------------------------------------------------------
    def warmup(self, text_bucket: Optional[int] = None) -> float:
        """Trigger compilation for a representative bucket; returns seconds."""
        t0 = time.perf_counter()
        self.tts("Warm up.", speaker=0, language="English")
        return time.perf_counter() - t0
