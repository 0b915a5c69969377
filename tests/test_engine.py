"""TTSEngine + dataset pipeline tests on a tiny config (CPU-fast)."""

import os

import jax
import numpy as np
import pytest

from personalized_text_to_speech_tpu.config import load_hparams_from_dict
from personalized_text_to_speech_tpu.data.audio import load_wav, save_wav
from personalized_text_to_speech_tpu.data.dataset import (
    BucketBatcher,
    DatasetConfig,
    TextAudioSpeakerDataset,
)
from personalized_text_to_speech_tpu.infer.engine import TTSEngine, _next_bucket


def tiny_engine_hps():
    # shared toy geometry — single source of truth in the library so CPU
    # benches (tools/bench_serve.py --tiny) and tests stay in sync
    from personalized_text_to_speech_tpu.config import tiny_model_config

    return tiny_model_config(n_speakers=4)


@pytest.fixture(scope="module")
def engine():
    from personalized_text_to_speech_tpu.text.symbols import SYMBOLS

    hps = tiny_engine_hps()
    hps["symbols"] = list(SYMBOLS)
    return TTSEngine(hps, dtype="float32")


class TestBuckets:
    def test_next_bucket(self):
        assert _next_bucket(3, [16, 32]) == 16
        assert _next_bucket(17, [16, 32]) == 32
        assert _next_bucket(99, [16, 32]) == 32  # clamps to largest


class TestEngine:
    def test_tts_end_to_end(self, engine):
        sr, wav = engine.tts("Hi there.", speaker="alice", language="English")
        assert sr == 8000
        assert wav.ndim == 1 and len(wav) > 0
        assert len(wav) % engine.hop_length == 0
        assert np.isfinite(wav).all()

    def test_speaker_by_id_and_name(self, engine):
        assert engine.speaker_id("bob") == 1
        assert engine.speaker_id(3) == 3
        with pytest.raises(KeyError):
            engine.speaker_id("nobody")

    def test_bucket_reuse_no_recompile(self, engine):
        # identical request → same buckets → jit cache hit (no new entries)
        k = jax.random.PRNGKey(3)
        engine.tts("One two.", speaker=0, language="English", rng=k)
        n_before = len(engine._encode_fns), len(engine._decode_fns)
        engine.tts("One two.", speaker=1, language="English", rng=k)
        assert (len(engine._encode_fns), len(engine._decode_fns)) == n_before

    def test_batch_synthesis(self, engine):
        ids = [engine.text_to_ids("Hello.", "English"),
               engine.text_to_ids("Bye bye now.", "English")]
        wavs = engine.synthesize_ids(ids, [0, 1])
        assert len(wavs) == 2
        assert all(np.isfinite(w).all() for w in wavs)

    def test_long_form(self, engine):
        sr, wav = engine.long_form(
            "First bit. Second bit! Third?", speaker="alice", language="English"
        )
        assert len(wav) > 0

    def test_rng_determinism(self, engine):
        k = jax.random.PRNGKey(7)
        _, a = engine.tts("Same words.", speaker=0, language="English", rng=k)
        _, b = engine.tts("Same words.", speaker=0, language="English", rng=k)
        np.testing.assert_array_equal(a, b)


class TestDataset:
    @pytest.fixture()
    def filelist(self, tmp_path):
        sr = 8000
        rng = np.random.default_rng(0)
        lines = []
        for i in range(6):
            n = int(sr * rng.uniform(0.3, 0.9))
            wav = (0.3 * np.sin(np.linspace(0, 200, n))).astype(np.float32)
            p = tmp_path / f"a{i}.wav"
            save_wav(str(p), wav, sr)
            lines.append(f"{p}|{i % 2}|ab ko→ no↓ da.")
        fl = tmp_path / "filelist.txt"
        fl.write_text("\n".join(lines), encoding="utf-8")
        return str(fl)

    def test_dataset_and_batcher(self, filelist):
        cfg = DatasetConfig(sampling_rate=8000, hop_length=64)
        from personalized_text_to_speech_tpu.text.symbols import SYMBOLS

        ds = TextAudioSpeakerDataset(filelist, cfg, SYMBOLS)
        assert len(ds) == 6
        item = ds[0]
        assert item["text"].dtype == np.int32
        assert item["text"][0] == 0  # interspersed blank
        assert item["wav"].dtype == np.float32

        batcher = BucketBatcher(
            ds, batch_size=2, boundaries=(2, 50, 100, 200),
            text_pad_to=(16, 32), shard_index=0, shard_count=1,
        )
        batches = list(batcher)
        assert len(batches) == len(batcher)
        for b in batches:
            assert b["text"].shape[0] == 2
            assert b["wav"].shape[1] % 64 == 0
            # static bucket shapes
            assert b["wav"].shape[1] // 64 in (50, 100, 200)
            assert (b["wav_lengths"] % 64 == 0).all()
            assert (b["wav_lengths"] <= b["wav"].shape[1]).all()

    def test_sharding_partitions(self, filelist):
        cfg = DatasetConfig(sampling_rate=8000, hop_length=64)
        from personalized_text_to_speech_tpu.text.symbols import SYMBOLS

        ds = TextAudioSpeakerDataset(filelist, cfg, SYMBOLS)
        b0 = BucketBatcher(ds, 1, boundaries=(2, 200), shard_index=0,
                           shard_count=2)
        b1 = BucketBatcher(ds, 1, boundaries=(2, 200), shard_index=1,
                           shard_count=2)
        n0, n1 = len(b0), len(b1)
        assert n0 == n1  # equal batch counts per shard

    def test_epoch_reshuffle(self, filelist):
        cfg = DatasetConfig(sampling_rate=8000, hop_length=64)
        from personalized_text_to_speech_tpu.text.symbols import SYMBOLS

        ds = TextAudioSpeakerDataset(filelist, cfg, SYMBOLS)
        b = BucketBatcher(ds, 2, boundaries=(2, 200))
        b.set_epoch(0)
        e0 = [idx for _, idx in b.batch_indices()]
        b.set_epoch(1)
        e1 = [idx for _, idx in b.batch_indices()]
        assert e0 != e1


class TestAudioIO:
    def test_wav_roundtrip(self, tmp_path):
        sr = 8000
        wav = (0.5 * np.sin(np.linspace(0, 100, 4000))).astype(np.float32)
        p = str(tmp_path / "x.wav")
        save_wav(p, wav, sr)
        back, sr2 = load_wav(p)
        assert sr2 == sr
        assert np.abs(back[0] - wav).max() < 1e-3  # 16-bit quantization


class TestAsyncAndPcm:
    def test_submit_collect_pipeline(self, engine):
        ids = [engine.text_to_ids("Hello.", "English")]
        h1 = engine.submit_ids(ids, [0], rng=jax.random.PRNGKey(1))
        h2 = engine.submit_ids(ids, [1], rng=jax.random.PRNGKey(2))
        w1 = engine.collect(h1, engine.hop_length)
        w2 = engine.collect(h2, engine.hop_length)
        assert len(w1) == 1 and len(w2) == 1
        assert w1[0].dtype == np.float32

    def test_pcm16_matches_float(self, engine):
        ids = [engine.text_to_ids("Quantize me.", "English")]
        k = jax.random.PRNGKey(5)
        wav_f = engine.synthesize_ids(ids, [0], rng=k)[0]
        wav_q = engine.synthesize_ids(ids, [0], rng=k, pcm16=True)[0]
        assert wav_q.dtype == np.int16
        assert len(wav_q) == len(wav_f)
        err = np.abs(wav_q.astype(np.float32) / 32767.0 - wav_f).max()
        assert err < 2.0 / 32767.0  # quantization-level agreement


class TestRobustness:
    def test_overlong_ids_chunked_full_audio(self, engine):
        # beyond the largest text bucket → chunked and synthesized in full:
        # the output must cover ALL tokens, not just the first bucket's worth
        long_ids = list(range(1, 60)) * 4  # 236 ids > bucket cap 64
        k = jax.random.PRNGKey(7)
        full = engine.synthesize_ids([long_ids], [0], rng=k)
        assert len(full) == 1
        head = engine.synthesize_ids([long_ids[:64]], [0], rng=k)
        # chunked output is strictly longer than one truncated bucket's audio
        assert len(full[0]) > len(head[0])

    def test_submit_ids_warns_on_truncation(self, engine, caplog):
        import logging as _logging

        long_ids = list(range(1, 60)) * 4
        with caplog.at_level(_logging.WARNING,
                             logger="personalized_text_to_speech_tpu.infer.engine"):
            engine.submit_ids([long_ids], [0])
        assert any("truncating" in r.message for r in caplog.records)

    def test_overlong_mixed_batch_order_preserved(self, engine):
        k = jax.random.PRNGKey(3)
        short = list(range(1, 20))
        long_ids = list(range(1, 60)) * 3  # 177 ids, chunks into 3
        wavs = engine.synthesize_ids([short, long_ids, short], [0, 1, 0], rng=k)
        # output count matches input count despite internal chunk fan-out,
        # and the chunked row is by far the longest (each row draws its own
        # duration noise, so exact equality between rows isn't expected)
        assert len(wavs) == 3
        assert all(len(w) > 0 for w in wavs)
        assert len(wavs[1]) > max(len(wavs[0]), len(wavs[2]))

    def test_unknown_language_autotags(self, engine):
        ids = engine.text_to_ids("bonjour monde", language="French")
        assert len(ids) > 0

    def test_is_symbol_skips_cleaners(self, engine):
        raw = "ni→xɑʊ↓"
        ids = engine.text_to_ids(raw, is_symbol=True)
        from personalized_text_to_speech_tpu.text import (
            cleaned_text_to_sequence,
            intersperse,
        )
        want = intersperse(cleaned_text_to_sequence(raw, engine.symbols), 0)
        assert ids == want


class TestStreaming:
    def test_stream_matches_monolithic(self, engine):
        """Chunked flow+vocoder with halo must concatenate to exactly the
        monolithic render — the seam-correctness contract."""
        k = jax.random.PRNGKey(11)
        text = "The quick brown fox."  # fits one text bucket → exact parity
        sr, full = engine.tts(text, speaker=0, language="English", rng=k)
        pieces = [
            w
            for _, w in engine.stream_tts(
                text, speaker=0, language="English", rng=k,
                chunk_frames=24, halo_frames=48,
            )
        ]
        assert len(pieces) >= 2, "want multiple chunks for a seam test"
        stream = np.concatenate(pieces)
        assert stream.shape == full.shape
        np.testing.assert_allclose(stream, full, atol=2e-4)

    def test_stream_first_chunk_short(self, engine):
        """First audio piece arrives after one chunk, not the whole render."""
        k = jax.random.PRNGKey(12)
        gen = engine.stream_tts(
            "Speech synthesis converts text into audible speech today.",
            speaker=1, language="English", rng=k,
            chunk_frames=16, halo_frames=32,
        )
        sr, first = next(gen)
        assert len(first) == 16 * engine.hop_length
        rest = sum(len(w) for _, w in gen)
        assert rest > 0


class TestVoiceConversion:
    def test_vc_end_to_end(self, engine):
        rng = np.random.default_rng(0)
        wav = (0.3 * np.sin(np.linspace(0, 300, 8000))).astype(np.float32)
        sr, out = engine.voice_conversion(wav, "alice", "bob")
        assert sr == 8000
        assert len(out) > 0
        assert np.isfinite(out).all()


class TestPrefetch:
    def test_iter_prefetch_matches_sync(self, tmp_path):
        from personalized_text_to_speech_tpu.text.symbols import SYMBOLS
        from personalized_text_to_speech_tpu.data.dataset import (
            BucketBatcher, DatasetConfig, TextAudioSpeakerDataset,
        )

        sr = 8000
        lines = []
        for i in range(4):
            w = (0.2 * np.sin(np.linspace(0, 100, sr // 2))).astype(np.float32)
            p = tmp_path / f"p{i}.wav"
            save_wav(str(p), w, sr)
            lines.append(f"{p}|0|abc de.")
        fl = tmp_path / "fl.txt"
        fl.write_text("\n".join(lines), encoding="utf-8")
        ds = TextAudioSpeakerDataset(
            str(fl), DatasetConfig(sampling_rate=sr, hop_length=64), SYMBOLS
        )
        b = BucketBatcher(ds, 2, boundaries=(2, 100, 200), shuffle=False)
        sync = [x["wav"].sum() for x in b]
        pre = [x["wav"].sum() for x in b.iter_prefetch()]
        assert sync == pre


class TestCheckpointLoading:
    def test_engine_loads_reference_pth(self, engine, tmp_path):
        """Save the engine's params as a reference .pth, load it into a new
        engine, and check identical synthesis output."""
        from personalized_text_to_speech_tpu.utils import torch_compat as tc
        from personalized_text_to_speech_tpu.text.symbols import SYMBOLS

        path = str(tmp_path / "G_test.pth")
        tc.save_torch_checkpoint(jax.device_get(engine.params), path)

        hps = tiny_engine_hps()
        hps["symbols"] = list(SYMBOLS)
        eng2 = TTSEngine(hps, checkpoint_path=path, dtype="float32")
        k = jax.random.PRNGKey(11)
        _, a = engine.tts("Check weights.", speaker=0, language="English", rng=k)
        _, b = eng2.tts("Check weights.", speaker=0, language="English", rng=k)
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestSentenceStreaming:
    def test_stream_long_form_order(self, engine):
        chunks = list(engine.stream_long_form(
            "One two. Three four! Five six?", speaker="alice",
            language="English",
        ))
        assert len(chunks) == 3
        for sr, wav in chunks:
            assert sr == 8000 and len(wav) > 0


class TestLowLatency:
    def test_fused_path_output(self, engine):
        sr, wav = engine.tts_low_latency(
            "Quick response please.", speaker="alice", language="English",
        )
        assert sr == 8000 and len(wav) > 0
        assert np.isfinite(wav).all()

    def test_saturation_fallback(self, engine):
        # force a tiny canvas so the prediction saturates → falls back to
        # the exact two-stage path (still correct output)
        sr, wav = engine.tts_low_latency(
            "This sentence is long enough to saturate.",
            speaker="bob", language="English", frames_per_token=0.05,
        )
        assert len(wav) > 0
