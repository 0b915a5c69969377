"""Execute the Whisper transcription branch with a stubbed processor/model.

No Whisper weights exist in this environment, so ``tools/transcribe.py``'s
``transcribe_one`` (parity with the reference
scripts/short_audio_transcribe.py:13-32) would otherwise never run.  These
tests drive the real code — feature extraction call, beam-search generate
call, decode, language-token sniffing, tag wrapping, file walking, resample
+ processed-wav emission — against a minimal stub implementing the exact
WhisperProcessor/WhisperForConditionalGeneration API surface used.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_transcribe_module():
    spec = importlib.util.spec_from_file_location(
        "transcribe_tool", os.path.join(REPO, "tools", "transcribe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class StubProcessor:
    """Implements the WhisperProcessor surface ``transcribe_one`` touches."""

    def __init__(self, lang="ja", text="こんにちは"):
        self.lang = lang
        self.text = text
        self.calls = []

    def __call__(self, wav, sampling_rate=None, return_tensors=None):
        self.calls.append(("features", len(wav), sampling_rate, return_tensors))
        import torch

        feat = types.SimpleNamespace(
            input_features=torch.zeros((1, 80, 3000))
        )
        return feat

    def batch_decode(self, ids, skip_special_tokens=True):
        if skip_special_tokens:
            return [f"  {self.text}  "]
        return [
            f"<|startoftranscript|><|{self.lang}|><|transcribe|> {self.text}"
        ]


class StubModel:
    def __init__(self):
        self.calls = []

    def generate(self, input_features, num_beams=1):
        self.calls.append(("generate", tuple(input_features.shape), num_beams))
        return "ids-token-tensor"


class TestTranscribeOne:
    def test_ja_detection_and_strip(self):
        tr = _load_transcribe_module()
        proc, model = StubProcessor("ja", "こんにちは"), StubModel()
        wav = np.zeros(16000, np.float32)
        lang, text = tr.transcribe_one(proc, model, wav, 16000)
        assert (lang, text) == ("ja", "こんにちは")
        # features built at the whisper rate; beam search requested
        assert proc.calls[0] == ("features", 16000, 16000, "pt")
        assert model.calls[0][2] == 5

    def test_language_fallback_en(self):
        tr = _load_transcribe_module()
        proc = StubProcessor("fr", "bonjour")  # fr isn't a tagged language
        lang, text = tr.transcribe_one(
            proc, StubModel(), np.zeros(8, np.float32), 16000
        )
        assert lang == "en"  # unknown languages fall back to EN tagging
        assert text == "bonjour"


class TestTranscribeMain:
    def _mk_corpus(self, root):
        from personalized_text_to_speech_tpu.data.audio import save_wav

        for spk in ("spk_a", "spk_b"):
            d = os.path.join(root, spk)
            os.makedirs(d)
            t = np.linspace(0, 0.3, 4800, dtype=np.float32)
            save_wav(
                os.path.join(d, "clip0.wav"),
                (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
                16000,
            )

    def test_main_with_stub_whisper(self, tmp_path, monkeypatch):
        tr = _load_transcribe_module()
        in_dir = str(tmp_path / "voices")
        os.makedirs(in_dir)
        self._mk_corpus(in_dir)
        out_file = str(tmp_path / "anno.txt")

        monkeypatch.setattr(
            tr, "load_whisper",
            lambda path: (StubProcessor("zh", "你好世界"), StubModel()),
        )
        monkeypatch.setattr(
            sys, "argv",
            ["transcribe.py", "--in_dir", in_dir, "--out_file", out_file,
             "--whisper_model", in_dir],  # any existing dir satisfies the check
        )
        tr.main()

        lines = open(out_file, encoding="utf-8").read().splitlines()
        assert len(lines) == 2
        for line in lines:
            path, spk, text = line.split("|")
            assert os.path.exists(path) and "processed_" in path
            assert spk in ("spk_a", "spk_b")
            # reference tag format: [ZH]text[ZH]
            # (scripts/short_audio_transcribe.py:58-66)
            assert text == "[ZH]你好世界[ZH]"

    def test_main_annotate_only(self, tmp_path, monkeypatch):
        tr = _load_transcribe_module()
        in_dir = str(tmp_path / "voices")
        os.makedirs(in_dir)
        self._mk_corpus(in_dir)
        out_file = str(tmp_path / "anno.txt")
        monkeypatch.setattr(
            sys, "argv",
            ["transcribe.py", "--in_dir", in_dir, "--out_file", out_file,
             "--annotate-only"],
        )
        tr.main()
        lines = open(out_file, encoding="utf-8").read().splitlines()
        assert len(lines) == 2 and all(l.endswith("|") for l in lines)
