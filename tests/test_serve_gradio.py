"""Execute the Gradio serving branch against a stub ``gradio`` module.

gradio isn't installed in this environment, so ``tools/serve.py``'s
``serve_gradio`` (parity with the reference Blocks app,
reference VC_inference.py:77-99) would otherwise be dead code here.  This
installs a minimal fake implementing exactly the API surface the app uses
(Blocks/Markdown/Tab/Row/Column/TextArea/Dropdown/Slider/Textbox/Audio/
Button + click wiring + launch) and drives the wired ``tts_fn`` through a
real (tiny, CPU) engine — the whole branch runs, end to end.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_serve_module():
    spec = importlib.util.spec_from_file_location(
        "serve_tool", os.path.join(REPO, "tools", "serve.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Ctx:
    """Context-manager component (Blocks/Tab/Row/Column)."""

    def __init__(self, *a, **k):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _Component:
    def __init__(self, *a, **k):
        self.kwargs = k


class _Button(_Component):
    clicks = []  # (fn, inputs, outputs) wiring captured for the test

    def click(self, fn, inputs=None, outputs=None):
        _Button.clicks.append((fn, inputs, outputs))


class _Blocks(_Ctx):
    launches = []

    def launch(self, share=False, server_port=None, **k):
        _Blocks.launches.append({"share": share, "server_port": server_port})


def _make_fake_gradio():
    gr = types.ModuleType("gradio")
    gr.Blocks = _Blocks
    gr.Tab = _Ctx
    gr.Row = _Ctx
    gr.Column = _Ctx
    gr.Markdown = _Component
    gr.TextArea = _Component
    gr.Dropdown = _Component
    gr.Slider = _Component
    gr.Textbox = _Component
    gr.Audio = _Component
    gr.Button = _Button
    return gr


@pytest.fixture(scope="module")
def engine():
    from personalized_text_to_speech_tpu.infer.engine import TTSEngine
    from personalized_text_to_speech_tpu.text.symbols import SYMBOLS

    from tests.test_engine import tiny_engine_hps

    hps = tiny_engine_hps()
    hps["symbols"] = list(SYMBOLS)
    hps["speakers"] = {"alice": 0, "bob": 1}
    return TTSEngine(hps, dtype="float32")


class TestGradioBranch:
    def test_serve_gradio_builds_ui_and_synthesizes(self, engine, monkeypatch):
        serve = _load_serve_module()
        monkeypatch.setitem(sys.modules, "gradio", _make_fake_gradio())
        _Button.clicks.clear()
        _Blocks.launches.clear()

        args = types.SimpleNamespace(share=False, port=7860)
        serve.serve_gradio(engine, args)

        # the app got built and launched with the CLI's port
        assert _Blocks.launches == [{"share": False, "server_port": 7860}]
        # one Generate button wired with 4 inputs / 2 outputs
        # (text, speaker, language, speed → message, audio;
        #  reference VC_inference.py:86-99)
        assert len(_Button.clicks) == 1
        fn, inputs, outputs = _Button.clicks[0]
        assert len(inputs) == 4 and len(outputs) == 2

        # drive the wired callback through the real engine
        msg, (sr, wav) = fn("Hello there.", "alice", "English", 1.0)
        assert msg == "Success"
        assert sr == engine.sampling_rate
        wav = np.asarray(wav)
        assert wav.ndim == 1 and wav.size > 0
        assert np.isfinite(wav).all()

    def test_speaker_and_language_choices_from_engine(self, engine, monkeypatch):
        serve = _load_serve_module()
        fake = _make_fake_gradio()

        captured = {}

        class SpyDropdown(_Component):
            def __init__(self, *a, **k):
                super().__init__(*a, **k)
                captured.setdefault("dropdowns", []).append(k)

        fake.Dropdown = SpyDropdown
        monkeypatch.setitem(sys.modules, "gradio", fake)
        _Button.clicks.clear()
        _Blocks.launches.clear()

        serve.serve_gradio(engine, types.SimpleNamespace(share=True, port=1234))
        assert _Blocks.launches == [{"share": True, "server_port": 1234}]
        by_label = {d.get("label"): d for d in captured["dropdowns"]}
        assert by_label["character"]["choices"] == ["alice", "bob"]
        assert by_label["language"]["choices"] == [
            "English", "Chinese", "Japanese", "Mix",
        ]
