"""CLI-level tests: drive the tools as subprocesses like a user would."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tool(args, cwd=None, timeout=900):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable] + args,
        capture_output=True,
        text=True,
        cwd=cwd or REPO,
        env=env,
        timeout=timeout,
    )


@pytest.fixture(scope="module")
def tiny_config(tmp_path_factory):
    from personalized_text_to_speech_tpu.config import save_hparams
    from tests.test_engine import tiny_engine_hps
    from personalized_text_to_speech_tpu.text.symbols import SYMBOLS

    hps = tiny_engine_hps()
    hps["symbols"] = list(SYMBOLS)
    path = str(tmp_path_factory.mktemp("cfg") / "tiny.json")
    save_hparams(hps, path)
    return path


class TestTTSCli:
    def test_random_init_synthesis(self, tiny_config, tmp_path):
        out_dir = str(tmp_path / "out")
        r = run_tool(
            ["tools/tts.py", "-c", tiny_config, "--random-init",
             "-t", "Hello there.", "-l", "English", "-s", "alice",
             "-o", out_dir, "-on", "test"]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        wav_path = os.path.join(out_dir, "test.wav")
        assert os.path.exists(wav_path)
        from personalized_text_to_speech_tpu.data.audio import load_wav

        wav, sr = load_wav(wav_path)
        assert sr == 8000
        assert wav.shape[-1] > 0

    def test_missing_model_flag_errors(self, tiny_config):
        r = run_tool(["tools/tts.py", "-c", tiny_config, "-t", "hi"])
        assert r.returncode != 0
        assert "random-init" in (r.stderr + r.stdout)


class TestPreprocessCli:
    def test_builds_annotations_and_config(self, tmp_path):
        work = tmp_path
        (work / "configs").mkdir()
        anno = work / "short_character_anno.txt"
        anno.write_text(
            "a.wav|spk1|[EN]hello there[EN]\n"
            "b.wav|spk2|[EN]good morning[EN]\n",
            encoding="utf-8",
        )
        r = run_tool(
            ["tools/preprocess.py".replace("tools/", REPO + "/tools/")],
            cwd=str(work),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        train = (work / "final_annotation_train.txt").read_text(encoding="utf-8")
        lines = [l for l in train.strip().split("\n") if l]
        assert len(lines) == 2
        path, sid, text = lines[0].split("|")
        assert sid in ("0", "1")
        assert "[EN]" not in text  # cleaned to IPA
        cfg = json.loads(
            (work / "configs/modified_finetune_speaker.json").read_text()
        )
        assert cfg["data"]["n_speakers"] == 2
        assert set(cfg["speakers"]) == {"spk1", "spk2"}


class TestEvalVcCli:
    def test_parallel_pairs_scored(self, tiny_config, tmp_path):
        import jax

        from personalized_text_to_speech_tpu.config import load_hparams
        from personalized_text_to_speech_tpu.data.audio import save_wav
        from personalized_text_to_speech_tpu.infer.engine import TTSEngine
        from personalized_text_to_speech_tpu.utils import torch_compat as tc

        hps = load_hparams(tiny_config)
        engine = TTSEngine(hps)
        model_path = str(tmp_path / "G_test.pth")
        tc.save_torch_checkpoint(
            jax.device_get(engine.params), model_path, iteration=1
        )

        sr = hps.data.sampling_rate
        t = np.linspace(0, 0.5, sr // 2, endpoint=False)
        anno_lines = []
        for sid, f0 in ((0, 150), (1, 260)):
            wav = (0.3 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
            p = str(tmp_path / f"spk{sid}.wav")
            save_wav(p, wav, sr)
            anno_lines.append(f"{p}|{sid}|həloʊ ðɛɹ.")
        anno = tmp_path / "anno.txt"
        anno.write_text("\n".join(anno_lines) + "\n", encoding="utf-8")

        out_json = str(tmp_path / "vc.json")
        r = run_tool(
            [REPO + "/tools/eval_vc.py", "--model", model_path,
             "--config", tiny_config, "--annotations", str(anno),
             "--src", "0", "--tgt", "1", "--out_json", out_json]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        data = json.loads(open(out_json).read())
        assert data["n_pairs"] == 1
        for key in ("converted_vs_target_median", "unconverted_vs_target_median"):
            assert np.isfinite(data[key]["MCD"])


class TestRearrangeSpeakerCli:
    def test_compacts_and_emits_moegoe(self, tiny_config, tmp_path):
        import jax

        from personalized_text_to_speech_tpu.config import (
            load_hparams, save_hparams,
        )
        from personalized_text_to_speech_tpu.infer.engine import TTSEngine
        from personalized_text_to_speech_tpu.utils import torch_compat as tc

        hps = load_hparams(tiny_config)
        engine = TTSEngine(hps)
        model_path = str(tmp_path / "G.pth")
        tc.save_torch_checkpoint(jax.device_get(engine.params), model_path)
        # config keeping only 2 of the 4 speakers, shuffled ids
        hps["speakers"] = {"carol": 3, "alice": 0}
        cfg_path = str(tmp_path / "cfg.json")
        save_hparams(hps, cfg_path)

        out_model = str(tmp_path / "G_compact.pth")
        out_cfg = str(tmp_path / "compact.json")
        out_moegoe = str(tmp_path / "moegoe.json")
        r = run_tool(
            [REPO + "/tools/rearrange_speaker.py", "--model_dir", model_path,
             "--config_dir", cfg_path, "--out_model", out_model,
             "--out_config", out_cfg, "--out_moegoe", out_moegoe]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        cfg = json.loads(open(out_cfg).read())
        assert cfg["speakers"] == {"alice": 0, "carol": 1}
        assert cfg["data"]["n_speakers"] == 2
        moegoe = json.loads(open(out_moegoe).read())
        assert moegoe["speakers"] == ["alice", "carol"]
        import torch

        sd = torch.load(out_model, map_location="cpu", weights_only=False)
        assert sd["model"]["emb_g.weight"].shape[0] == 2


class TestEvalPairCli:
    def test_metrics_printed(self, tmp_path):
        from personalized_text_to_speech_tpu.data.audio import save_wav

        sr = 22050
        t = np.linspace(0, 0.6, int(sr * 0.6))
        wav = (0.4 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
        ref = str(tmp_path / "ref.wav")
        syn = str(tmp_path / "syn.wav")
        save_wav(ref, wav, sr)
        save_wav(syn, wav * 0.9, sr)
        r = run_tool(
            [REPO + "/tools/eval_pair.py", "--ref_wav", ref, "--syn_wav", syn]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "MCD:" in r.stdout
        assert "mrstft_sc:" in r.stdout
