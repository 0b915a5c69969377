"""Tests for utils (profiling, runtime, config) and remaining cleaners."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestProfiling:
    def test_step_timer(self):
        from personalized_text_to_speech_tpu.utils.profiling import StepTimer
        import time

        t = StepTimer(warmup=1)
        for _ in range(4):
            t.start()
            time.sleep(0.01)
            t.stop()
        assert t.value is not None and t.value > 0.005
        assert t.steps_per_sec and t.steps_per_sec < 200

    def test_compiled_stats(self):
        from personalized_text_to_speech_tpu.utils.profiling import compiled_stats

        f = jax.jit(lambda a, b: a @ b)
        x = jnp.ones((64, 64))
        stats = compiled_stats(f, x, x)
        assert stats.get("flops", 0) > 0

    def test_check_git_hash(self, tmp_path):
        from personalized_text_to_speech_tpu.utils.profiling import check_git_hash

        h = check_git_hash(str(tmp_path))
        if h is not None:  # repo context
            assert (tmp_path / "githash").read_text().strip() == h
            # second call compares silently
            assert check_git_hash(str(tmp_path)) == h


class TestConfig:
    def test_round_trip(self, tmp_path):
        from personalized_text_to_speech_tpu.config import (
            default_model_config,
            load_hparams,
            save_hparams,
        )

        hps = default_model_config(n_speakers=7)
        hps["speakers"] = {"x": 0}
        p = str(tmp_path / "c.json")
        save_hparams(hps, p)
        back = load_hparams(p)
        assert back.data.n_speakers == 7
        assert back.speakers["x"] == 0
        assert back.model.hidden_channels == hps.model.hidden_channels
        assert "tpu" in back

    def test_replace(self):
        from personalized_text_to_speech_tpu.config import default_model_config

        hps = default_model_config()
        h2 = hps.replace(extra=1)
        assert h2.extra == 1
        assert "extra" not in hps


class TestMoreCleaners:
    def test_thai_numbers(self):
        from personalized_text_to_speech_tpu.text.thai import num_to_thai

        assert num_to_thai("2") == "สอง"
        assert num_to_thai("10") == "สิบ"
        assert num_to_thai("21") == "ยี่สิบเอ็ด"
        assert num_to_thai("105") == "หนึ่งร้อยห้า"

    def test_sanskrit_devanagari(self):
        from personalized_text_to_speech_tpu.text.sanskrit import devanagari_to_ipa

        out = devanagari_to_ipa("नमस्ते")
        # n-a-m-a-s-t-eː with virama suppressing the schwa on s
        assert out == "nəməsteː"

    def test_sanskrit_cleaner(self):
        from personalized_text_to_speech_tpu.text.cleaners import sanskrit_cleaners

        assert sanskrit_cleaners("ॐ").endswith("।")

    def test_cjks_pipeline(self):
        from personalized_text_to_speech_tpu.text.cleaners import cjks_cleaners

        out = cjks_cleaners("[EN]hello[EN]")
        assert "[EN]" not in out

    def test_zh_ja_mixture(self):
        from personalized_text_to_speech_tpu.text.cleaners import (
            zh_ja_mixture_cleaners,
        )

        out = zh_ja_mixture_cleaners("[ZH]你好[ZH]")
        assert "[ZH]" not in out and "ɥ" in out or len(out) > 0

    def test_japanese_cleaners2(self):
        from personalized_text_to_speech_tpu.text.cleaners import (
            japanese_cleaners2,
        )

        out = japanese_cleaners2("こんにちは")
        assert "ʦ" not in "こんにちは"  # conversion ran without error
        assert len(out) > 0

    def test_korean_cleaners(self):
        from personalized_text_to_speech_tpu.text.cleaners import korean_cleaners

        out = korean_cleaners("안녕")
        assert "ㅇ" in out or "ㅏ" in out  # decomposed jamo


class TestConverterCli:
    def test_pth_to_orbax_and_back(self, tmp_path):
        import subprocess
        import sys

        from personalized_text_to_speech_tpu.config import save_hparams
        from tests.test_engine import tiny_engine_hps
        from personalized_text_to_speech_tpu.text.symbols import SYMBOLS

        REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        hps = tiny_engine_hps()
        hps["symbols"] = list(SYMBOLS)
        cfg = str(tmp_path / "c.json")
        save_hparams(hps, cfg)

        # make a source .pth from a tiny engine
        from personalized_text_to_speech_tpu.infer.engine import TTSEngine
        from personalized_text_to_speech_tpu.utils import torch_compat as tc

        eng = TTSEngine(hps, dtype="float32")
        src = str(tmp_path / "G_src.pth")
        tc.save_torch_checkpoint(jax.device_get(eng.params), src)

        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO

        orbax_out = str(tmp_path / "orbax_params")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/convert_checkpoint.py"),
             "--config", cfg, "--input", src, "--output", orbax_out],
            capture_output=True, text=True, env=env, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-1500:]
        assert os.path.isdir(orbax_out)

        back = str(tmp_path / "G_back.pth")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/convert_checkpoint.py"),
             "--config", cfg, "--input", orbax_out, "--output", back],
            capture_output=True, text=True, env=env, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-1500:]

        a, _ = tc.load_torch_state_dict(src)
        b, _ = tc.load_torch_state_dict(back)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


class TestRelayFailFast:
    """utils/runtime.relay_alive / require_tpu_reachable: TPU-touching CLIs
    must fail fast instead of futex-hanging forever when the axon loopback
    relay (.tpu_init.py) has died (CLAUDE.md operational findings)."""

    def test_not_a_loopback_attach_passes(self, monkeypatch):
        from personalized_text_to_speech_tpu.utils import runtime

        monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
        assert runtime.relay_alive()
        runtime.require_tpu_reachable()  # no-op

    def test_dead_relay_raises_system_exit(self, monkeypatch):
        import subprocess as sp

        from personalized_text_to_speech_tpu.utils import runtime

        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")

        class FakeDone:
            stdout = "bash\npython unrelated.py\n"

        monkeypatch.setattr(sp, "run", lambda *a, **k: FakeDone())
        assert not runtime.relay_alive()
        with pytest.raises(SystemExit, match="relay"):
            runtime.require_tpu_reachable()

    def test_live_relay_passes(self, monkeypatch):
        import subprocess as sp

        from personalized_text_to_speech_tpu.utils import runtime

        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")

        class FakeDone:
            stdout = "python3 -u /root/.tpu_init.py\n"

        monkeypatch.setattr(sp, "run", lambda *a, **k: FakeDone())
        assert runtime.relay_alive()
        runtime.require_tpu_reachable()

    def test_cli_exits_fast_under_dead_relay(self, tmp_path):
        """End-to-end: a TPU CLI invoked under a dead-relay env exits ~1 s
        with the diagnostic instead of hanging (guard runs before any
        device op).  `ps` in the child shows no .tpu_init.py because none
        runs inside this sandboxed test env — exactly the dead-relay
        condition."""
        import subprocess
        import sys

        # probe the host relay process directly (relay_alive() itself is
        # env-gated and the test env clears PALLAS_AXON_POOL_IPS): with a
        # LIVE relay the child would pass the guard and become a real
        # TPU-claiming process inside the test suite (one-TPU-process rule)
        ps = subprocess.run(
            ["ps", "-eo", "cmd"], capture_output=True, text=True, timeout=10
        ).stdout
        if ".tpu_init.py" in ps:  # pragma: no cover - host-state dependent
            pytest.skip("axon relay IS alive on this host")

        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "tools/bench_cost.py")],
            capture_output=True, text=True, env=env, timeout=120,
        )
        assert r.returncode == 1
        assert "relay" in r.stderr
