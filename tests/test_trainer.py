"""Trainer-level integration test on a tiny config: real wav files →
bucketed batches → fused GAN steps → orbax save → resume restores step and
optimizer state.  (The eval/TensorBoard path is exercised by the on-chip
smoke runs; here it is stubbed to keep the CPU compile budget small.)"""

import os

import jax
import numpy as np
import pytest

from personalized_text_to_speech_tpu.config import save_hparams
from personalized_text_to_speech_tpu.data.audio import save_wav
from tests.test_engine import tiny_engine_hps


@pytest.fixture(scope="module")
def training_setup(tmp_path_factory):
    from personalized_text_to_speech_tpu.text.symbols import SYMBOLS

    tmp = tmp_path_factory.mktemp("trainer")
    sr = 8000
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        n = int(sr * rng.uniform(0.5, 0.9))
        t = np.linspace(0, n / sr, n)
        wav = (0.4 * np.sin(2 * np.pi * rng.uniform(100, 250) * t)).astype(
            np.float32
        )
        p = tmp / f"w{i}.wav"
        save_wav(str(p), wav, sr)
        lines.append(f"{p}|{i % 2}|ab ko→ no↓ da to mi.")
    fl = tmp / "train.txt"
    fl.write_text("\n".join(lines), encoding="utf-8")

    hps = tiny_engine_hps()
    hps["symbols"] = list(SYMBOLS)
    hps.data.training_files = str(fl)
    hps.data.validation_files = str(fl)
    hps.train.batch_size = 2
    hps.train.log_interval = 1
    hps.train.eval_interval = 10_000  # step-0 eval stubbed below anyway
    # bucket boundaries matching the short clips
    hps.tpu["text_buckets"] = [32, 64]
    return hps, str(tmp / "run")


class TestTrainer:
    def test_fit_save_resume(self, training_setup, monkeypatch):
        from personalized_text_to_speech_tpu.train.loop import Trainer

        hps, model_dir = training_setup
        monkeypatch.setattr(Trainer, "evaluate", lambda self: None)

        trainer = Trainer(hps, model_dir, use_mesh=False)
        trainer.fit(max_epochs=1)
        steps_run = trainer.global_step
        assert steps_run >= 1
        assert os.path.exists(os.path.join(model_dir, "G_latest.pth"))
        assert os.path.exists(os.path.join(model_dir, "config.json"))

        # fresh trainer resumes at the saved step with optimizer state
        trainer2 = Trainer(hps, model_dir, use_mesh=False)
        assert trainer2.resume()
        assert int(trainer2.g_state.step) == steps_run
        # Adam moments restored (non-zero after real updates)
        mu_leaves = jax.tree_util.tree_leaves(trainer2.g_state.opt_state)
        assert any(np.abs(np.asarray(l)).sum() > 0 for l in mu_leaves
                   if hasattr(l, "shape") and getattr(l, "size", 0) > 0)

    def test_fit_sequence_parallel(self, training_setup, monkeypatch, tmp_path):
        """End-to-end Trainer wiring for `tpu.sp: true`: data=2 × model=4
        mesh, frame axis time-sharded (parallel/sp.py), params replicated
        (the TP branch must NOT fire — sp and tp are exclusive users of the
        `model` axis)."""
        import copy

        from personalized_text_to_speech_tpu.train.loop import Trainer

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        hps, _ = training_setup
        hps = copy.deepcopy(hps)
        hps.tpu["mesh"] = {"data": 2, "model": 4}
        hps.tpu["sp"] = True
        monkeypatch.setattr(Trainer, "evaluate", lambda self: None)

        trainer = Trainer(hps, str(tmp_path / "sp_run"))
        assert trainer._sp
        # params stayed replicated: every leaf's sharding spec is empty
        leaf = jax.tree_util.tree_leaves(trainer.g_state.params)[0]
        assert all(s is None for s in leaf.sharding.spec)
        trainer.fit(max_epochs=1)
        assert trainer.global_step >= 1
        for l in jax.tree_util.tree_leaves(trainer.g_state.params):
            assert np.isfinite(np.asarray(l)).all()

    def test_pretrained_pth_loading(self, training_setup, monkeypatch, tmp_path):
        from personalized_text_to_speech_tpu.train.loop import Trainer
        from personalized_text_to_speech_tpu.utils import torch_compat as tc

        hps, model_dir = training_setup
        monkeypatch.setattr(Trainer, "evaluate", lambda self: None)

        base = Trainer(hps, str(tmp_path / "base"), use_mesh=False)
        g_pth = str(tmp_path / "G_0.pth")
        tc.save_torch_checkpoint(
            {"params": jax.device_get(base.g_state.params)}, g_pth
        )
        warm = Trainer(
            hps, str(tmp_path / "warm"), pretrained_g=g_pth, use_mesh=False
        )
        a = jax.tree_util.tree_leaves(base.g_state.params)[0]
        b = jax.tree_util.tree_leaves(warm.g_state.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
