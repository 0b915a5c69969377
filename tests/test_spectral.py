"""Spectral-norm discriminator variant: torch parity, .pth round-trip, and a
training step with the power-iteration state threaded through.

The reference builds its discriminators with ``norm_f = spectral_norm if
use_spectral_norm`` (reference ``models.py:304,339``); parity target is
``torch.nn.utils.spectral_norm`` (dim 0, one power iteration per training
forward, eps 1e-12).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from personalized_text_to_speech_tpu.models.discriminator import (
    MultiPeriodDiscriminator,
)
from personalized_text_to_speech_tpu.models.layers import Conv1d, Conv2d
from personalized_text_to_speech_tpu.utils import torch_compat as tc


def _np(x):
    return np.asarray(x)


class TestSpectralConvParity:
    def test_conv1d_training_forwards_match_torch(self):
        rng = np.random.default_rng(0)
        b, t, cin, cout, k = 2, 32, 4, 8, 5
        x = rng.normal(size=(b, t, cin)).astype(np.float32)

        ref = torch.nn.utils.spectral_norm(
            torch.nn.Conv1d(cin, cout, k, padding=2)
        )
        ref.train()
        w = rng.normal(size=(cout, cin, k)).astype(np.float32)
        bias = rng.normal(size=(cout,)).astype(np.float32)
        with torch.no_grad():
            ref.weight_orig.copy_(torch.from_numpy(w))
            ref.bias.copy_(torch.from_numpy(bias))

        mod = Conv1d(cout, k, padding=2, spectral_norm=True)
        variables = {
            "params": {
                "w_orig": jnp.asarray(w.transpose(2, 1, 0)),
                "bias": jnp.asarray(bias),
            },
            # seed the power iteration from torch's randomly-initialized
            # buffers so both sides walk the same trajectory
            "spectral": {
                "u": jnp.asarray(ref.weight_u.detach().numpy().copy()),
                "v": jnp.asarray(ref.weight_v.detach().numpy().copy()),
            },
        }
        xt = torch.from_numpy(x.transpose(0, 2, 1))
        for step in range(3):
            with torch.no_grad():
                y_ref = ref(xt).numpy().transpose(0, 2, 1)
            y, new_vars = mod.apply(
                variables, jnp.asarray(x), mutable=["spectral"]
            )
            variables["spectral"] = new_vars["spectral"]
            np.testing.assert_allclose(_np(y), y_ref, atol=2e-5, rtol=1e-4)
            np.testing.assert_allclose(
                _np(variables["spectral"]["u"]),
                ref.weight_u.detach().numpy(),
                atol=1e-5,
            )
            np.testing.assert_allclose(
                _np(variables["spectral"]["v"]),
                ref.weight_v.detach().numpy(),
                atol=1e-5,
            )

    def test_conv1d_eval_forward_frozen(self):
        rng = np.random.default_rng(1)
        b, t, cin, cout, k = 1, 16, 3, 5, 3
        x = rng.normal(size=(b, t, cin)).astype(np.float32)
        ref = torch.nn.utils.spectral_norm(
            torch.nn.Conv1d(cin, cout, k, padding=1)
        )
        w = rng.normal(size=(cout, cin, k)).astype(np.float32)
        with torch.no_grad():
            ref.weight_orig.copy_(torch.from_numpy(w))
            ref.bias.zero_()
        ref.eval()
        variables = {
            "params": {
                "w_orig": jnp.asarray(w.transpose(2, 1, 0)),
                "bias": jnp.zeros((cout,)),
            },
            "spectral": {
                "u": jnp.asarray(ref.weight_u.detach().numpy().copy()),
                "v": jnp.asarray(ref.weight_v.detach().numpy().copy()),
            },
        }
        mod = Conv1d(cout, k, padding=1, spectral_norm=True)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x.transpose(0, 2, 1)))
        # no mutable collection → frozen u/v, no iteration (torch eval mode)
        y = mod.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(
            _np(y), y_ref.numpy().transpose(0, 2, 1), atol=2e-5, rtol=1e-4
        )

    def test_conv2d_training_forward_matches_torch(self):
        rng = np.random.default_rng(2)
        b, h, wdim, cin, cout = 2, 12, 3, 1, 6
        x = rng.normal(size=(b, h, wdim, cin)).astype(np.float32)
        ref = torch.nn.utils.spectral_norm(
            torch.nn.Conv2d(cin, cout, (5, 1), stride=(3, 1), padding=(2, 0))
        )
        ref.train()
        w = rng.normal(size=(cout, cin, 5, 1)).astype(np.float32)
        with torch.no_grad():
            ref.weight_orig.copy_(torch.from_numpy(w))
            ref.bias.zero_()
        mod = Conv2d(
            cout, (5, 1), strides=(3, 1), padding=(2, 0), spectral_norm=True
        )
        variables = {
            "params": {
                "w_orig": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.zeros((cout,)),
            },
            "spectral": {
                "u": jnp.asarray(ref.weight_u.detach().numpy().copy()),
                "v": jnp.asarray(ref.weight_v.detach().numpy().copy()),
            },
        }
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        y, new_vars = mod.apply(variables, jnp.asarray(x), mutable=["spectral"])
        np.testing.assert_allclose(
            _np(y), y_ref.numpy().transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            _np(new_vars["spectral"]["u"]),
            ref.weight_u.detach().numpy(),
            atol=1e-5,
        )


class TestSpectralDiscriminator:
    @pytest.fixture(scope="class")
    def mpd_vars(self):
        d = MultiPeriodDiscriminator(periods=(2, 3), use_spectral_norm=True)
        wav = jnp.zeros((1, 64))
        variables = d.init(jax.random.PRNGKey(0), wav, wav)
        return d, variables

    def test_init_has_spectral_collection(self, mpd_vars):
        _, variables = mpd_vars
        assert "spectral" in variables
        leaves = jax.tree_util.tree_leaves(variables["spectral"])
        assert all(l.ndim == 1 for l in leaves)

    def test_forward_and_mutable_update(self, mpd_vars):
        d, variables = mpd_vars
        wav = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 64)).astype(np.float32)
        )
        (y_r, y_g, f_r, f_g), new_vars = d.apply(
            variables, wav, wav * 0.5, mutable=["spectral"]
        )
        assert len(y_r) == 3  # S + two periods
        before = jax.tree_util.tree_leaves(variables["spectral"])
        after = jax.tree_util.tree_leaves(new_vars["spectral"])
        # power iteration moved the singular-vector estimates
        assert any(
            float(np.abs(_np(a) - _np(b)).max()) > 1e-7
            for a, b in zip(after, before)
        )

    def test_pth_round_trip(self, mpd_vars, tmp_path):
        _, variables = mpd_vars
        state = tc.flax_to_torch(
            {"params": variables["params"], "spectral": variables["spectral"]}
        )
        # torch spectral-norm key triple present
        assert any(k.endswith("weight_orig") for k in state)
        assert any(k.endswith("weight_u") for k in state)
        assert any(k.endswith("weight_v") for k in state)
        assert not any(k.endswith(".weight_g") for k in state)
        back = tc.torch_to_flax(
            state,
            {"params": variables["params"], "spectral": variables["spectral"]},
            strict=True,
        )
        flat_a = jax.tree_util.tree_leaves(variables)
        flat_b = jax.tree_util.tree_leaves(
            {"params": back["params"], "spectral": back["spectral"]}
        )
        assert len(flat_a) == len(flat_b)
        for a, bv in zip(flat_a, flat_b):
            np.testing.assert_allclose(_np(a), _np(bv), atol=0)

    def test_matches_torch_spectral_state_dict_shapes(self, mpd_vars):
        """Shape-level cross-check against an actual torch spectral-norm
        discriminator stack (DiscriminatorS only, cheap)."""
        _, variables = mpd_vars
        ours = tc.flax_to_torch(
            {"params": variables["params"], "spectral": variables["spectral"]}
        )
        norm_f = torch.nn.utils.spectral_norm
        convs = [
            norm_f(torch.nn.Conv1d(1, 16, 15, 1, padding=7)),
            norm_f(torch.nn.Conv1d(16, 64, 41, 4, groups=4, padding=20)),
            norm_f(torch.nn.Conv1d(64, 256, 41, 4, groups=16, padding=20)),
            norm_f(torch.nn.Conv1d(256, 1024, 41, 4, groups=64, padding=20)),
            norm_f(torch.nn.Conv1d(1024, 1024, 41, 4, groups=256, padding=20)),
            norm_f(torch.nn.Conv1d(1024, 1024, 5, 1, padding=2)),
        ]
        post = norm_f(torch.nn.Conv1d(1024, 1, 3, 1, padding=1))
        mod = torch.nn.ModuleDict(
            {"convs": torch.nn.ModuleList(convs), "conv_post": post}
        )
        ref_sd = {f"discriminators.0.{k}": v for k, v in mod.state_dict().items()}
        for key, val in ref_sd.items():
            assert key in ours, f"missing {key}"
            assert tuple(ours[key].shape) == tuple(val.shape), key


class TestSpectralTrainStep:
    def test_gan_step_with_spectral_d(self):
        from personalized_text_to_speech_tpu.train.state import (
            create_train_state,
        )
        from personalized_text_to_speech_tpu.train.step import (
            Batch,
            make_train_step,
        )
        from tests.test_model import tiny_model
        from tests.test_train import HOP, tiny_hps

        hps = tiny_hps()
        hps.model["use_spectral_norm"] = True
        g_model = tiny_model()
        d_model = MultiPeriodDiscriminator(periods=(2, 3), use_spectral_norm=True)

        rng = jax.random.PRNGKey(0)
        b, tt, ts = 2, 6, 24
        g_params = g_model.init(
            {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
            jnp.ones((b, tt), jnp.int32), jnp.array([6, 5]),
            jnp.zeros((b, ts, 33)), jnp.array([24, 20]), jnp.array([0, 1]),
        )["params"]
        wav0 = jnp.zeros((b, 8 * HOP))
        d_vars = d_model.init(rng, wav0, wav0)

        g_state = create_train_state(g_model.apply, g_params, hps, 4)
        d_state = create_train_state(
            d_model.apply, d_vars["params"], hps, 4,
            mutables={"spectral": d_vars["spectral"]},
        )
        step = jax.jit(make_train_step(g_model, d_model, hps))

        rng_np = np.random.default_rng(0)
        t = np.linspace(0, 8, ts * HOP)
        wav_data = np.stack(
            [np.sin(2 * np.pi * 25 * t), 0.5 * np.sin(2 * np.pi * 40 * t)]
        ).astype(np.float32)
        batch = Batch(
            text=jnp.asarray(rng_np.integers(1, 10, (b, tt)), jnp.int32),
            text_lengths=jnp.array([6, 5], jnp.int32),
            wav=jnp.asarray(wav_data),
            wav_lengths=jnp.array([ts * HOP, (ts - 4) * HOP], jnp.int32),
            sid=jnp.array([0, 1], jnp.int32),
        )
        u_before = jax.tree_util.tree_leaves(d_state.mutables["spectral"])
        for i in range(2):
            g_state, d_state, metrics = step(
                g_state, d_state, batch, jax.random.PRNGKey(i)
            )
            for k, v in metrics.items():
                assert np.isfinite(float(v)), f"{k} not finite"
        u_after = jax.tree_util.tree_leaves(d_state.mutables["spectral"])
        assert any(
            float(np.abs(_np(a) - _np(bv)).max()) > 1e-7
            for a, bv in zip(u_after, u_before)
        )
