"""Checkpoint bridge tests: flax↔torch round-trip and reference key naming."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from personalized_text_to_speech_tpu.utils import torch_compat as tc
from tests.test_model import tiny_model


@pytest.fixture(scope="module")
def tiny_params():
    model = tiny_model()
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 6), dtype=jnp.int32)
    x_lengths = jnp.array([6])
    y = jnp.zeros((1, 20, 33))
    y_lengths = jnp.array([20])
    sid = jnp.array([0])
    return model, model.init(
        {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
        x, x_lengths, y, y_lengths, sid,
    )


class TestKeyNaming:
    def test_generator_keys_match_reference_scheme(self, tiny_params):
        _, params = tiny_params
        keys = set(tc.flax_to_torch(params).keys())
        # spot-check the naming against the reference state_dict schema
        expected = [
            "enc_p.emb.weight",
            "enc_p.encoder.attn_layers.0.conv_q.weight",
            "enc_p.encoder.attn_layers.0.emb_rel_k",
            "enc_p.encoder.norm_layers_1.0.gamma",
            "enc_p.encoder.ffn_layers.0.conv_1.weight",
            "enc_p.proj.weight",
            "enc_q.pre.weight",
            "enc_q.enc.in_layers.0.weight_v",
            "enc_q.enc.in_layers.0.weight_g",
            "enc_q.enc.res_skip_layers.0.weight_v",
            "enc_q.enc.cond_layer.weight_v",
            "enc_q.proj.bias",
            "flow.flows.0.pre.weight",
            "flow.flows.0.enc.in_layers.0.weight_v",
            "flow.flows.0.post.weight",
            "flow.flows.2.pre.weight",
            "flow.flows.4.post.bias",
            "flow.flows.6.pre.bias",
            "dec.conv_pre.weight",
            "dec.cond.weight",
            "dec.ups.0.weight_v",
            "dec.ups.0.weight_g",
            "dec.resblocks.0.convs1.0.weight_v",
            "dec.resblocks.1.convs2.0.weight_g",
            "dec.conv_post.weight",
            "dp.pre.weight",
            "dp.proj.weight",
            "dp.convs.convs_sep.0.weight",
            "dp.convs.norms_1.0.gamma",
            "dp.cond.weight",
            "dp.flows.0.m",
            "dp.flows.0.logs",
            "dp.flows.1.pre.weight",
            "dp.flows.1.convs.convs_1x1.0.weight",
            "dp.flows.3.proj.weight",
            "dp.flows.7.pre.weight",
            "dp.post_pre.weight",
            "dp.post_convs.convs_sep.0.weight",
            "dp.post_flows.0.m",
            "dp.post_flows.1.pre.weight",
            "dp.post_flows.7.proj.bias",
            "emb_g.weight",
        ]
        missing = [k for k in expected if k not in keys]
        assert missing == [], f"missing keys: {missing}"
        # no flip/log modules should appear
        assert not any(".flows.8" in k for k in keys)

    def test_ea_param_shape_is_torch_style(self, tiny_params):
        _, params = tiny_params
        state = tc.flax_to_torch(params)
        assert state["dp.flows.0.m"].shape == (2, 1)

    def test_conv_weight_layouts(self, tiny_params):
        _, params = tiny_params
        state = tc.flax_to_torch(params)
        # enc_p.proj: Conv1d(hidden=8 → 2*inter=16, k=1) → torch [16, 8, 1]
        assert state["enc_p.proj.weight"].shape == (16, 8, 1)
        # dec.ups.0: ConvTranspose1d(16→8, k=8) → torch v [16, 8, 8], g [16,1,1]
        assert state["dec.ups.0.weight_v"].shape == (16, 8, 8)
        assert state["dec.ups.0.weight_g"].shape == (16, 1, 1)


class TestRoundTrip:
    def test_flax_torch_flax_identity(self, tiny_params):
        model, params = tiny_params
        state = tc.flax_to_torch(params)
        rebuilt = tc.torch_to_flax(state, params, strict=True)
        flat_a = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(rebuilt)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    def test_partial_speaker_embedding(self, tiny_params):
        model, params = tiny_params
        state = tc.flax_to_torch(params)
        # simulate a checkpoint with MORE speakers (999-style pretrained)
        big = np.random.default_rng(0).normal(size=(10, 6)).astype(np.float32)
        state["emb_g.weight"] = big
        rebuilt = tc.torch_to_flax(state, params)
        emb = np.asarray(rebuilt["params"]["emb_g"]["embedding"])
        assert emb.shape == (4, 6)
        np.testing.assert_allclose(emb, big[:4], atol=0)

    def test_missing_key_keeps_template(self, tiny_params):
        model, params = tiny_params
        state = tc.flax_to_torch(params)
        del state["dec.conv_pre.weight"]
        rebuilt = tc.torch_to_flax(state, params)  # non-strict
        a = np.asarray(params["params"]["dec"]["conv_pre"]["kernel"])
        b = np.asarray(rebuilt["params"]["dec"]["conv_pre"]["kernel"])
        np.testing.assert_allclose(a, b)

    def test_pth_file_round_trip(self, tiny_params, tmp_path):
        model, params = tiny_params
        path = str(tmp_path / "G_test.pth")
        tc.save_torch_checkpoint(params, path, iteration=7)
        state, meta = tc.load_torch_state_dict(path)
        assert meta["iteration"] == 7
        rebuilt = tc.torch_to_flax(state, params, strict=True)
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(rebuilt)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


class TestDiscriminatorBridge:
    def test_disc_keys(self):
        from personalized_text_to_speech_tpu.models import MultiPeriodDiscriminator

        disc = MultiPeriodDiscriminator()
        wav = jnp.zeros((1, 256))
        params = disc.init(jax.random.PRNGKey(0), wav, wav)
        keys = set(tc.flax_to_torch(params).keys())
        for k in [
            "discriminators.0.convs.0.weight_v",
            "discriminators.0.conv_post.weight_g",
            "discriminators.1.convs.0.weight_v",
            "discriminators.5.conv_post.weight_v",
        ]:
            assert k in keys, k
        state = tc.flax_to_torch(params)
        # DiscriminatorP conv: torch [32, 1, 5, 1]
        assert state["discriminators.1.convs.0.weight_v"].shape == (32, 1, 5, 1)
        rebuilt = tc.torch_to_flax(state, params, strict=True)
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(rebuilt)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


class TestDiscriminatorTorchLoad:
    def test_conv2d_weight_g_rank_matches_torch(self):
        """Exported D params must load into the reference's torch
        discriminator (Conv2d weight_g is rank 4 there)."""
        import torch
        from personalized_text_to_speech_tpu.models import (
            MultiPeriodDiscriminator,
        )

        disc = MultiPeriodDiscriminator()
        wav = jnp.zeros((1, 256))
        params = disc.init(jax.random.PRNGKey(0), wav, wav)
        state = tc.flax_to_torch(params)
        assert state["discriminators.1.convs.0.weight_g"].shape == (32, 1, 1, 1)
        assert state["discriminators.0.convs.0.weight_g"].shape == (16, 1, 1)
        # round trip still exact
        rebuilt = tc.torch_to_flax(state, params, strict=True)
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(rebuilt)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
