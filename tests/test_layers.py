"""Layer parity vs PyTorch conv semantics + flow invertibility tests."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from personalized_text_to_speech_tpu.models.layers import (
    Conv1d,
    Conv2d,
    ConvTranspose1d,
    LayerNorm,
)
from personalized_text_to_speech_tpu.models.flows import (
    ConvFlow,
    ElementwiseAffine,
    Log,
    ResidualCouplingBlock,
)
from personalized_text_to_speech_tpu.models.attention import (
    _absolute_to_relative,
    _relative_to_absolute,
)


def _np(x):
    return np.asarray(x)


class TestConv1d:
    @pytest.mark.parametrize(
        "k,stride,dil,groups,pad",
        [(3, 1, 1, 1, 1), (5, 1, 2, 1, 4), (1, 1, 1, 1, 0), (41, 4, 1, 4, 20),
         (7, 1, 1, 7, 3)],
    )
    def test_matches_torch(self, k, stride, dil, groups, pad):
        rng = np.random.default_rng(0)
        b, t, cin, cout = 2, 32, groups * 2, groups * 3
        x = rng.normal(size=(b, t, cin)).astype(np.float32)
        w = rng.normal(size=(cout, cin // groups, k)).astype(np.float32) * 0.1
        bias = rng.normal(size=(cout,)).astype(np.float32)

        ref = torch.nn.functional.conv1d(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(w),
            torch.from_numpy(bias),
            stride=stride,
            padding=pad,
            dilation=dil,
            groups=groups,
        ).numpy().transpose(0, 2, 1)

        mod = Conv1d(cout, k, stride=stride, dilation=dil, groups=groups,
                     padding=pad)
        params = {"params": {"kernel": jnp.asarray(w.transpose(2, 1, 0)),
                             "bias": jnp.asarray(bias)}}
        got = _np(mod.apply(params, jnp.asarray(x)))
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() < 1e-4

    def test_weight_norm_matches_torch(self):
        rng = np.random.default_rng(1)
        b, t, cin, cout, k = 2, 16, 6, 10, 5
        x = rng.normal(size=(b, t, cin)).astype(np.float32)
        conv = torch.nn.Conv1d(cin, cout, k, padding=2)
        conv = torch.nn.utils.weight_norm(conv)
        with torch.no_grad():
            ref = conv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
        v = conv.weight_v.detach().numpy()  # [out, in, k]
        g = conv.weight_g.detach().numpy()[:, 0, 0]  # [out]
        bias = conv.bias.detach().numpy()

        mod = Conv1d(cout, k, padding=2, weight_norm=True)
        params = {"params": {"v": jnp.asarray(v.transpose(2, 1, 0)),
                             "g": jnp.asarray(g), "bias": jnp.asarray(bias)}}
        got = _np(mod.apply(params, jnp.asarray(x)))
        assert np.abs(got - ref).max() < 1e-4


class TestConvTranspose1d:
    @pytest.mark.parametrize("k,stride", [(16, 8), (4, 2), (16, 8)])
    def test_matches_torch(self, k, stride):
        rng = np.random.default_rng(2)
        b, t, cin, cout = 2, 12, 8, 4
        pad = (k - stride) // 2
        x = rng.normal(size=(b, t, cin)).astype(np.float32)
        w = rng.normal(size=(cin, cout, k)).astype(np.float32) * 0.1
        bias = rng.normal(size=(cout,)).astype(np.float32)

        ref = torch.nn.functional.conv_transpose1d(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(w),
            torch.from_numpy(bias),
            stride=stride,
            padding=pad,
        ).numpy().transpose(0, 2, 1)

        mod = ConvTranspose1d(cout, k, stride=stride, padding=pad)
        params = {"params": {"kernel": jnp.asarray(w.transpose(2, 0, 1)),
                             "bias": jnp.asarray(bias)}}
        got = _np(mod.apply(params, jnp.asarray(x)))
        assert got.shape == ref.shape  # L_out = L_in * stride
        assert got.shape[1] == t * stride
        assert np.abs(got - ref).max() < 1e-4

    def test_weight_norm_g_per_input_channel(self):
        rng = np.random.default_rng(3)
        b, t, cin, cout, k, stride = 1, 6, 4, 3, 8, 4
        pad = (k - stride) // 2
        x = rng.normal(size=(b, t, cin)).astype(np.float32)
        conv = torch.nn.ConvTranspose1d(cin, cout, k, stride, padding=pad)
        conv = torch.nn.utils.weight_norm(conv)
        with torch.no_grad():
            ref = conv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
        v = conv.weight_v.detach().numpy()  # [in, out, k]
        g = conv.weight_g.detach().numpy()[:, 0, 0]  # [in]
        bias = conv.bias.detach().numpy()

        mod = ConvTranspose1d(cout, k, stride=stride, padding=pad, weight_norm=True)
        params = {"params": {"v": jnp.asarray(v.transpose(2, 0, 1)),
                             "g": jnp.asarray(g), "bias": jnp.asarray(bias)}}
        got = _np(mod.apply(params, jnp.asarray(x)))
        assert np.abs(got - ref).max() < 1e-4


class TestConv2d:
    def test_matches_torch(self):
        rng = np.random.default_rng(4)
        b, h, w_, cin, cout = 2, 18, 5, 3, 8
        x = rng.normal(size=(b, h, w_, cin)).astype(np.float32)
        wt = rng.normal(size=(cout, cin, 5, 1)).astype(np.float32) * 0.1
        bias = rng.normal(size=(cout,)).astype(np.float32)
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(wt),
            torch.from_numpy(bias),
            stride=(3, 1),
            padding=(2, 0),
        ).numpy().transpose(0, 2, 3, 1)

        mod = Conv2d(cout, (5, 1), strides=(3, 1), padding=(2, 0))
        params = {"params": {"kernel": jnp.asarray(wt.transpose(2, 3, 1, 0)),
                             "bias": jnp.asarray(bias)}}
        got = _np(mod.apply(params, jnp.asarray(x)))
        assert np.abs(got - ref).max() < 1e-4


class TestLayerNorm:
    def test_matches_torch(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(2, 7, 12)).astype(np.float32)
        gamma = rng.normal(size=(12,)).astype(np.float32)
        beta = rng.normal(size=(12,)).astype(np.float32)
        ref = torch.nn.functional.layer_norm(
            torch.from_numpy(x), (12,), torch.from_numpy(gamma),
            torch.from_numpy(beta), 1e-5,
        ).numpy()
        mod = LayerNorm(12)
        params = {"params": {"gamma": jnp.asarray(gamma), "beta": jnp.asarray(beta)}}
        got = _np(mod.apply(params, jnp.asarray(x)))
        assert np.abs(got - ref).max() < 1e-4


class TestRelPosition:
    def test_rel_abs_roundtrip_structure(self):
        # relative→absolute then absolute→relative must place the diagonal band
        # back where it started (checked on a delta pattern)
        b, h, l = 1, 1, 5
        rel = np.zeros((b, h, l, 2 * l - 1), dtype=np.float32)
        rel[..., l - 1] = 1.0  # center diagonal (relative offset 0)
        absmat = _np(_relative_to_absolute(jnp.asarray(rel)))
        np.testing.assert_array_equal(absmat[0, 0], np.eye(l, dtype=np.float32))
        back = _np(_absolute_to_relative(jnp.asarray(absmat)))
        np.testing.assert_array_equal(back, rel)

    @pytest.mark.parametrize("l,w", [(9, 4), (10, 4), (32, 4), (200, 4), (3, 1)])
    def test_band_shuffles_match_index_oracle(self, l, w):
        from personalized_text_to_speech_tpu.models.attention import (
            _band_to_full,
            _full_to_band,
        )

        rng = np.random.default_rng(7)
        k = 2 * w + 1
        band = rng.normal(size=(2, 3, l, k)).astype(np.float32)
        full = _np(_band_to_full(jnp.asarray(band), w))
        ref = np.zeros((2, 3, l, l), np.float32)
        for t in range(l):
            for j in range(k):
                s = t + j - w
                if 0 <= s < l:
                    ref[:, :, t, s] = band[:, :, t, j]
        np.testing.assert_array_equal(full, ref)

        p = rng.normal(size=(2, 3, l, l)).astype(np.float32)
        got = _np(_full_to_band(jnp.asarray(p), w))
        refb = np.zeros((2, 3, l, k), np.float32)
        for t in range(l):
            for j in range(k):
                s = t + j - w
                if 0 <= s < l:
                    refb[:, :, t, j] = p[:, :, t, s]
        np.testing.assert_array_equal(got, refb)

    @pytest.mark.parametrize("t_len", [9, 16, 64])
    @pytest.mark.parametrize("heads_share", [True, False])
    def test_banded_attention_matches_reference_path(self, t_len, heads_share):
        # The banded rel-pos path must reproduce the reference-shaped
        # 2T-1 path (reference attentions.py:199-243) to fp accumulation
        # noise, for outputs AND parameter gradients.
        from personalized_text_to_speech_tpu.models.attention import (
            MultiHeadAttention,
        )

        rng = np.random.default_rng(11)
        new = MultiHeadAttention(64, 64, 2, window_size=4,
                                 heads_share=heads_share)
        old = MultiHeadAttention(64, 64, 2, window_size=4,
                                 heads_share=heads_share, banded_rel=False)
        x = jnp.asarray(rng.normal(size=(2, t_len, 64)).astype(np.float32))
        mask = jnp.ones((2, 1, t_len, t_len), np.float32)
        mask = mask.at[1, :, :, max(1, t_len * 3 // 4):].set(0)
        params = new.init(jax.random.PRNGKey(0), x, x, mask)

        o_new = _np(new.apply(params, x, x, mask))
        o_old = _np(old.apply(params, x, x, mask))
        np.testing.assert_allclose(o_new, o_old, atol=1e-5)

        g_new = jax.grad(
            lambda p: jnp.sum(jnp.sin(new.apply(p, x, x, mask))))(params)
        g_old = jax.grad(
            lambda p: jnp.sum(jnp.sin(old.apply(p, x, x, mask))))(params)
        for a, b in zip(jax.tree.leaves(g_new), jax.tree.leaves(g_old)):
            np.testing.assert_allclose(_np(a), _np(b), atol=1e-4)


class TestFlows:
    def test_elementwise_affine_invertible(self):
        mod = ElementwiseAffine(2)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 9, 2)),
                        dtype=jnp.float32)
        mask = jnp.ones((2, 9, 1))
        params = mod.init(jax.random.PRNGKey(0), x, mask)
        # non-trivial params
        params = flax.core.unfreeze(params)
        params["params"]["m"] = jnp.array([0.3, -0.2])
        params["params"]["logs"] = jnp.array([0.1, -0.4])
        y, logdet = mod.apply(params, x, mask)
        x_rec = mod.apply(params, y, mask, reverse=True)
        assert np.abs(_np(x_rec - x)).max() < 1e-5
        want_logdet = (0.1 + -0.4) * 9
        assert np.abs(_np(logdet) - want_logdet).max() < 1e-4

    def test_log_flow_invertible(self):
        mod = Log()
        x = jnp.asarray(np.random.default_rng(1).uniform(0.1, 3.0, size=(1, 5, 2)),
                        dtype=jnp.float32)
        mask = jnp.ones((1, 5, 1))
        y, logdet = mod.apply({}, x, mask)
        x_rec = mod.apply({}, y, mask, reverse=True)
        # fp32 log→exp roundtrip carries ~1e-4 relative error
        assert np.abs(_np(x_rec - x)).max() < 5e-4

    def test_conv_flow_invertible(self):
        mod = ConvFlow(2, 24, 3, n_layers=2)
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 7, 2))
        mask = jnp.ones((2, 7, 1))
        params = mod.init(rng, x, mask)
        # perturb proj params away from zero-init so the spline is non-trivial
        params = flax.core.unfreeze(params)
        proj_k = params["params"]["proj"]["kernel"]
        params["params"]["proj"]["kernel"] = (
            jax.random.normal(jax.random.PRNGKey(1), proj_k.shape) * 0.3
        )
        y, logdet = mod.apply(params, x, mask)
        x_rec = mod.apply(params, y, mask, reverse=True)
        assert np.abs(_np(x_rec - x)).max() < 1e-4

    def test_residual_coupling_block_invertible(self):
        mod = ResidualCouplingBlock(8, 16, 5, 1, 2, n_flows=2, gin_channels=4)
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 11, 8))
        mask = jnp.ones((2, 11, 1))
        g = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 4))
        params = mod.init(rng, x, mask, g)
        # perturb post convs so coupling is non-trivial
        params = flax.core.unfreeze(params)
        for i in range(2):
            k = params["params"][f"coupling_{i}"]["post"]["kernel"]
            params["params"][f"coupling_{i}"]["post"]["kernel"] = (
                jax.random.normal(jax.random.PRNGKey(2 + i), k.shape) * 0.2
            )
        z = mod.apply(params, x, mask, g)
        x_rec = mod.apply(params, z, mask, g, reverse=True)
        assert np.abs(_np(x_rec - x)).max() < 2e-4


class TestDecoder:
    def test_decoder_runs(self):
        from personalized_text_to_speech_tpu.models.attention import Decoder
        import jax

        dec = Decoder(8, 16, 2, 2, kernel_size=3)
        x = jnp.ones((2, 5, 8))
        h = jnp.ones((2, 7, 8))
        x_mask = jnp.ones((2, 5))
        h_mask = jnp.ones((2, 7))
        params = dec.init(jax.random.PRNGKey(0), x, x_mask, h, h_mask)
        out = dec.apply(params, x, x_mask, h, h_mask)
        assert out.shape == (2, 5, 8)
        assert np.isfinite(_np(out)).all()

    def test_causality(self):
        """Changing a later input token must not affect earlier outputs."""
        from personalized_text_to_speech_tpu.models.attention import Decoder
        import jax

        dec = Decoder(8, 16, 2, 1, kernel_size=3, p_dropout=0.0)
        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(rng, (1, 6, 8))
        h = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8))
        masks = (jnp.ones((1, 6)), jnp.ones((1, 4)))
        params = dec.init(jax.random.PRNGKey(0), x, masks[0], h, masks[1])
        out_a = dec.apply(params, x, masks[0], h, masks[1])
        x2 = x.at[0, 5].set(99.0)
        out_b = dec.apply(params, x2, masks[0], h, masks[1])
        # positions 0..2 see no influence from position 5 (causal attn;
        # causal FFN conv reaches back only)
        np.testing.assert_allclose(_np(out_a)[0, :3], _np(out_b)[0, :3],
                                   atol=1e-5)
