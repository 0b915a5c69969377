"""End-to-end numerical parity vs the REFERENCE implementation.

Loads the reference's inference-only model code (``models_infer.py`` — plain
PyTorch, importable without the Cython extension), feeds it OUR exported
``.pth`` weights, injects identical noise into both frameworks, and compares
the synthesized waveforms sample-by-sample.  This validates, end-to-end and
with one shared weight set: symbol embedding, rel-pos attention, the SDP
reverse flow (splines included), duration→path expansion, the coupling-flow
reverse pass, and the full HiFi-GAN stack — i.e. checkpoint compatibility in
the strongest sense.

The reference tree is read-only PUBLIC content executed as an oracle; nothing
from it is copied.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_DIR = "/root/reference"

import jax
import jax.numpy as jnp

from personalized_text_to_speech_tpu.models.synthesizer import SynthesizerTrn
from personalized_text_to_speech_tpu.utils import torch_compat as tc


def _load_reference_models():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference tree unavailable")
    sys.dont_write_bytecode = True
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import models_infer  # noqa: F401  (torch-only deps)

    return models_infer


CFG = dict(
    n_vocab=24,
    spec_channels=33,
    segment_size=8,
    inter_channels=16,
    hidden_channels=16,
    filter_channels=32,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    p_dropout=0.0,
    resblock="1",
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    upsample_rates=(4, 4),
    upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8),
    n_speakers=3,
    gin_channels=8,
)
HOP = 16  # 4*4


@pytest.fixture(scope="module")
def pair():
    """(our model, our params, reference torch model with same weights)."""
    models_infer = _load_reference_models()

    ours = SynthesizerTrn(**CFG)
    rng = jax.random.PRNGKey(42)
    # init through the TRAINING graph so every submodule (posterior encoder,
    # SDP posterior flows) materializes its parameters
    x = jnp.ones((1, 10), dtype=jnp.int32)
    spec = jnp.zeros((1, 20, CFG["spec_channels"]))
    params = ours.init(
        {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
        x,
        jnp.array([10]),
        spec,
        jnp.array([20]),
        jnp.array([0]),
    )

    state = tc.flax_to_torch(params)
    theirs = models_infer.SynthesizerTrn(
        CFG["n_vocab"],
        CFG["spec_channels"],
        CFG["segment_size"],
        inter_channels=CFG["inter_channels"],
        hidden_channels=CFG["hidden_channels"],
        filter_channels=CFG["filter_channels"],
        n_heads=CFG["n_heads"],
        n_layers=CFG["n_layers"],
        kernel_size=CFG["kernel_size"],
        p_dropout=CFG["p_dropout"],
        resblock=CFG["resblock"],
        resblock_kernel_sizes=list(CFG["resblock_kernel_sizes"]),
        resblock_dilation_sizes=[list(d) for d in CFG["resblock_dilation_sizes"]],
        upsample_rates=list(CFG["upsample_rates"]),
        upsample_initial_channel=CFG["upsample_initial_channel"],
        upsample_kernel_sizes=list(CFG["upsample_kernel_sizes"]),
        n_speakers=CFG["n_speakers"],
        gin_channels=CFG["gin_channels"],
        use_sdp=True,
    )
    torch_state = {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()
    }
    missing, unexpected = theirs.load_state_dict(torch_state, strict=False)
    # the inference-only reference model must consume every exported weight
    assert unexpected == [], f"unexpected keys: {unexpected[:6]}"
    # posterior encoder exists in both; nothing should be missing either
    assert missing == [], f"missing keys: {missing[:6]}"
    theirs.eval()
    return ours, params, theirs


class TestInferParity:
    def test_waveform_matches_reference(self, pair):
        ours, params, theirs = pair
        tokens = np.array([[1, 5, 9, 2, 7, 11, 3, 0, 0, 0]], dtype=np.int64)
        n_tok = 7
        rng = np.random.default_rng(123)
        dp_noise = rng.normal(size=(1, 10, 2)).astype(np.float32)
        max_len = 64
        prior_noise_full = rng.normal(size=(1, max_len, CFG["inter_channels"])).astype(
            np.float32
        )

        # ---- ours -----------------------------------------------------
        wav_j, y_len_j, attn_j, _ = ours.apply(
            params,
            jnp.asarray(tokens, dtype=jnp.int32),
            jnp.array([n_tok]),
            jnp.array([1]),
            method=ours.infer,
            noise_scale=0.667,
            length_scale=1.0,
            noise_scale_w=0.8,
            max_len=max_len,
            dp_noise=jnp.asarray(dp_noise),
            prior_noise=jnp.asarray(prior_noise_full),
        )
        wav_j = np.asarray(wav_j)[0]
        y_len = int(y_len_j[0])
        assert 1 <= y_len < max_len, "test config must not saturate the canvas"

        # ---- reference, same noise ------------------------------------
        # SDP reverse draws randn([b, 2, t]); prior draws randn_like(m_p)
        # with t' = predicted length. Patch both draws to our arrays.
        calls = {"n": 0}

        real_randn = torch.randn

        def fake_randn(*shape, **kw):
            if len(shape) == 3 and shape[1] == 2:
                calls["n"] += 1
                return torch.from_numpy(dp_noise.transpose(0, 2, 1).copy())
            return real_randn(*shape, **kw)

        def fake_randn_like(t):
            arr = prior_noise_full.transpose(0, 2, 1)[:, :, : t.shape[2]]
            calls["n"] += 1
            return torch.from_numpy(np.ascontiguousarray(arr))

        try:
            torch.randn = fake_randn
            real_randn_like = torch.randn_like
            torch.randn_like = fake_randn_like
            with torch.no_grad():
                audio, attn_t, y_mask_t, _ = theirs.infer(
                    torch.from_numpy(tokens),
                    torch.LongTensor([n_tok]),
                    sid=torch.LongTensor([1]),
                    noise_scale=0.667,
                    length_scale=1.0,
                    noise_scale_w=0.8,
                )
        finally:
            torch.randn = real_randn
            torch.randn_like = real_randn_like

        assert calls["n"] == 2
        wav_t = audio[0, 0].numpy()

        # durations must agree exactly
        t_len = int(y_mask_t.sum())
        assert t_len == y_len, f"duration mismatch: ref {t_len} vs ours {y_len}"

        n = min(len(wav_t), y_len * HOP)
        err = np.abs(wav_j[:n] - wav_t[:n]).max()
        assert err <= 1e-3, f"waveform max abs err {err}"
        # typical agreement is much tighter
        assert err <= 2e-4, f"waveform max abs err {err}"

    def test_mel_parity_north_star(self, pair):
        """Mel-output fidelity ≤1e-3 vs the PyTorch reference (BASELINE.md)."""
        from personalized_text_to_speech_tpu.ops.spectrogram import (
            MelConfig,
            mel_spectrogram,
        )

        ours, params, theirs = pair
        tokens = np.array([[2, 4, 6, 8, 10, 12]], dtype=np.int64)
        rng = np.random.default_rng(7)
        dp_noise = rng.normal(size=(1, 6, 2)).astype(np.float32)
        max_len = 64
        prior_noise = rng.normal(size=(1, max_len, CFG["inter_channels"])).astype(
            np.float32
        )
        wav_j, y_len_j, _, _ = ours.apply(
            params,
            jnp.asarray(tokens, dtype=jnp.int32),
            jnp.array([6]),
            jnp.array([2]),
            method=ours.infer,
            max_len=max_len,
            noise_scale=0.667,
            noise_scale_w=0.8,
            dp_noise=jnp.asarray(dp_noise),
            prior_noise=jnp.asarray(prior_noise),
        )
        real_randn = torch.randn
        real_randn_like = torch.randn_like
        try:
            torch.randn = lambda *s, **k: torch.from_numpy(
                dp_noise.transpose(0, 2, 1).copy()
            )
            torch.randn_like = lambda t: torch.from_numpy(
                np.ascontiguousarray(
                    prior_noise.transpose(0, 2, 1)[:, :, : t.shape[2]]
                )
            )
            with torch.no_grad():
                audio, _, y_mask_t, _ = theirs.infer(
                    torch.from_numpy(tokens),
                    torch.LongTensor([6]),
                    sid=torch.LongTensor([2]),
                    noise_scale=0.667,
                    noise_scale_w=0.8,
                )
        finally:
            torch.randn = real_randn
            torch.randn_like = real_randn_like

        n = min(int(y_len_j[0]) * HOP, audio.shape[-1])
        cfg = MelConfig(sampling_rate=8000, n_fft=64, hop_length=HOP,
                        win_length=64, n_mels=20)
        mel_ours = np.asarray(
            mel_spectrogram(jnp.asarray(np.asarray(wav_j)[:, :n]), cfg)
        )
        mel_ref = np.asarray(
            mel_spectrogram(jnp.asarray(audio[0].numpy()[:, :n]), cfg)
        )
        err = np.abs(mel_ours - mel_ref).max()
        assert err <= 1e-3, f"mel max abs err {err}"


class TestVoiceConversionParity:
    def test_vc_matches_reference(self, pair):
        ours, params, theirs = pair
        rng = np.random.default_rng(5)
        t_spec = 24
        spec = np.abs(rng.normal(size=(1, t_spec, CFG["spec_channels"]))).astype(
            np.float32
        )
        post_noise = rng.normal(size=(1, t_spec, CFG["inter_channels"])).astype(
            np.float32
        )
        o_j, _, _ = ours.apply(
            params,
            jnp.asarray(spec),
            jnp.array([t_spec]),
            jnp.array([0]),
            jnp.array([2]),
            method=ours.voice_conversion,
            noise=jnp.asarray(post_noise),
        )
        real_randn_like = torch.randn_like
        try:
            torch.randn_like = lambda t: torch.from_numpy(
                np.ascontiguousarray(post_noise.transpose(0, 2, 1))
            )
            with torch.no_grad():
                o_t, _, _ = theirs.voice_conversion(
                    torch.from_numpy(spec.transpose(0, 2, 1)),
                    torch.LongTensor([t_spec]),
                    sid_src=torch.LongTensor([0]),
                    sid_tgt=torch.LongTensor([2]),
                )
        finally:
            torch.randn_like = real_randn_like
        err = np.abs(np.asarray(o_j)[0] - o_t[0, 0].numpy()).max()
        assert err <= 1e-3, f"vc waveform max abs err {err}"
