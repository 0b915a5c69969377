"""Numerical parity vs the executed reference at PRODUCTION geometry.

The round-2 parity suite (tests/test_parity.py) proves checkpoint-level
equivalence at a toy geometry.  This module repeats the strongest check —
reference ``models_infer.py`` executed with OUR exported weights and
identical injected noise — at the reference's shipped production hparams
(reference configs/finetune_speaker.json:35-52): hidden 192, filter 768,
6 attention layers, upsample [8,8,2,2] with kernels [16,16,4,4],
upsample_initial_channel 512, gin 256, 513 spec bins, 68-symbol vocab.
ConvTranspose k16/s8 padding conventions and window-4 relative-position
attention at realistic sequence lengths are exactly where silent divergence
would hide; this asserts mel/waveform ≤1e-3 where it matters.

Runs in fp32 with ``jax_default_matmul_precision=highest`` (tests/conftest.py)
on CPU; the first run pays a large one-time XLA compile that the persistent
test cache absorbs.
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

pytestmark = pytest.mark.slow


def _load_reference_models():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference tree unavailable")
    sys.dont_write_bytecode = True
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import models_infer  # noqa: F401

    return models_infer


# reference configs/finetune_speaker.json:35-52 — every field verbatim,
# except n_speakers (999 → 4: pure embedding-table rows, no math change)
# and p_dropout (0.1 → 0.0: dropout is inactive at eval in both frameworks;
# 0 keeps init paths deterministic).
CFG = dict(
    n_vocab=68,
    spec_channels=513,  # filter_length 1024 → 513 bins
    segment_size=8,
    inter_channels=192,
    hidden_channels=192,
    filter_channels=768,
    n_heads=2,
    n_layers=6,
    kernel_size=3,
    p_dropout=0.0,
    resblock="1",
    resblock_kernel_sizes=(3, 7, 11),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    upsample_rates=(8, 8, 2, 2),
    upsample_initial_channel=512,
    upsample_kernel_sizes=(16, 16, 4, 4),
    n_speakers=4,
    gin_channels=256,
)
HOP = 256  # 8*8*2*2

N_TOK = 61  # ~60-token text (realistic, interleaved-blank style length)
MAX_LEN = 160  # frame canvas; random-init durations are ~1 frame/token


@pytest.fixture(scope="module")
def outputs():
    """Run both frameworks once at production geometry; share the results."""
    models_infer = _load_reference_models()

    ours = SynthesizerTrn(**CFG)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 24), dtype=jnp.int32)
    spec = jnp.zeros((1, 48, CFG["spec_channels"]))
    params = ours.init(
        {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
        x,
        jnp.array([24]),
        spec,
        jnp.array([48]),
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
    assert unexpected == [], f"unexpected keys: {unexpected[:6]}"
    assert missing == [], f"missing keys: {missing[:6]}"
    theirs.eval()

    rng_np = np.random.default_rng(123)
    tokens = rng_np.integers(1, CFG["n_vocab"], size=(1, N_TOK)).astype(np.int64)
    dp_noise = rng_np.normal(size=(1, N_TOK, 2)).astype(np.float32)
    prior_noise_full = rng_np.normal(
        size=(1, MAX_LEN, CFG["inter_channels"])
    ).astype(np.float32)

    wav_j, y_len_j, _, _ = ours.apply(
        params,
        jnp.asarray(tokens, dtype=jnp.int32),
        jnp.array([N_TOK]),
        jnp.array([1]),
        method=ours.infer,
        noise_scale=0.667,
        length_scale=1.0,
        noise_scale_w=0.8,
        max_len=MAX_LEN,
        dp_noise=jnp.asarray(dp_noise),
        prior_noise=jnp.asarray(prior_noise_full),
    )
    wav_j = np.asarray(wav_j)[0]
    y_len = int(y_len_j[0])
    assert 1 <= y_len < MAX_LEN, "canvas saturated; raise MAX_LEN"

    real_randn = torch.randn
    real_randn_like = torch.randn_like
    try:
        torch.randn = lambda *s, **k: torch.from_numpy(
            dp_noise.transpose(0, 2, 1).copy()
        )
        torch.randn_like = lambda t: torch.from_numpy(
            np.ascontiguousarray(
                prior_noise_full.transpose(0, 2, 1)[:, :, : t.shape[2]]
            )
        )
        with torch.no_grad():
            audio, _, y_mask_t, _ = theirs.infer(
                torch.from_numpy(tokens),
                torch.LongTensor([N_TOK]),
                sid=torch.LongTensor([1]),
                noise_scale=0.667,
                length_scale=1.0,
                noise_scale_w=0.8,
            )
    finally:
        torch.randn = real_randn
        torch.randn_like = real_randn_like

    wav_t = audio[0, 0].numpy()
    t_len = int(y_mask_t.sum())
    return dict(wav_j=wav_j, wav_t=wav_t, y_len=y_len, t_len=t_len)


class TestProductionGeometryParity:
    def test_durations_match(self, outputs):
        assert outputs["t_len"] == outputs["y_len"], (
            f"duration mismatch at production geometry: "
            f"ref {outputs['t_len']} vs ours {outputs['y_len']}"
        )

    def test_waveform_parity(self, outputs):
        n = min(len(outputs["wav_t"]), outputs["y_len"] * HOP)
        assert n >= 40 * HOP, "need a realistic number of frames to compare"
        err = np.abs(outputs["wav_j"][:n] - outputs["wav_t"][:n]).max()
        assert err <= 1e-3, f"production waveform max abs err {err}"

    def test_mel_parity_north_star(self, outputs):
        """Mel ≤1e-3 at the production mel geometry (1024 fft / 256 hop /
        80 mels, reference configs/finetune_speaker.json:24-30)."""
        from personalized_text_to_speech_tpu.ops.spectrogram import (
            MelConfig,
            mel_spectrogram,
        )

        n = min(len(outputs["wav_t"]), outputs["y_len"] * HOP)
        cfg = MelConfig(
            sampling_rate=22050,
            n_fft=1024,
            hop_length=256,
            win_length=1024,
            n_mels=80,
        )
        mel_ours = np.asarray(
            mel_spectrogram(jnp.asarray(outputs["wav_j"][None, :n]), cfg)
        )
        mel_ref = np.asarray(
            mel_spectrogram(jnp.asarray(outputs["wav_t"][None, :n]), cfg)
        )
        err = np.abs(mel_ours - mel_ref).max()
        assert err <= 1e-3, f"production mel max abs err {err}"
