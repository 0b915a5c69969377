"""TRAINING-graph numerical parity vs the EXECUTED torch reference.

The round-2/3 parity suites executed the reference's ``models_infer.py`` for
``infer`` and ``voice_conversion`` only.  This module closes the last
unverified numerical surface: the full training forward and every loss term
the reference optimizes (reference ``models.py:459-497``,
``losses.py:7-61``, ``finetune_speaker_v2.py:184-232``), at PRODUCTION
geometry (hidden 192, filter 768, upsample [8,8,2,2], 513 spec bins,
segment 8192 samples — reference ``configs/finetune_speaker.json``).

Method: the reference's training ``models.py`` imports the compiled Cython
``monotonic_align`` and ``librosa`` — neither importable here — so both are
stubbed at the *interface* level before import:

* ``monotonic_align.maximum_path`` → our batched numpy MAS oracle
  (``ops/mas.py::maximum_path_numpy``), which our on-device kernels are
  independently tested against (tests/test_ops.py).  The oracle implements
  the identical DP, so the torch side still computes its OWN ``neg_cent``
  scores and consumes a true maximum path of them.
* ``librosa.filters.mel`` → our standalone Slaney filterbank
  (``ops/spectrogram.py::mel_filterbank``), the same function our mel loss
  uses — both frameworks see one filterbank, so the mel-loss comparison
  isolates the STFT + graph math.

Both frameworks share one exported weight set (``flax_to_torch``) and
bit-identical injected samples for all three stochastic draws of the
training step: the posterior reparameterization noise (reference
``models.py:240``), the SDP posterior noise ``e_q`` (``models.py:67``), and
the random slice window (``commons.py:60-67``).  Dropout is inactive on both
sides (torch ``.eval()`` / flax ``deterministic=True``); everything runs
fp32 with ``jax_default_matmul_precision=highest`` (tests/conftest.py).

Asserted: MAS path exactly identical, slice windows exactly identical,
all latent intermediates ≤1e-3, generated segment audio ≤1e-3, and all six
loss terms (disc/gen/fm/mel/dur/kl) ≤1e-3 vs torch.

Beyond the forward: the GRADIENTS of the total generator loss w.r.t. every
generator parameter and of the discriminator loss w.r.t. every
discriminator parameter are compared tensor-by-tensor against torch
autograd (``flax_to_torch`` maps gradient pytrees exactly like weights —
pure transposes and the shared (v,g) weight-norm decomposition), so the
whole training surface — forward, losses, and backward — is pinned to the
executed reference.
"""

import math
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from personalized_text_to_speech_tpu.models.discriminator import (
    MultiPeriodDiscriminator,
)
from personalized_text_to_speech_tpu.models.synthesizer import SynthesizerTrn
from personalized_text_to_speech_tpu.ops.mas import maximum_path_numpy
from personalized_text_to_speech_tpu.ops.masking import slice_segments
from personalized_text_to_speech_tpu.ops.spectrogram import (
    MelConfig,
    linear_spectrogram,
    mel_filterbank,
    mel_spectrogram,
    spec_to_mel,
)
from personalized_text_to_speech_tpu.train import losses as our_losses
from personalized_text_to_speech_tpu.utils import torch_compat as tc

pytestmark = pytest.mark.slow

REFERENCE_DIR = "/root/reference"

# reference configs/finetune_speaker.json:35-52 (n_speakers 999 → 4:
# embedding-table rows only; p_dropout → 0 as in test_parity_production.py)
CFG = dict(
    n_vocab=68,
    spec_channels=513,
    segment_size=32,  # frames: train.segment_size 8192 / hop 256
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
HOP = 256
SEG_SAMPLES = CFG["segment_size"] * HOP  # 8192, reference train.segment_size
C_MEL = 45.0  # reference configs/finetune_speaker.json train.c_mel
C_KL = 1.0  # train.c_kl

B = 2
T_TEXT = 64  # token canvas
TEXT_LENS = (61, 45)
T_SPEC = 128  # frame canvas
SPEC_LENS = (120, 96)
SIDS = (1, 3)

MEL_CFG = MelConfig(
    sampling_rate=22050, n_fft=1024, hop_length=256, win_length=1024,
    n_mels=80, fmin=0.0, fmax=None,
)


def _load_reference_training_modules():
    """Import reference models/losses/commons/mel_processing with
    monotonic_align + librosa stubbed at their interfaces."""
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference tree unavailable")
    sys.dont_write_bytecode = True
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)

    if "monotonic_align" not in sys.modules:
        ma = types.ModuleType("monotonic_align")

        def maximum_path(neg_cent, mask):
            # interface of reference monotonic_align/__init__.py:6-19
            nc = neg_cent.detach().cpu().numpy().astype(np.float32)
            t_frames = mask.sum(1)[:, 0].cpu().numpy().astype(np.int32)
            t_text = mask.sum(2)[:, 0].cpu().numpy().astype(np.int32)
            path = maximum_path_numpy(nc, t_text, t_frames)
            return torch.from_numpy(path).to(
                device=neg_cent.device, dtype=neg_cent.dtype
            )

        ma.maximum_path = maximum_path
        sys.modules["monotonic_align"] = ma

    librosa_stubbed = "librosa" not in sys.modules
    if librosa_stubbed:
        lib = types.ModuleType("librosa")
        util = types.ModuleType("librosa.util")
        filters = types.ModuleType("librosa.filters")

        def _mel(sr, n_fft, n_mels, fmin, fmax):
            # old positional librosa.filters.mel API used at reference
            # mel_processing.py:78,96
            return mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

        def _unused(*a, **k):  # imported by mel_processing, never called here
            raise NotImplementedError

        filters.mel = _mel
        util.normalize = util.pad_center = util.tiny = _unused
        lib.util, lib.filters = util, filters
        sys.modules["librosa"] = lib
        sys.modules["librosa.util"] = util
        sys.modules["librosa.filters"] = filters

    try:
        import commons as ref_commons
        import losses as ref_losses
        import mel_processing as ref_mel
        import models as ref_models
    finally:
        # the reference modules keep their bound references; drop the stubs
        # so unrelated tests in this process never see a fake librosa
        if librosa_stubbed:
            for name in ("librosa", "librosa.util", "librosa.filters"):
                sys.modules.pop(name, None)

    return ref_models, ref_losses, ref_commons, ref_mel


@pytest.fixture(scope="module")
def results():
    """Run one training forward + loss assembly in both frameworks."""
    ref_models, ref_losses, ref_commons, ref_mel = (
        _load_reference_training_modules()
    )
    F = torch.nn.functional

    # ---- shared inputs + injected randomness -------------------------
    rng_np = np.random.default_rng(2024)
    tokens = rng_np.integers(1, CFG["n_vocab"], size=(B, T_TEXT))
    for i, n in enumerate(TEXT_LENS):
        tokens[i, n:] = 0
    wav = rng_np.uniform(-0.6, 0.6, size=(B, T_SPEC * HOP)).astype(np.float32)
    for i, n in enumerate(SPEC_LENS):
        wav[i, n * HOP:] = 0.0
    post_noise = rng_np.normal(size=(B, T_SPEC, CFG["inter_channels"]))
    post_noise = post_noise.astype(np.float32)
    dp_noise = rng_np.normal(size=(B, T_TEXT, 2)).astype(np.float32)
    slice_u = rng_np.uniform(0.0, 1.0, size=(B,)).astype(np.float32)
    ids_slice = (
        slice_u * (np.array(SPEC_LENS) - CFG["segment_size"] + 1)
    ).astype(np.int32)

    # input spectrogram: computed once (our MXU STFT, itself parity-tested
    # vs torch.stft ≤1e-4 in tests/test_ops.py) and fed to BOTH frameworks
    spec_j = linear_spectrogram(jnp.asarray(wav), MEL_CFG)  # [B, T, 513]
    spec_np = np.asarray(spec_j)

    # ---- our side: init, forward, losses ------------------------------
    ours = SynthesizerTrn(**CFG)
    rng = jax.random.PRNGKey(7)
    g_params = ours.init(
        {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
        jnp.ones((1, 16), jnp.int32),
        jnp.array([16]),
        jnp.zeros((1, 48, CFG["spec_channels"])),
        jnp.array([48]),
        jnp.array([0]),
    )
    d_model = MultiPeriodDiscriminator()
    d_params = d_model.init(
        jax.random.PRNGKey(8),
        jnp.zeros((1, SEG_SAMPLES)),
        jnp.zeros((1, SEG_SAMPLES)),
    )

    out = ours.apply(
        g_params,
        jnp.asarray(tokens, jnp.int32),
        jnp.asarray(TEXT_LENS, jnp.int32),
        spec_j,
        jnp.asarray(SPEC_LENS, jnp.int32),
        jnp.asarray(SIDS, jnp.int32),
        deterministic=True,
        slice_ids=jnp.asarray(ids_slice),
        posterior_noise=jnp.asarray(post_noise),
        dp_noise=jnp.asarray(dp_noise),
    )

    # loss assembly exactly as train/step.py:112-181
    y_hat = out["wav_hat"]
    mel_full = spec_to_mel(spec_j, MEL_CFG)
    y_mel = slice_segments(mel_full, jnp.asarray(ids_slice), CFG["segment_size"])
    y_seg = slice_segments(
        jnp.asarray(wav), jnp.asarray(ids_slice) * HOP, SEG_SAMPLES
    )
    y_hat_mel = mel_spectrogram(y_hat, MEL_CFG)
    y_d_r, y_d_g, fmap_r, fmap_g = d_model.apply(d_params, y_seg, y_hat)
    loss_disc, _, _ = our_losses.discriminator_loss(y_d_r, y_d_g)
    loss_dur = jnp.sum(out["l_length"].astype(jnp.float32))
    loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * C_MEL
    loss_kl = our_losses.kl_loss(
        out["z_p"], out["logs_q"], out["m_p"], out["logs_p"], out["y_mask"]
    ) * C_KL
    loss_fm = our_losses.feature_loss(fmap_r, fmap_g)
    loss_gen, _ = our_losses.generator_loss(y_d_g)

    # ---- our side: gradients of the same losses ------------------------
    def g_total_loss(gp):
        o = ours.apply(
            {"params": gp},
            jnp.asarray(tokens, jnp.int32),
            jnp.asarray(TEXT_LENS, jnp.int32),
            spec_j,
            jnp.asarray(SPEC_LENS, jnp.int32),
            jnp.asarray(SIDS, jnp.int32),
            deterministic=True,
            slice_ids=jnp.asarray(ids_slice),
            posterior_noise=jnp.asarray(post_noise),
            dp_noise=jnp.asarray(dp_noise),
        )
        yh = o["wav_hat"]
        yh_mel = mel_spectrogram(yh, MEL_CFG)
        _, ydg, fr, fg = d_model.apply(d_params, y_seg, yh)
        l_dur = jnp.sum(o["l_length"].astype(jnp.float32))
        l_mel = jnp.mean(jnp.abs(y_mel - yh_mel)) * C_MEL
        l_kl = our_losses.kl_loss(
            o["z_p"], o["logs_q"], o["m_p"], o["logs_p"], o["y_mask"]
        ) * C_KL
        l_fm = our_losses.feature_loss(fr, fg)
        l_gen, _ = our_losses.generator_loss(ydg)
        return l_gen + l_fm + l_mel + l_dur + l_kl

    def d_total_loss(dp):
        ydr, ydg, _, _ = d_model.apply(
            {"params": dp}, y_seg, jax.lax.stop_gradient(y_hat)
        )
        l_disc, _, _ = our_losses.discriminator_loss(ydr, ydg)
        return l_disc

    grads_g = jax.grad(g_total_loss)(g_params["params"])
    grads_d = jax.grad(d_total_loss)(d_params["params"])
    grads_g_t = tc.flax_to_torch({"params": grads_g})
    grads_d_t = tc.flax_to_torch({"params": grads_d})

    ours_out = {
        "attn": np.asarray(out["attn"]),
        "z": np.asarray(out["z"]),
        "z_p": np.asarray(out["z_p"]),
        "m_p": np.asarray(out["m_p"]),
        "logs_p": np.asarray(out["logs_p"]),
        "m_q": np.asarray(out["m_q"]),
        "logs_q": np.asarray(out["logs_q"]),
        "l_length": np.asarray(out["l_length"]),
        "y_hat": np.asarray(y_hat),
        "y_mel": np.asarray(y_mel),
        "ids_slice": ids_slice,
        "losses": {
            "disc": float(loss_disc), "gen": float(loss_gen),
            "fm": float(loss_fm), "mel": float(loss_mel),
            "dur": float(loss_dur), "kl": float(loss_kl),
        },
    }

    # ---- torch side: same weights, same injected randomness -----------
    net_g = ref_models.SynthesizerTrn(
        CFG["n_vocab"], CFG["spec_channels"], CFG["segment_size"],
        inter_channels=CFG["inter_channels"],
        hidden_channels=CFG["hidden_channels"],
        filter_channels=CFG["filter_channels"],
        n_heads=CFG["n_heads"], n_layers=CFG["n_layers"],
        kernel_size=CFG["kernel_size"], p_dropout=CFG["p_dropout"],
        resblock=CFG["resblock"],
        resblock_kernel_sizes=list(CFG["resblock_kernel_sizes"]),
        resblock_dilation_sizes=[
            list(d) for d in CFG["resblock_dilation_sizes"]
        ],
        upsample_rates=list(CFG["upsample_rates"]),
        upsample_initial_channel=CFG["upsample_initial_channel"],
        upsample_kernel_sizes=list(CFG["upsample_kernel_sizes"]),
        n_speakers=CFG["n_speakers"], gin_channels=CFG["gin_channels"],
        use_sdp=True,
    )
    g_state = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in tc.flax_to_torch(g_params).items()
    }
    missing, unexpected = net_g.load_state_dict(g_state, strict=False)
    assert unexpected == [], f"unexpected G keys: {unexpected[:6]}"
    assert missing == [], f"missing G keys: {missing[:6]}"
    net_g.eval()

    net_d = ref_models.MultiPeriodDiscriminator(use_spectral_norm=False)
    d_state = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in tc.flax_to_torch(d_params).items()
    }
    missing, unexpected = net_d.load_state_dict(d_state, strict=False)
    assert unexpected == [], f"unexpected D keys: {unexpected[:6]}"
    assert missing == [], f"missing D keys: {missing[:6]}"
    net_d.eval()

    x_t = torch.from_numpy(tokens.astype(np.int64))
    x_lengths_t = torch.LongTensor(TEXT_LENS)
    spec_t = torch.from_numpy(
        np.ascontiguousarray(spec_np.transpose(0, 2, 1))
    )
    spec_lengths_t = torch.LongTensor(SPEC_LENS)
    sid_t = torch.LongTensor(SIDS)
    y_t = torch.from_numpy(wav[:, None, :])  # [B, 1, S]

    # inject the three stochastic draws, in the order the training forward
    # consumes them: randn_like → posterior noise (models.py:240),
    # randn → SDP e_q (models.py:67), rand → slice window (commons.py:65)
    real_randn = torch.randn
    real_randn_like = torch.randn_like
    real_rand = torch.rand
    try:
        torch.randn_like = lambda t: torch.from_numpy(
            np.ascontiguousarray(post_noise.transpose(0, 2, 1))
        )
        torch.randn = lambda *s, **k: torch.from_numpy(
            np.ascontiguousarray(dp_noise.transpose(0, 2, 1))
        )
        torch.rand = lambda *s, **k: torch.from_numpy(slice_u)
        with torch.no_grad():
            (
                y_hat_t, l_length_t, attn_t, ids_slice_t, x_mask_t,
                z_mask_t, (z_t, z_p_t, m_p_t, logs_p_t, m_q_t, logs_q_t),
            ) = net_g(x_t, x_lengths_t, spec_t, spec_lengths_t, sid_t)
    finally:
        torch.randn = real_randn
        torch.randn_like = real_randn_like
        torch.rand = real_rand

    # loss assembly exactly as reference finetune_speaker_v2.py:184-232
    with torch.no_grad():
        mel_t = ref_mel.spec_to_mel_torch(
            spec_t, 1024, 80, 22050, 0.0, None
        )
        y_mel_t = ref_commons.slice_segments(
            mel_t, ids_slice_t, CFG["segment_size"]
        )
        y_hat_mel_t = ref_mel.mel_spectrogram_torch(
            y_hat_t.squeeze(1), 1024, 80, 22050, 256, 1024, 0.0, None
        )
        y_seg_t = ref_commons.slice_segments(
            y_t, ids_slice_t * HOP, SEG_SAMPLES
        )
        y_d_r_t, y_d_g_t, fmap_r_t, fmap_g_t = net_d(y_seg_t, y_hat_t)
        loss_disc_t, _, _ = ref_losses.discriminator_loss(y_d_r_t, y_d_g_t)
        loss_dur_t = torch.sum(l_length_t.float())
        loss_mel_t = F.l1_loss(y_mel_t, y_hat_mel_t) * C_MEL
        loss_kl_t = ref_losses.kl_loss(
            z_p_t, logs_q_t, m_p_t, logs_p_t, z_mask_t
        ) * C_KL
        loss_fm_t = ref_losses.feature_loss(fmap_r_t, fmap_g_t)
        loss_gen_t, _ = ref_losses.generator_loss(y_d_g_t)

    # ---- torch side: gradients via autograd over the same assembly ----
    # (reference finetune_speaker_v2.py:206-232: D loss on detached audio,
    # G total = gen + fm + mel + dur + kl)
    try:
        torch.randn_like = lambda t: torch.from_numpy(
            np.ascontiguousarray(post_noise.transpose(0, 2, 1))
        )
        torch.randn = lambda *s, **k: torch.from_numpy(
            np.ascontiguousarray(dp_noise.transpose(0, 2, 1))
        )
        torch.rand = lambda *s, **k: torch.from_numpy(slice_u)
        yg_hat, lg_length, _, ids_g, _, zg_mask, \
            (zg, zg_p, mg_p, logsg_p, mg_q, logsg_q) = net_g(
                x_t, x_lengths_t, spec_t, spec_lengths_t, sid_t
            )
    finally:
        torch.randn = real_randn
        torch.randn_like = real_randn_like
        torch.rand = real_rand
    assert (ids_g.numpy() == ids_slice).all()

    yg_mel = ref_commons.slice_segments(mel_t, ids_g, CFG["segment_size"])
    yg_hat_mel = ref_mel.mel_spectrogram_torch(
        yg_hat.squeeze(1), 1024, 80, 22050, 256, 1024, 0.0, None
    )
    yg_seg = ref_commons.slice_segments(y_t, ids_g * HOP, SEG_SAMPLES)

    net_d.zero_grad()
    d_r_g, d_g_g, _, _ = net_d(yg_seg, yg_hat.detach())
    loss_disc_g, _, _ = ref_losses.discriminator_loss(d_r_g, d_g_g)
    loss_disc_g.backward()
    torch_grads_d = {
        k: p.grad.detach().numpy().copy()
        for k, p in net_d.named_parameters() if p.grad is not None
    }

    net_g.zero_grad()
    net_d.zero_grad()
    _, d_g_g2, fmap_r_g, fmap_g_g = net_d(yg_seg, yg_hat)
    loss_gen_g, _ = ref_losses.generator_loss(d_g_g2)
    loss_fm_g = ref_losses.feature_loss(fmap_r_g, fmap_g_g)
    loss_mel_g = F.l1_loss(yg_mel, yg_hat_mel) * C_MEL
    loss_dur_g = torch.sum(lg_length.float())
    loss_kl_g = ref_losses.kl_loss(
        zg_p, logsg_q, mg_p, logsg_p, zg_mask
    ) * C_KL
    (loss_gen_g + loss_fm_g + loss_mel_g + loss_dur_g + loss_kl_g).backward()
    torch_grads_g = {
        k: p.grad.detach().numpy().copy()
        for k, p in net_g.named_parameters() if p.grad is not None
    }

    theirs_out = {
        "attn": attn_t.squeeze(1).numpy(),
        "z": z_t.numpy().transpose(0, 2, 1),
        "z_p": z_p_t.numpy().transpose(0, 2, 1),
        "m_p": m_p_t.numpy().transpose(0, 2, 1),
        "logs_p": logs_p_t.numpy().transpose(0, 2, 1),
        "m_q": m_q_t.numpy().transpose(0, 2, 1),
        "logs_q": logs_q_t.numpy().transpose(0, 2, 1),
        "l_length": l_length_t.numpy(),
        "y_hat": y_hat_t.squeeze(1).numpy(),
        "y_mel": y_mel_t.numpy().transpose(0, 2, 1),
        "ids_slice": ids_slice_t.numpy(),
        "losses": {
            "disc": float(loss_disc_t), "gen": float(loss_gen_t),
            "fm": float(loss_fm_t), "mel": float(loss_mel_t),
            "dur": float(loss_dur_t), "kl": float(loss_kl_t),
        },
        "grads_g": torch_grads_g,
        "grads_d": torch_grads_d,
    }
    ours_out["grads_g"] = grads_g_t
    ours_out["grads_d"] = grads_d_t
    return ours_out, theirs_out


class TestTrainingGraphParity:
    def test_slice_windows_identical(self, results):
        ours, theirs = results
        np.testing.assert_array_equal(ours["ids_slice"], theirs["ids_slice"])

    def test_mas_path_identical(self, results):
        ours, theirs = results
        assert ours["attn"].shape == theirs["attn"].shape
        mismatch = int(np.sum(ours["attn"] != theirs["attn"]))
        assert mismatch == 0, f"MAS paths differ at {mismatch} cells"

    def test_durations_identical(self, results):
        ours, theirs = results
        w_ours = ours["attn"].sum(axis=1)
        w_theirs = theirs["attn"].sum(axis=1)
        np.testing.assert_array_equal(w_ours, w_theirs)

    @pytest.mark.parametrize(
        "key", ["z", "z_p", "m_p", "logs_p", "m_q", "logs_q"]
    )
    def test_latent_intermediates(self, results, key):
        ours, theirs = results
        err = np.abs(ours[key] - theirs[key]).max()
        assert err <= 1e-3, f"{key} max abs err {err}"

    def test_segment_audio(self, results):
        ours, theirs = results
        err = np.abs(ours["y_hat"] - theirs["y_hat"]).max()
        assert err <= 1e-3, f"decoded segment max abs err {err}"

    def test_target_mel_segment(self, results):
        ours, theirs = results
        err = np.abs(ours["y_mel"] - theirs["y_mel"]).max()
        assert err <= 1e-3, f"target mel segment max abs err {err}"

    def test_duration_nll_per_sample(self, results):
        ours, theirs = results
        err = np.abs(ours["l_length"] - theirs["l_length"]).max()
        assert err <= 1e-3, f"SDP NLL per-sample max abs err {err}"

    @pytest.mark.parametrize("name", ["disc", "gen", "fm", "mel", "dur", "kl"])
    def test_loss_terms(self, results, name):
        ours, theirs = results
        a, b = ours["losses"][name], theirs["losses"][name]
        err = abs(a - b)
        assert err <= 1e-3, f"loss_{name}: ours {a} vs torch {b} (err {err})"

    def test_optimizer_update_matches_torch(self):
        """The update rule itself: optax adamw + staircase exponential decay
        (train/state.py) vs torch AdamW + per-epoch ExponentialLR (reference
        finetune_speaker_v2.py:133-148), stepped through two epochs on
        identical gradients."""
        import optax

        from personalized_text_to_speech_tpu.train.state import make_optimizer

        rng = np.random.default_rng(5)
        p0 = rng.normal(size=(4, 3)).astype(np.float32)
        grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(6)]

        tx = make_optimizer(
            2e-4, (0.8, 0.99), 1e-9, 0.999875, steps_per_epoch=2
        )
        params = {"w": jnp.asarray(p0)}
        state = tx.init(params)
        ours = []
        for g in grads:
            updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
            params = optax.apply_updates(params, updates)
            ours.append(np.asarray(params["w"]))

        w = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        opt = torch.optim.AdamW([w], lr=2e-4, betas=(0.8, 0.99), eps=1e-9)
        sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.999875)
        for i, g in enumerate(grads):
            opt.zero_grad()
            w.grad = torch.from_numpy(g.copy())
            opt.step()
            np.testing.assert_allclose(
                ours[i], w.detach().numpy(), rtol=1e-6, atol=1e-9,
                err_msg=f"param divergence at step {i}",
            )
            if i % 2 == 1:  # reference steps the scheduler once per epoch
                sched.step()

    @pytest.mark.parametrize("which", ["grads_g", "grads_d"])
    def test_gradient_parity(self, results, which):
        """Every parameter gradient matches torch autograd: same keys
        (flax_to_torch maps gradient pytrees exactly like weights), and
        values within fp32 backward accumulation noise."""
        ours, theirs = results
        a, b = ours[which], theirs[which]
        assert set(a) == set(b), (
            f"gradient key mismatch: only-ours "
            f"{sorted(set(a) - set(b))[:4]}, only-torch "
            f"{sorted(set(b) - set(a))[:4]}"
        )
        gscale = max(float(np.abs(v).max()) for v in b.values())
        bad = {}
        for k in b:
            ga = np.asarray(a[k], dtype=np.float32)
            gb = b[k]
            assert ga.shape == gb.shape, (k, ga.shape, gb.shape)
            err = np.abs(ga - gb).max()
            # absolute tolerance on the global gradient scale: per-tensor
            # relative bounds explode on near-zero gradients
            if err > 2e-3 * gscale + 1e-6:
                bad[k] = float(err)
        assert not bad, (
            f"{which}: {len(bad)}/{len(b)} tensors beyond tolerance "
            f"(scale {gscale:.3g}): "
            f"{dict(sorted(bad.items(), key=lambda kv: -kv[1])[:6])}"
        )
