"""Gradient accumulation == the fused big-batch step, exactly.

The accumulation mode (train/step.py ``accum_steps > 1``) claims *exact*
full-batch semantics: with dropout off, running k microbatches through the
two-phase scan must reproduce the fused step's gradients and every reported
metric up to float reduction order.  The reference has no accumulation at
all (``finetune_speaker_v2.py`` steps every batch); this feature exists so
memory-limited geometries (e.g. batch 128 × 800-frame segments on a
constrained HBM budget) can still train with large-batch dynamics.

These tests run the same batch + rng through ``accum_steps=1`` and
``accum_steps=2/4`` and assert:

* every scalar metric (all six loss terms, per-discriminator breakdowns,
  grad norms) agrees ≤1e-5 relative,
* both networks' GRADIENT trees agree leaf-by-leaf at the sharding-test
  tolerance (rtol 1e-4, atol 1e-6×global scale) — gradients are the right
  comparison surface: at step 1 Adam's bias-corrected update is
  ``±lr·sign(g)``, so reduction-order noise on a near-zero gradient
  coordinate flips an entire lr-sized parameter step (same rationale as
  tests/test_sharding.py),
* the spectral-norm discriminator's power-iteration state advances to the
  identical u/v estimates (the iteration is weight-only, so the
  accumulation path's dummy-input advance must be state-identical to the
  fused step's full-batch advance).

Dropout is disabled (``make_train_step(deterministic=True)`` — the duration
predictors hardwire p=0.5 for reference parity, so the model config cannot
turn it off) because the fused step draws one full-batch dropout mask while
accumulation draws per-microbatch masks — the only intended divergence
between the modes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from personalized_text_to_speech_tpu.models.discriminator import (
    MultiPeriodDiscriminator,
)
from personalized_text_to_speech_tpu.train.state import create_train_state
from personalized_text_to_speech_tpu.train.step import Batch, make_train_step
from tests.test_model import tiny_model
from tests.test_train import HOP, tiny_hps


def _setup(use_spectral: bool = False, use_sdp: bool = True):
    hps = tiny_hps()
    if use_spectral:
        hps.model["use_spectral_norm"] = True
    g_model = tiny_model(p_dropout=0.0, use_sdp=use_sdp)
    d_model = MultiPeriodDiscriminator(
        periods=(2, 3), use_spectral_norm=use_spectral
    )

    rng = jax.random.PRNGKey(0)
    b, tt, ts = 4, 6, 24
    x = jnp.ones((b, tt), dtype=jnp.int32)
    xl = jnp.full((b,), tt)
    spec = jnp.zeros((b, ts, 33))
    sl = jnp.full((b,), ts)
    sid = jnp.zeros((b,), jnp.int32)
    g_params = g_model.init(
        {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
        x, xl, spec, sl, sid,
    )["params"]
    wav0 = jnp.zeros((b, 8 * HOP))
    d_vars = d_model.init(rng, wav0, wav0)
    d_params = d_vars["params"]
    d_mut = (
        {"spectral": d_vars["spectral"]} if "spectral" in d_vars else None
    )

    rng_np = np.random.default_rng(0)
    t = np.linspace(0, 8, ts * HOP)
    wav = np.stack(
        [
            np.sin(2 * np.pi * (20 + 7 * i) * t) * (0.3 + 0.1 * i)
            for i in range(b)
        ]
    ).astype(np.float32)
    batch = Batch(
        text=jnp.asarray(
            rng_np.integers(1, 10, size=(b, tt)), dtype=jnp.int32
        ),
        text_lengths=jnp.array([6, 5, 6, 4], dtype=jnp.int32),
        wav=jnp.asarray(wav),
        wav_lengths=jnp.array(
            [ts * HOP, (ts - 4) * HOP, ts * HOP, (ts - 6) * HOP],
            dtype=jnp.int32,
        ),
        sid=jnp.array([0, 1, 2, 3], dtype=jnp.int32),
    )

    def states():
        g_state = create_train_state(
            g_model.apply, g_params, hps, steps_per_epoch=4
        )
        d_state = create_train_state(
            d_model.apply, d_params, hps, steps_per_epoch=4
        )
        if d_mut is not None:
            d_state = d_state.replace(mutables=d_mut)
        return g_state, d_state

    return hps, g_model, d_model, states, batch


def _run(hps, g_model, d_model, states, batch, k):
    """One optimizer step; returns (g_state, d_state, scalar metrics, grads)."""
    step = jax.jit(
        make_train_step(
            g_model, d_model, hps,
            debug_grads=True, accum_steps=k, deterministic=True,
        ),
        donate_argnums=(),
    )
    g_state, d_state = states()
    g_state, d_state, metrics = step(
        g_state, d_state, batch, jax.random.PRNGKey(100)
    )
    scalars = {
        m: float(v) for m, v in metrics.items() if not m.startswith("_")
    }
    grads = {"g": metrics["_grads_g"], "d": metrics["_grads_d"]}
    return g_state, d_state, scalars, grads


def _assert_scalars_match(s1, sk, tol=1e-5):
    assert set(s1) == set(sk)
    for name in s1:
        err = abs(s1[name] - sk[name])
        assert err <= tol * max(1.0, abs(s1[name])), (
            f"metric {name}: fused {s1[name]} vs accum {sk[name]}"
        )


def _assert_grads_match(a, b, what):
    """Same tolerance convention as tests/test_sharding.py:239-250."""
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(b)
    }
    assert len(la) == len(lb)
    scale = max(float(np.abs(np.asarray(v)).max()) for _, v in la)
    for p, va in la:
        key = jax.tree_util.keystr(p)
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(lb[key]),
            rtol=1e-4, atol=1e-6 * max(scale, 1.0),
            err_msg=f"{what}{key}",
        )


def _assert_params_sane(a, b, what, atol=2e-3):
    """Loose post-Adam check only (±lr sign flips on near-zero gradient
    coordinates are expected; lr=2e-4)."""
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    for va, vb in zip(la, lb):
        err = np.abs(np.asarray(va) - np.asarray(vb)).max()
        assert err <= atol, f"{what}: post-update drift {err}"


class TestAccumEqualsFused:
    @pytest.mark.parametrize("k", [2, 4])
    def test_metrics_and_grads_match(self, k):
        hps, g_model, d_model, states, batch = _setup()
        g1, d1, s1, gr1 = _run(hps, g_model, d_model, states, batch, 1)
        gk, dk, sk, grk = _run(hps, g_model, d_model, states, batch, k)

        _assert_scalars_match(s1, sk)
        _assert_grads_match(gr1["g"], grk["g"], f"G grad (k={k}) ")
        _assert_grads_match(gr1["d"], grk["d"], f"D grad (k={k}) ")
        _assert_params_sane(g1.params, gk.params, "G params")
        _assert_params_sane(d1.params, dk.params, "D params")

    def test_non_sdp_duration_path(self):
        """The deterministic duration predictor normalizes by Σx_mask too
        (models/synthesizer.py:407-409) — the rescale must hold there."""
        hps, g_model, d_model, states, batch = _setup(use_sdp=False)
        _, _, s1, gr1 = _run(hps, g_model, d_model, states, batch, 1)
        _, _, sk, grk = _run(hps, g_model, d_model, states, batch, 2)
        _assert_scalars_match(s1, sk)
        _assert_grads_match(gr1["g"], grk["g"], "G grad (non-SDP) ")

    def test_spectral_norm_state_identical(self):
        """Power iteration advances once per optimizer step in both modes
        and lands on the same u/v (it reads only the kernel)."""
        hps, g_model, d_model, states, batch = _setup(use_spectral=True)
        _, d1, s1, gr1 = _run(hps, g_model, d_model, states, batch, 1)
        _, dk, sk, grk = _run(hps, g_model, d_model, states, batch, 2)
        _assert_scalars_match(s1, sk)
        _assert_grads_match(gr1["d"], grk["d"], "D grad (spectral) ")
        _assert_grads_match(
            d1.mutables["spectral"], dk.mutables["spectral"], "spectral u/v "
        )

    def test_batch_not_divisible_raises(self):
        hps, g_model, d_model, states, batch = _setup()
        step = make_train_step(g_model, d_model, hps, accum_steps=3)
        g_state, d_state = states()
        with pytest.raises(ValueError, match="not divisible"):
            step(g_state, d_state, batch, jax.random.PRNGKey(0))
