"""Remat (``jax.checkpoint``) on the generator forward changes memory, not
math: gradients under "dots"/"full" policies must equal the un-remat step's
(train/step.py ``remat=``).  The policies trade backward-pass recompute for
peak activation memory — the standard TPU lever for fitting long-segment
batches in HBM; the torch reference has no equivalent (it would be
``torch.utils.checkpoint``, unused there).

Rematerialization replays the identical primal graph with the identical
PRNG-derived noise (explicitly injected by the step) — only scheduling
changes — so the comparison tolerance is reduction-order-level, same
convention as tests/test_sharding.py.
"""

import jax
import numpy as np
import pytest

from personalized_text_to_speech_tpu.train.step import make_train_step
from tests.test_train_accum import _assert_grads_match, _assert_scalars_match, _setup


def _one_step(hps, g_model, d_model, states, batch, remat, accum_steps=1):
    step = jax.jit(
        make_train_step(
            g_model, d_model, hps,
            debug_grads=True, accum_steps=accum_steps,
            deterministic=True, remat=remat,
        ),
        donate_argnums=(),
    )
    g_state, d_state = states()
    g_state, d_state, metrics = step(
        g_state, d_state, batch, jax.random.PRNGKey(7)
    )
    scalars = {
        m: float(v) for m, v in metrics.items() if not m.startswith("_")
    }
    return scalars, metrics["_grads_g"], metrics["_grads_d"]


class TestRemat:
    @pytest.mark.parametrize("remat", ["dots", "full"])
    def test_grads_identical(self, remat):
        hps, g_model, d_model, states, batch = _setup()
        s0, gg0, gd0 = _one_step(hps, g_model, d_model, states, batch, "none")
        s1, gg1, gd1 = _one_step(hps, g_model, d_model, states, batch, remat)
        _assert_scalars_match(s0, s1)
        _assert_grads_match(gg0, gg1, f"G grad (remat={remat}) ")
        _assert_grads_match(gd0, gd1, f"D grad (remat={remat}) ")

    def test_composes_with_accumulation(self):
        hps, g_model, d_model, states, batch = _setup()
        s0, gg0, _ = _one_step(hps, g_model, d_model, states, batch, "none")
        s1, gg1, _ = _one_step(
            hps, g_model, d_model, states, batch, "dots", accum_steps=2
        )
        _assert_scalars_match(s0, s1)
        _assert_grads_match(gg0, gg1, "G grad (remat+accum) ")

    def test_unknown_policy_raises(self):
        hps, g_model, d_model, states, batch = _setup()
        with pytest.raises(ValueError, match="remat"):
            make_train_step(g_model, d_model, hps, remat="bogus")
