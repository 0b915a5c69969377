"""Train states and optimizers for the two-network GAN.

Optimizer parity with the reference (reference ``finetune_speaker_v2.py:133-148``,
``configs/finetune_speaker.json:7-12``): AdamW lr 2e-4, betas (0.8, 0.99),
eps 1e-9, torch-default weight decay 0.01, and a per-epoch exponential lr
decay γ=0.999875 (implemented as a staircase schedule over
``steps_per_epoch``).  The reference computes grad norms but never clips
(``clip_grad_value_(…, None)``, ``finetune_speaker_v2.py:213,230``) — we do
the same: norms are logged, not clipped.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """Standard flax TrainState; ``epoch`` tracked host-side.

    ``mutables`` carries non-parameter variable collections that the step
    updates in-graph — today that is the spectral-norm power-iteration
    state ``{"spectral": ...}`` of the ``use_spectral_norm=True``
    discriminator; ``None`` for every other network."""

    mutables: Optional[Any] = None


def make_optimizer(
    learning_rate: float,
    betas=(0.8, 0.99),
    eps: float = 1e-9,
    lr_decay: float = 0.999875,
    steps_per_epoch: int = 1,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=learning_rate,
        transition_steps=max(steps_per_epoch, 1),
        decay_rate=lr_decay,
        staircase=True,
    )
    return optax.adamw(
        learning_rate=schedule,
        b1=betas[0],
        b2=betas[1],
        eps=eps,
        weight_decay=weight_decay,
    )


def create_train_state(
    apply_fn, params, hps, steps_per_epoch: int, mutables: Optional[Any] = None
) -> TrainState:
    tx = make_optimizer(
        learning_rate=hps.train.learning_rate,
        betas=tuple(hps.train.betas),
        eps=hps.train.eps,
        lr_decay=hps.train.lr_decay,
        steps_per_epoch=steps_per_epoch,
    )
    return TrainState.create(
        apply_fn=apply_fn, params=params, tx=tx, mutables=mutables
    )


def global_norm(tree: Any) -> jnp.ndarray:
    """Global L2 norm across a gradient pytree (the metric the reference
    logs as grad_norm_g/grad_norm_d, ``commons.py:149-164``)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
    )
