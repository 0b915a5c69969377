"""The fused GAN train step: one generator forward, torch-identical update
ordering, single compiled program.

The reference alternates D-step then G-step per batch, where the G-step runs
the discriminator with its *freshly updated* parameters while reusing the
same generator forward graph (reference ``finetune_speaker_v2.py:180-232``).
PyTorch gets this for free from retained autograd graphs; in JAX we get the
same semantics — **without running the generator twice** — via ``jax.vjp``:

1. ``out, g_vjp = vjp(g_forward, g_params)`` — one generator forward, pullback
   retained,
2. D update on ``stop_gradient(out)`` (its own grad),
3. G losses computed *from* ``out`` through the updated D; ``grad`` w.r.t.
   ``out`` is pulled back through ``g_vjp`` to parameter space.

Everything (both optimizer updates, mel extraction on-device, MAS) is one
jitted program; under a sharded-batch ``jit`` the gradient all-reduces over
ICI are emitted automatically by XLA.  Losses accumulate fp32.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from personalized_text_to_speech_tpu.ops.masking import slice_segments
from personalized_text_to_speech_tpu.ops.spectrogram import (
    MelConfig,
    linear_spectrogram,
    mel_spectrogram,
    spec_to_mel,
)
from personalized_text_to_speech_tpu.train import losses
from personalized_text_to_speech_tpu.train.state import TrainState, global_norm


class Batch(NamedTuple):
    """One padded training batch (bucketed static shapes).

    Only raw audio ships to the device — the linear spectrogram is computed
    inside the jitted step on the MXU (the reference ran ``torch.stft`` on
    CPU inside DataLoader workers, ``data_utils.py:84-86``, a host bottleneck
    this design removes).  ``wav`` is padded to a whole number of hops; the
    frame count is ``len(wav) // hop``.
    """

    text: jnp.ndarray  # [B, Tt] int32
    text_lengths: jnp.ndarray  # [B]
    wav: jnp.ndarray  # [B, Ts*hop] float32
    wav_lengths: jnp.ndarray  # [B] samples
    sid: jnp.ndarray  # [B]


def make_train_step(g_model, d_model, hps, debug_grads: bool = False):
    """Build the jittable (g_state, d_state, batch, rng) → (states, metrics).

    ``debug_grads=True`` adds the raw gradient pytrees to the metrics under
    ``_grads_g``/``_grads_d`` — used by the sharded-equivalence tests and
    the multichip dryrun, because gradients compare exactly across
    shardings while post-Adam parameters do not (at step 1 Adam's
    bias-corrected update is ``±lr·sign(g)``, so reduction-order noise on a
    near-zero gradient coordinate flips an entire ``lr``-sized step)."""
    mel_cfg = MelConfig.from_hparams(hps)
    seg_frames = hps.train.segment_size // hps.data.hop_length
    seg_samples = hps.train.segment_size
    hop = hps.data.hop_length
    c_mel = hps.train.c_mel
    c_kl = hps.train.c_kl

    use_spectral = bool(hps.model.get("use_spectral_norm", False))

    def train_step(
        g_state: TrainState,
        d_state: TrainState,
        batch: Batch,
        rng: jax.Array,
    ) -> Tuple[TrainState, TrainState, Dict[str, jnp.ndarray]]:
        rng_noise, rng_slice, rng_dropout = jax.random.split(rng, 3)

        # ---- 0. on-device feature extraction ----------------------------
        spec = linear_spectrogram(batch.wav, mel_cfg)  # [B, Ts, n_freq]
        spec_lengths = (batch.wav_lengths // hop).astype(jnp.int32)

        # random training windows: the slice start depends only on lengths
        # and rng, so it is sampled here (outside the differentiated graph —
        # the G-loss ``grad`` over the forward outputs needs an all-float
        # pytree)
        b = batch.wav.shape[0]
        ids_max = jnp.maximum(spec_lengths - seg_frames + 1, 1)
        u = jax.random.uniform(rng_slice, (b,))
        ids_slice = (u * ids_max.astype(u.dtype)).astype(jnp.int32)

        # ---- 1. generator forward with retained pullback ----------------
        def g_forward(g_params):
            return g_model.apply(
                {"params": g_params},
                batch.text,
                batch.text_lengths,
                spec,
                spec_lengths,
                batch.sid,
                deterministic=False,
                slice_ids=ids_slice,
                rngs={"noise": rng_noise, "dropout": rng_dropout},
            )

        out, g_vjp = jax.vjp(g_forward, g_state.params)

        y_hat = out["wav_hat"]  # [B, seg_samples]

        # ---- 2. targets (on-device DSP; reference did this on CPU workers)
        mel_full = spec_to_mel(spec, mel_cfg)  # [B, Ts, n_mels]
        y_mel = slice_segments(mel_full, ids_slice, seg_frames)
        y_seg = slice_segments(batch.wav, ids_slice * hop, seg_samples)

        # ---- 3. discriminator update on detached audio -------------------
        y_hat_sg = jax.lax.stop_gradient(y_hat)

        def d_loss_fn(d_params):
            if use_spectral:
                # spectral-norm D: the power-iteration state advances one
                # step here (torch iterates on every training forward); the
                # G-step below reuses the updated estimate frozen
                (y_d_r, y_d_g, _, _), new_vars = d_model.apply(
                    {"params": d_params, **(d_state.mutables or {})},
                    y_seg, y_hat_sg, mutable=["spectral"],
                )
            else:
                y_d_r, y_d_g, _, _ = d_model.apply(
                    {"params": d_params}, y_seg, y_hat_sg
                )
                new_vars = None
            loss_disc, r_losses, g_losses = losses.discriminator_loss(
                y_d_r, y_d_g
            )
            return loss_disc, (r_losses, g_losses, new_vars)

        (
            (loss_disc, (d_r_losses, d_g_losses, d_new_vars)),
            grads_d,
        ) = jax.value_and_grad(d_loss_fn, has_aux=True)(d_state.params)
        grad_norm_d = global_norm(grads_d)
        d_state = d_state.apply_gradients(grads=grads_d)
        if use_spectral:
            d_state = d_state.replace(mutables=dict(d_new_vars))

        # ---- 4. generator losses through the UPDATED discriminator -------
        def g_loss_from_out(g_out):
            y_hat_mel = mel_spectrogram(g_out["wav_hat"], mel_cfg)
            _, y_d_g, fmap_r, fmap_g = d_model.apply(
                {"params": d_state.params, **(d_state.mutables or {})},
                y_seg, g_out["wav_hat"],
            )
            loss_dur = jnp.sum(g_out["l_length"].astype(jnp.float32))
            loss_mel = (
                jnp.mean(jnp.abs(y_mel - y_hat_mel).astype(jnp.float32)) * c_mel
            )
            loss_kl = (
                losses.kl_loss(
                    g_out["z_p"],
                    g_out["logs_q"],
                    g_out["m_p"],
                    g_out["logs_p"],
                    g_out["y_mask"],
                )
                * c_kl
            )
            loss_fm = losses.feature_loss(fmap_r, fmap_g)
            loss_gen, gen_losses = losses.generator_loss(y_d_g)
            total = loss_gen + loss_fm + loss_mel + loss_dur + loss_kl
            return total, {
                "loss_gen": loss_gen,
                "loss_fm": loss_fm,
                "loss_mel": loss_mel,
                "loss_dur": loss_dur,
                "loss_kl": loss_kl,
                "gen_losses": gen_losses,
            }

        (loss_gen_all, gen_metrics), out_grads = jax.value_and_grad(
            g_loss_from_out, has_aux=True
        )(out)
        (grads_g,) = g_vjp(out_grads)
        grad_norm_g = global_norm(grads_g)
        g_state = g_state.apply_gradients(grads=grads_g)

        metrics = {
            "loss/g/total": loss_gen_all,
            "loss/d/total": loss_disc,
            "grad_norm_g": grad_norm_g,
            "grad_norm_d": grad_norm_d,
            "loss/g/gen": gen_metrics["loss_gen"],
            "loss/g/fm": gen_metrics["loss_fm"],
            "loss/g/mel": gen_metrics["loss_mel"],
            "loss/g/dur": gen_metrics["loss_dur"],
            "loss/g/kl": gen_metrics["loss_kl"],
        }
        # per-discriminator breakdown (reference finetune_speaker_v2.py:246-248)
        for i, v in enumerate(gen_metrics["gen_losses"]):
            metrics[f"loss/g/{i}"] = v
        for i, v in enumerate(d_r_losses):
            metrics[f"loss/d_r/{i}"] = v
        for i, v in enumerate(d_g_losses):
            metrics[f"loss/d_g/{i}"] = v
        if debug_grads:
            metrics["_grads_g"] = grads_g
            metrics["_grads_d"] = grads_d
        return g_state, d_state, metrics

    return train_step


def make_jitted_train_step(g_model, d_model, hps, donate: bool = True):
    """jit the step (donating both train states).  Sharding comes from the
    ARGUMENT placements: callers device_put the states replicated and the
    batch sharded over the mesh's ``data`` axis (see ``train.loop.Trainer``),
    and XLA inserts the gradient all-reduces."""
    step = make_train_step(g_model, d_model, hps)
    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)
