"""The fused GAN train step: one generator forward, torch-identical update
ordering, single compiled program — plus an exact gradient-accumulation mode.

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

Gradient accumulation (``accum_steps > 1``, absent from the reference, which
steps every batch): the batch is split into ``k`` microbatches and scanned
twice — phase 1 accumulates D gradients against the *current* D, D updates
once, phase 2 re-runs the generator per microbatch with a retained pullback
and accumulates G gradients against the *updated* D — so the reference's
D-then-G ordering is preserved exactly.  Each loss term is decomposed so the
microbatch contributions sum to the full-batch value bit-for-bit (up to
float reduction order):

* batch-mean terms (adv/fm/mel/disc) weight each micro-mean by ``1/k``
  (equal micro sizes);
* the duration loss is normalized *inside* the model by its own batch's
  ``Σx_mask`` (models/synthesizer.py:405-409), so each micro contribution is
  rescaled by ``Σx_mask_micro / Σx_mask_full``;
* the masked KL mean divides by ``Σy_mask`` (losses.kl_loss) — the
  denominator is θ-independent, so each micro's KL is rescaled by
  ``Σy_mask_micro / Σy_mask_full``.

With dropout off, ``accum_steps=k`` therefore produces the *same gradients,
updates, and metrics* as the fused step at the full batch (asserted ≤1e-5 in
tests/test_train_accum.py); with dropout on, only the per-microbatch dropout
masks differ.  Peak activation memory drops to one microbatch's backward.
Cost: one extra generator forward per microbatch (phase 1 needs ŷ for the D
update; phase 2 needs a fresh pullback) — the price of torch ordering.

Spectral-norm D under accumulation: the discriminator scores real then fake
in two sequential sub-calls, so one training apply advances the power
iteration twice — real is normalized at u1, fake at u2 (torch's per-forward
hook does the same).  The iteration reads only the kernel and the stored
u/v estimates (models/layers.py:54-117) — never the batch — so phase 1
simply applies mutably from the *same pre-step state* in every microbatch:
each micro reproduces the fused step's exact u1/u2 trajectory, the per-micro
final states are all identical, and micro 0's is kept as the step's new
state.
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


#: remat policies for the generator forward (``hps.train.remat``): trade
#: recompute FLOPs for activation memory under ``jax.vjp``.  "dots" keeps
#: matmul/conv outputs and rematerializes everything elementwise (the usual
#: sweet spot: elementwise fusions are HBM-bound anyway, so recomputing them
#: is nearly free); "full" saves nothing and recomputes the whole forward.
_REMAT_POLICIES = {
    "none": None,
    "dots": "dots_with_no_batch_dims_saveable",
    "full": "nothing_saveable",
}


def _wrap_remat(fn, remat: str):
    # validity is checked once at build time in make_train_step
    if remat == "none":
        return fn
    policy = getattr(jax.checkpoint_policies, _REMAT_POLICIES[remat])
    return jax.checkpoint(fn, policy=policy)


def make_train_step(
    g_model,
    d_model,
    hps,
    debug_grads: bool = False,
    accum_steps: int = 1,
    deterministic: bool = False,
    remat: str = "none",
    sp_spec=None,
):
    """Build the jittable (g_state, d_state, batch, rng) → (states, metrics).

    ``debug_grads=True`` adds the raw gradient pytrees to the metrics under
    ``_grads_g``/``_grads_d`` — used by the sharded-equivalence tests and
    the multichip dryrun, because gradients compare exactly across
    shardings while post-Adam parameters do not (at step 1 Adam's
    bias-corrected update is ``±lr·sign(g)``, so reduction-order noise on a
    near-zero gradient coordinate flips an entire ``lr``-sized step).

    ``accum_steps=k`` splits the batch into k microbatches and accumulates
    both networks' gradients with exact full-batch semantics (module
    docstring); the batch size must be divisible by k.

    ``deterministic=True`` disables dropout inside the generator forward —
    used by the accumulation-equivalence tests, because dropout masks are
    the single intended divergence between the fused and accumulation modes
    (one full-batch draw vs per-microbatch draws; the duration predictors
    hardwire p=0.5, models/synthesizer.py:325-331, so no config can turn
    dropout off).

    ``remat`` ("none"/"dots"/"full") applies ``jax.checkpoint`` to the
    generator forward whose pullback the step retains — identical gradients
    (tests/test_train_remat.py), lower peak activation memory, extra
    recompute in the backward.  Composes with ``accum_steps``.

    ``sp_spec`` (a ``NamedSharding`` like ``P('data', 'model', None)``)
    enables sequence parallelism: the derived spectrogram's FRAME axis is
    constraint-pinned to the mesh and GSPMD propagates time-sharding
    through the posterior encoder and flow, inserting conv halo exchanges
    (design: parallel/sp.py).  Callers also shard the input waveform's
    sample axis (``parallel.sp.shard_batch_sp``)."""
    mel_cfg = MelConfig.from_hparams(hps)
    seg_frames = hps.train.segment_size // hps.data.hop_length
    seg_samples = hps.train.segment_size
    hop = hps.data.hop_length
    c_mel = hps.train.c_mel
    c_kl = hps.train.c_kl
    inter_ch = hps.model.inter_channels
    use_sdp = bool(hps.model.get("use_sdp", True))

    use_spectral = bool(hps.model.get("use_spectral_norm", False))
    k = int(accum_steps)
    if k < 1:
        raise ValueError(f"accum_steps must be >= 1, got {k}")
    if remat not in _REMAT_POLICIES:
        raise ValueError(
            f"remat must be one of {sorted(_REMAT_POLICIES)}, got {remat!r}"
        )

    def _sample(batch: Batch, rng: jax.Array):
        """Full-batch noise/slice sampling, shared by both modes so that
        accumulation sees bit-identical samples to the fused step.  The
        injected arrays match the model's internal draws exactly
        (posterior: [B, Ts, inter], synthesizer.py:139-142; SDP latents:
        [B, Tt, 2], duration.py:114-117)."""
        b, tt = batch.text.shape
        ts = batch.wav.shape[1] // hop
        rng_post, rng_dp, rng_slice, rng_drop = jax.random.split(rng, 4)
        spec_lengths = (batch.wav_lengths // hop).astype(jnp.int32)
        # random training windows: the slice start depends only on lengths
        # and rng, so it is sampled here (outside the differentiated graph —
        # the G-loss ``grad`` over the forward outputs needs an all-float
        # pytree)
        ids_max = jnp.maximum(spec_lengths - seg_frames + 1, 1)
        u = jax.random.uniform(rng_slice, (b,))
        ids_slice = (u * ids_max.astype(u.dtype)).astype(jnp.int32)
        post_noise = jax.random.normal(rng_post, (b, ts, inter_ch), jnp.float32)
        dp_noise = (
            jax.random.normal(rng_dp, (b, tt, 2), jnp.float32)
            if use_sdp
            else None
        )
        return spec_lengths, ids_slice, post_noise, dp_noise, rng_drop

    def _apply_g(g_params, mb: Batch, spec, spec_lengths, ids, pn, dpn, rng_drop):
        out = g_model.apply(
            {"params": g_params},
            mb.text,
            mb.text_lengths,
            spec,
            spec_lengths,
            mb.sid,
            deterministic=deterministic,
            slice_ids=ids,
            posterior_noise=pn,
            dp_noise=dpn,
            rngs={"dropout": rng_drop},
        )
        return out

    def _constrain_sp(spec):
        """Pin the frame axis to the mesh under sequence parallelism —
        one anchor constraint; GSPMD propagates from here."""
        if sp_spec is None:
            return spec
        return jax.lax.with_sharding_constraint(spec, sp_spec)

    def _constrain_seg(x):
        """Under SP, pin segment-level tensors (everything the
        discriminators consume) with their BATCH axis sharded over *both*
        mesh axes, at their consumption site.  Two reasons:

        * efficiency — once the random windows are sliced out of the
          time-sharded stream, the segment phase (decoder output, mel
          target, both discriminator passes) has no long time axis left,
          so the ``model`` axis is re-used for batch parallelism instead
          of computing the same segments once per model shard;
        * correctness — pinning the segments model-REPLICATED instead
          trips an XLA SPMD bug: the weight gradient of *grouped*
          convolutions (DiscriminatorS convs 1-4, ``groups`` 4-256) comes
          back exactly ×model_size (bisected to a minimal grouped-conv
          repro on the 8-device CPU mesh; the partitioner even warns about
          the involuntary reshard, Shardy b/433785288).  Sharding the
          batch gives the weight-grad contraction a real partition
          dimension and the psum is emitted exactly once.  The regression
          is pinned by tests/test_sharding.py::TestSequenceParallel at
          2e-6·scale (bias grads stayed exact either way — only the
          grouped kernels mis-accumulated)."""
        if sp_spec is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_axis, seq_axis = sp_spec.spec[0], sp_spec.spec[1]
        sh = NamedSharding(
            sp_spec.mesh,
            P((data_axis, seq_axis), *([None] * (x.ndim - 1))),
        )
        return jax.lax.with_sharding_constraint(x, sh)

    def _targets(mb: Batch, spec, ids):
        """On-device DSP targets (the reference did this on CPU workers)."""
        mel_full = spec_to_mel(spec, mel_cfg)  # [B, Ts, n_mels]
        y_mel = _constrain_seg(slice_segments(mel_full, ids, seg_frames))
        y_seg = _constrain_seg(slice_segments(mb.wav, ids * hop, seg_samples))
        return y_mel, y_seg

    def fused_step(
        g_state: TrainState,
        d_state: TrainState,
        batch: Batch,
        rng: jax.Array,
    ) -> Tuple[TrainState, TrainState, Dict[str, jnp.ndarray]]:
        spec_lengths, ids_slice, post_noise, dp_noise, rng_drop = _sample(
            batch, rng
        )

        # ---- 0. on-device feature extraction ----------------------------
        spec = _constrain_sp(
            linear_spectrogram(batch.wav, mel_cfg)
        )  # [B, Ts, n_freq]

        # ---- 1. generator forward with retained pullback ----------------
        def g_forward(g_params):
            return _apply_g(
                g_params, batch, spec, spec_lengths, ids_slice,
                post_noise, dp_noise, rng_drop,
            )

        out, g_vjp = jax.vjp(_wrap_remat(g_forward, remat), g_state.params)

        y_hat = out["wav_hat"]  # [B, seg_samples]

        # ---- 2. targets --------------------------------------------------
        y_mel, y_seg = _targets(batch, spec, ids_slice)

        # ---- 3. discriminator update on detached audio -------------------
        y_hat_sg = _constrain_seg(jax.lax.stop_gradient(y_hat))

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
            y_hat_c = _constrain_seg(g_out["wav_hat"])
            y_hat_mel = mel_spectrogram(y_hat_c, mel_cfg)
            _, y_d_g, fmap_r, fmap_g = d_model.apply(
                {"params": d_state.params, **(d_state.mutables or {})},
                y_seg, y_hat_c,
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

    def accum_step(
        g_state: TrainState,
        d_state: TrainState,
        batch: Batch,
        rng: jax.Array,
    ) -> Tuple[TrainState, TrainState, Dict[str, jnp.ndarray]]:
        b = batch.wav.shape[0]
        if b % k != 0:
            raise ValueError(f"batch size {b} not divisible by accum_steps {k}")
        bm = b // k
        spec_lengths, ids_slice, post_noise, dp_noise, rng_drop = _sample(
            batch, rng
        )

        def split(a):
            return a.reshape((k, bm) + a.shape[1:])

        micro = Batch(*(split(a) for a in batch))
        xs = (
            micro,
            split(ids_slice),
            split(post_noise),
            None if dp_noise is None else split(dp_noise),
            split(spec_lengths),
            jnp.arange(k),
        )
        inv_k = 1.0 / k

        def forward_micro(g_params, mb, slens, ids, pn, dpn, idx, spec):
            return _apply_g(
                g_params, mb, spec, slens, ids, pn, dpn,
                jax.random.fold_in(rng_drop, idx),
            )

        # ---- phase 1: D gradients on detached audio, current D -----------
        def phase1(dgrads, xs_i):
            mb, ids, pn, dpn, slens, idx = xs_i
            spec = _constrain_sp(linear_spectrogram(mb.wav, mel_cfg))
            out = forward_micro(g_state.params, mb, slens, ids, pn, dpn, idx, spec)
            y_hat_sg = _constrain_seg(jax.lax.stop_gradient(out["wav_hat"]))
            y_mel, y_seg = _targets(mb, spec, ids)

            def d_loss_fn(d_params):
                if use_spectral:
                    # every microbatch applies MUTABLY from the same
                    # pre-step u/v: the discriminator scores real then fake
                    # in two sequential sub-calls, so the power iteration
                    # advances twice per apply (real at u1, fake at u2) —
                    # and because the iteration reads only the kernel
                    # (models/layers.py:92-99), every micro reproduces the
                    # fused step's exact u1/u2 trajectory and final state
                    (y_d_r, y_d_g, _, _), new_vars = d_model.apply(
                        {"params": d_params, **(d_state.mutables or {})},
                        y_seg, y_hat_sg, mutable=["spectral"],
                    )
                else:
                    y_d_r, y_d_g, _, _ = d_model.apply(
                        {"params": d_params}, y_seg, y_hat_sg
                    )
                    new_vars = {}
                loss_disc, r_losses, g_losses = losses.discriminator_loss(
                    y_d_r, y_d_g
                )
                return loss_disc * inv_k, (
                    jnp.stack(r_losses) * inv_k,
                    jnp.stack(g_losses) * inv_k,
                    dict(new_vars),
                )

            ((ld, (r_l, g_l, new_vars)), gd) = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(d_state.params)
            dgrads = jax.tree_util.tree_map(jnp.add, dgrads, gd)
            ys = {
                "loss_disc": ld,
                "d_r": r_l,
                "d_g": g_l,
                "mut": new_vars,
                "xsum": jnp.sum(out["x_mask"].astype(jnp.float32)),
                "ysum": jnp.sum(out["y_mask"].astype(jnp.float32)),
            }
            return dgrads, ys

        zeros_d = jax.tree_util.tree_map(jnp.zeros_like, d_state.params)
        grads_d, ys1 = jax.lax.scan(phase1, zeros_d, xs)
        loss_disc = jnp.sum(ys1["loss_disc"])
        d_r_losses = jnp.sum(ys1["d_r"], axis=0)
        d_g_losses = jnp.sum(ys1["d_g"], axis=0)
        xsum_full = jnp.sum(ys1["xsum"])
        ysum_full = jnp.sum(ys1["ysum"])
        grad_norm_d = global_norm(grads_d)
        d_state = d_state.apply_gradients(grads=grads_d)
        if use_spectral:
            # all k stacked states are identical (weight-only iteration) —
            # keep micro 0's
            d_state = d_state.replace(
                mutables=jax.tree_util.tree_map(lambda x: x[0], ys1["mut"])
            )

        # ---- phase 2: G gradients through the UPDATED discriminator ------
        d_params_new = d_state.params
        d_mut_new = d_state.mutables or {}

        def phase2(ggrads, xs_i):
            mb, ids, pn, dpn, slens, idx = xs_i
            spec = _constrain_sp(linear_spectrogram(mb.wav, mel_cfg))
            y_mel, y_seg = _targets(mb, spec, ids)

            def g_forward(g_params):
                return forward_micro(g_params, mb, slens, ids, pn, dpn, idx, spec)

            out, g_vjp = jax.vjp(_wrap_remat(g_forward, remat), g_state.params)

            def g_loss_from_out(g_out):
                y_hat_c = _constrain_seg(g_out["wav_hat"])
                y_hat_mel = mel_spectrogram(y_hat_c, mel_cfg)
                _, y_d_g, fmap_r, fmap_g = d_model.apply(
                    {"params": d_params_new, **d_mut_new},
                    y_seg, y_hat_c,
                )
                # model divided l_length by THIS micro's Σx_mask — rescale
                # to the full-batch normalizer (module docstring)
                dur_scale = (
                    jnp.sum(g_out["x_mask"].astype(jnp.float32)) / xsum_full
                )
                loss_dur = (
                    jnp.sum(g_out["l_length"].astype(jnp.float32)) * dur_scale
                )
                loss_mel = (
                    jnp.mean(jnp.abs(y_mel - y_hat_mel).astype(jnp.float32))
                    * (c_mel * inv_k)
                )
                kl_scale = (
                    jnp.sum(g_out["y_mask"].astype(jnp.float32)) / ysum_full
                )
                loss_kl = (
                    losses.kl_loss(
                        g_out["z_p"],
                        g_out["logs_q"],
                        g_out["m_p"],
                        g_out["logs_p"],
                        g_out["y_mask"],
                    )
                    * (c_kl * kl_scale)
                )
                loss_fm = losses.feature_loss(fmap_r, fmap_g) * inv_k
                loss_gen, gen_losses = losses.generator_loss(y_d_g)
                loss_gen = loss_gen * inv_k
                total = loss_gen + loss_fm + loss_mel + loss_dur + loss_kl
                return total, {
                    "loss_gen": loss_gen,
                    "loss_fm": loss_fm,
                    "loss_mel": loss_mel,
                    "loss_dur": loss_dur,
                    "loss_kl": loss_kl,
                    "gen_losses": jnp.stack(gen_losses) * inv_k,
                }

            (tot, met), out_grads = jax.value_and_grad(
                g_loss_from_out, has_aux=True
            )(out)
            (gg,) = g_vjp(out_grads)
            ggrads = jax.tree_util.tree_map(jnp.add, ggrads, gg)
            met["total"] = tot
            return ggrads, met

        zeros_g = jax.tree_util.tree_map(jnp.zeros_like, g_state.params)
        grads_g, ys2 = jax.lax.scan(phase2, zeros_g, xs)
        grad_norm_g = global_norm(grads_g)
        g_state = g_state.apply_gradients(grads=grads_g)

        metrics = {
            "loss/g/total": jnp.sum(ys2["total"]),
            "loss/d/total": loss_disc,
            "grad_norm_g": grad_norm_g,
            "grad_norm_d": grad_norm_d,
            "loss/g/gen": jnp.sum(ys2["loss_gen"]),
            "loss/g/fm": jnp.sum(ys2["loss_fm"]),
            "loss/g/mel": jnp.sum(ys2["loss_mel"]),
            "loss/g/dur": jnp.sum(ys2["loss_dur"]),
            "loss/g/kl": jnp.sum(ys2["loss_kl"]),
        }
        gen_losses = jnp.sum(ys2["gen_losses"], axis=0)
        for i in range(gen_losses.shape[0]):
            metrics[f"loss/g/{i}"] = gen_losses[i]
        for i in range(d_r_losses.shape[0]):
            metrics[f"loss/d_r/{i}"] = d_r_losses[i]
        for i in range(d_g_losses.shape[0]):
            metrics[f"loss/d_g/{i}"] = d_g_losses[i]
        if debug_grads:
            metrics["_grads_g"] = grads_g
            metrics["_grads_d"] = grads_d
        return g_state, d_state, metrics

    return fused_step if k == 1 else accum_step


def make_jitted_train_step(
    g_model,
    d_model,
    hps,
    donate: bool = True,
    accum_steps: int = 1,
    remat: str = "none",
    sp_spec=None,
):
    """jit the step (donating both train states).  Sharding comes from the
    ARGUMENT placements: callers device_put the states replicated and the
    batch sharded over the mesh's ``data`` axis (see ``train.loop.Trainer``),
    and XLA inserts the gradient all-reduces."""
    step = make_train_step(
        g_model, d_model, hps,
        accum_steps=accum_steps, remat=remat, sp_spec=sp_spec,
    )
    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)
