"""The training loop: fine-tuning driver with logging, eval, checkpointing.

Counterpart of the reference trainer (reference ``finetune_speaker_v2.py:46-310``)
on the TPU runtime: single process, device mesh data-parallelism, one fused
jitted GAN step, on-device DSP, Orbax full-state checkpoints (the reference
loses optimizer state on resume), optional import of reference ``G_0.pth`` /
``D_0.pth`` pretrained weights, TensorBoard scalars/plots/eval audio.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from personalized_text_to_speech_tpu.config import HParams, save_hparams
from personalized_text_to_speech_tpu.data.dataset import (
    BucketBatcher,
    DatasetConfig,
    TextAudioSpeakerDataset,
)
from personalized_text_to_speech_tpu.models.discriminator import (
    MultiPeriodDiscriminator,
)
from personalized_text_to_speech_tpu.models.synthesizer import SynthesizerTrn
from personalized_text_to_speech_tpu.ops.spectrogram import (
    MelConfig,
    linear_spectrogram,
    spec_to_mel,
)
from personalized_text_to_speech_tpu.parallel import create_mesh, shard_batch
from personalized_text_to_speech_tpu.train.state import create_train_state
from personalized_text_to_speech_tpu.train.step import (
    Batch,
    make_jitted_train_step,
)
from personalized_text_to_speech_tpu.utils import checkpoint as ckpt
from personalized_text_to_speech_tpu.utils import logging_utils


class Trainer:
    def __init__(
        self,
        hps: HParams,
        model_dir: str,
        pretrained_g: Optional[str] = None,
        pretrained_d: Optional[str] = None,
        use_mesh: bool = True,
        drop_speaker_embed: bool = False,
    ):
        self.hps = hps
        self.model_dir = model_dir
        os.makedirs(model_dir, exist_ok=True)
        save_hparams(hps, os.path.join(model_dir, "config.json"))
        self.logger = logging_utils.get_logger(model_dir)
        from personalized_text_to_speech_tpu.utils.profiling import check_git_hash

        check_git_hash(model_dir)
        # multi-process (pod) runs: rank 0 owns TensorBoard, like the
        # reference's rank-0-only writers (finetune_speaker_v2.py:77-80);
        # checkpoint saves stay collective (Orbax coordinates all hosts)
        self.is_primary = jax.process_index() == 0
        self.writer = (
            logging_utils.SummaryWriter(model_dir) if self.is_primary else None
        )
        self.writer_eval = (
            logging_utils.SummaryWriter(os.path.join(model_dir, "eval"))
            if self.is_primary
            else None
        )
        self.mel_cfg = MelConfig.from_hparams(hps)

        dtype = (
            jnp.bfloat16
            if hps.train.get("bf16_run", hps.train.get("fp16_run", False))
            else jnp.float32
        )
        self.g_model = SynthesizerTrn.from_hparams(hps, dtype=dtype)
        self.d_model = MultiPeriodDiscriminator(
            use_spectral_norm=hps.model.get("use_spectral_norm", False),
            dtype=dtype,
        )

        self.mesh = create_mesh(dict(hps.tpu.mesh.items())) if use_mesh else None

        # data ---------------------------------------------------------
        ds_cfg = DatasetConfig.from_hparams(hps)
        self.train_set = TextAudioSpeakerDataset(
            hps.data.training_files, ds_cfg, hps.symbols, seed=hps.train.seed
        )
        self.batcher = BucketBatcher(
            self.train_set,
            hps.train.batch_size,
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
            seed=hps.train.seed,
        )
        self.eval_set = (
            TextAudioSpeakerDataset(
                hps.data.validation_files, ds_cfg, hps.symbols, seed=hps.train.seed
            )
            if os.path.exists(hps.data.validation_files)
            else None
        )
        steps_per_epoch = max(len(self.batcher), 1)

        # params -------------------------------------------------------
        rng = jax.random.PRNGKey(hps.train.seed)
        cpu = jax.local_devices(backend="cpu")[0]
        tt, ts = 16, 64
        with jax.default_device(cpu):
            g_vars = self.g_model.init(
                {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
                jnp.ones((1, tt), jnp.int32),
                jnp.array([tt]),
                jnp.zeros((1, ts, hps.data.filter_length // 2 + 1)),
                jnp.array([ts]),
                jnp.array([0]),
            )
            wav0 = jnp.zeros((1, hps.train.segment_size))
            d_vars = self.d_model.init(jax.random.PRNGKey(0), wav0, wav0)
        g_params, d_params = g_vars["params"], d_vars["params"]

        if pretrained_g:
            from personalized_text_to_speech_tpu.utils import torch_compat as tc

            state, _ = tc.load_torch_state_dict(pretrained_g)
            g_params = tc.torch_to_flax(
                state, {"params": g_params},
                drop_speaker_embed=drop_speaker_embed,
            )["params"]
            self.logger.info("loaded pretrained G from %s", pretrained_g)
        if pretrained_d:
            from personalized_text_to_speech_tpu.utils import torch_compat as tc

            state, _ = tc.load_torch_state_dict(pretrained_d)
            tmpl = {"params": d_params}
            if "spectral" in d_vars:
                tmpl["spectral"] = d_vars["spectral"]
            loaded = tc.torch_to_flax(state, tmpl)
            d_params = loaded["params"]
            if "spectral" in loaded:
                d_vars = {**d_vars, "spectral": loaded["spectral"]}
            self.logger.info("loaded pretrained D from %s", pretrained_d)

        self.g_state = create_train_state(
            self.g_model.apply, g_params, hps, steps_per_epoch
        )
        self.d_state = create_train_state(
            self.d_model.apply, d_params, hps, steps_per_epoch,
            # spectral-norm D carries its power-iteration u/v vectors
            mutables=(
                {"spectral": d_vars["spectral"]} if "spectral" in d_vars else None
            ),
        )
        # tpu.sp: sequence parallelism — frame axis sharded over the `model`
        # axis with params REPLICATED (parallel/sp.py); it consumes the same
        # mesh axis as tensor parallelism, so the two are exclusive: sp wins
        # and the TP param sharding below is skipped
        self._sp = bool(
            hps.tpu.get("sp", False)
            and self.mesh is not None
            and "model" in self.mesh.axis_names
            and self.mesh.shape["model"] > 1
        )
        if self.mesh is not None:
            if (
                not self._sp
                and "model" in self.mesh.shape
                and self.mesh.shape["model"] > 1
            ):
                # tensor parallelism over the `model` axis: conv/dense
                # out-channels + embedding features sharded, optimizer
                # moments follow (parallel/tp.py); GSPMD inserts the
                # collectives
                from personalized_text_to_speech_tpu.parallel import tp

                sharded_n, total_n = tp.count_sharded(
                    self.g_state.params, self.mesh
                )
                self.logger.info(
                    "tensor parallelism x%d over 'model': %.1f%% of G params "
                    "sharded (%d / %d)",
                    self.mesh.shape["model"],
                    100.0 * sharded_n / max(total_n, 1), sharded_n, total_n,
                )
                self.g_state = tp.shard_pytree(self.g_state, self.mesh)
                self.d_state = tp.shard_pytree(self.d_state, self.mesh)
            else:
                from personalized_text_to_speech_tpu.parallel.mesh import (
                    replicated,
                )

                repl = replicated(self.mesh)
                self.g_state = jax.device_put(self.g_state, repl)
                self.d_state = jax.device_put(self.d_state, repl)

        # accum_steps > 1: exact-big-batch gradient accumulation; remat:
        # jax.checkpoint on the generator forward — both for memory-limited
        # geometries (train/step.py module docstring)
        sp_spec = None
        if self._sp:
            self.logger.info(
                "sequence parallelism over 'model' x%d: frame axis sharded, "
                "params replicated", self.mesh.shape["model"],
            )
            from jax.sharding import NamedSharding, PartitionSpec as P

            sp_spec = NamedSharding(self.mesh, P("data", "model", None))
        self.step_fn = make_jitted_train_step(
            self.g_model, self.d_model, hps,
            accum_steps=int(hps.train.get("accum_steps", 1)),
            remat=str(hps.train.get("remat", "none")),
            sp_spec=sp_spec,
        )
        self.global_step = 0
        self.epoch = 1
        self.rng = jax.random.PRNGKey(hps.train.seed + 17)
        self._eval_fns: dict = {}  # cached jitted eval-inference stages

    # ------------------------------------------------------------------
    def resume(self) -> bool:
        ckpt_dir = os.path.join(self.model_dir, "checkpoints")
        step = ckpt.latest_step(ckpt_dir)
        if step is None:
            return False
        self.g_state, self.d_state, self.global_step = ckpt.restore_train_state(
            ckpt_dir, self.g_state, self.d_state
        )
        steps_per_epoch = max(len(self.batcher), 1)
        self.epoch = self.global_step // steps_per_epoch + 1
        self.logger.info("resumed at step %d (epoch %d)", self.global_step, self.epoch)
        return True

    def save(self) -> None:
        ckpt.save_train_state(
            os.path.join(self.model_dir, "checkpoints"),
            self.global_step,
            self.g_state,
            self.d_state,
            preserved=int(self.hps.get("preserved", 4)),
        )

    def export_reference_checkpoint(self) -> None:
        """Emit reference-format G_latest.pth / D_latest.pth for ecosystem
        interop and as the warm start of a later fine-tune
        (``tools/train.py --train_with_pretrained_model``, mirroring the
        reference's G_0.pth/D_0.pth pair, finetune_speaker_v2.py:102-115)."""
        from personalized_text_to_speech_tpu.utils import torch_compat as tc

        tc.save_torch_checkpoint(
            {"params": jax.device_get(self.g_state.params)},
            os.path.join(self.model_dir, "G_latest.pth"),
            iteration=self.epoch,
            learning_rate=self.hps.train.learning_rate,
        )
        d_tree = {"params": jax.device_get(self.d_state.params)}
        if getattr(self.d_state, "mutables", None):
            d_tree.update(jax.device_get(self.d_state.mutables))
        tc.save_torch_checkpoint(
            d_tree,
            os.path.join(self.model_dir, "D_latest.pth"),
            iteration=self.epoch,
            learning_rate=self.hps.train.learning_rate,
        )

    # ------------------------------------------------------------------
    def train_epoch(self) -> None:
        hps = self.hps
        self.batcher.set_epoch(self.epoch)
        t_step = time.perf_counter()
        for batch_np in self.batcher.iter_prefetch():
            batch = Batch(
                text=batch_np["text"],
                text_lengths=batch_np["text_lengths"],
                wav=batch_np["wav"],
                wav_lengths=batch_np["wav_lengths"],
                sid=batch_np["sid"],
            )
            if self.mesh is not None:
                if self._sp:
                    from personalized_text_to_speech_tpu.parallel.sp import (
                        shard_batch_sp,
                    )

                    batch = shard_batch_sp(batch, self.mesh)
                else:
                    batch = shard_batch(batch, self.mesh)
            self.rng, step_rng = jax.random.split(self.rng)
            self.g_state, self.d_state, metrics = self.step_fn(
                self.g_state, self.d_state, batch, step_rng
            )

            if self.global_step % hps.train.log_interval == 0 and self.is_primary:
                metrics = jax.device_get(metrics)
                dt = time.perf_counter() - t_step
                self.logger.info(
                    "epoch %d step %d loss_g=%.3f loss_d=%.3f (%.2fs/step)",
                    self.epoch,
                    self.global_step,
                    metrics["loss/g/total"],
                    metrics["loss/d/total"],
                    dt,
                )
                self.writer.summarize(
                    self.global_step,
                    scalars={
                        **{k: float(v) for k, v in metrics.items()},
                        "learning_rate": float(
                            hps.train.learning_rate
                            * (hps.train.lr_decay ** (self.epoch - 1))
                        ),
                    },
                )
            # the reference evaluates/saves at step 0 too (the gt/mel +
            # gt/audio references land in that first eval)
            if self.global_step % hps.train.eval_interval == 0:
                self.evaluate()
                self.save()
            self.global_step += 1
            t_step = time.perf_counter()

    # -- cached jitted eval-inference stages ---------------------------
    # The whole eval path runs as TWO jitted programs per bucket pair
    # (encode → pick frame bucket from one scalar → decode+mel).  An
    # unjitted apply here would dispatch thousands of eager ops at ~20 ms
    # each on a tunneled attach — minutes of stall per eval.
    def _eval_encode_fn(self, t_bucket: int):
        key = ("enc", t_bucket)
        if key not in self._eval_fns:
            model = self.g_model

            @jax.jit
            def run(params, x, x_lengths, sid):
                rng = jax.random.PRNGKey(0)
                dp_noise = jax.random.normal(
                    rng, (x.shape[0], x.shape[1], 2), dtype=jnp.float32
                )
                w_ceil, m_p, logs_p, x_mask = model.apply(
                    {"params": params}, x, x_lengths, sid,
                    dp_noise=dp_noise, method=model.infer_encode,
                )
                n_frames = jnp.max(jnp.sum(w_ceil, axis=-1)).astype(jnp.int32)
                return w_ceil, m_p, logs_p, x_mask, n_frames

            self._eval_fns[key] = run
        return self._eval_fns[key]

    def _eval_decode_fn(self, t_bucket: int, f_bucket: int):
        key = ("dec", t_bucket, f_bucket)
        if key not in self._eval_fns:
            model = self.g_model
            mel_cfg = self.mel_cfg

            @functools.partial(jax.jit, static_argnames=("max_len",))
            def run(params, w_ceil, m_p, logs_p, x_mask, sid, max_len):
                prior_noise = jax.random.normal(
                    jax.random.PRNGKey(1),
                    (m_p.shape[0], max_len, m_p.shape[-1]),
                    dtype=jnp.float32,
                )
                wav, y_lengths = model.apply(
                    {"params": params}, w_ceil, m_p, logs_p, x_mask, sid,
                    max_len=max_len, prior_noise=prior_noise,
                    method=model.infer_decode,
                )
                # mel of the generated audio computed in the same program —
                # no separate eager spectrogram dispatches
                mel = spec_to_mel(linear_spectrogram(wav, mel_cfg), mel_cfg)
                return wav, y_lengths, mel

            self._eval_fns[key] = functools.partial(run, max_len=f_bucket)
        return self._eval_fns[key]

    def _eval_gt_mel_fn(self, n_samples: int):
        key = ("gtmel", n_samples)
        if key not in self._eval_fns:
            mel_cfg = self.mel_cfg

            @jax.jit
            def run(wav):
                return spec_to_mel(linear_spectrogram(wav, mel_cfg), mel_cfg)

            self._eval_fns[key] = run
        return self._eval_fns[key]

    @staticmethod
    def _bucketize(n: int, buckets) -> int:
        for b in buckets:
            if n <= b:
                return int(b)
        return int(buckets[-1])

    def evaluate(self) -> None:
        """Synthesize one validation utterance to TensorBoard
        (reference ``finetune_speaker_v2.py:313-368``), using the engine's
        bucketed two-stage compiled path: the decode canvas follows the
        predicted length instead of a fixed 1000-frame maximum."""
        source = self.eval_set or self.train_set
        if len(source) == 0:
            return
        hps = self.hps
        text_buckets = list(hps.tpu.text_buckets)
        frame_buckets = list(hps.tpu.frame_buckets)
        item = source[0]
        ids = np.asarray(item["text"], dtype=np.int32)
        t_bucket = self._bucketize(len(ids), text_buckets)
        x = np.zeros((1, t_bucket), dtype=np.int32)
        x[0, : len(ids)] = ids[:t_bucket]
        x_lengths = np.asarray([min(len(ids), t_bucket)], np.int32)
        sid = np.asarray([item["sid"]], np.int32)

        params = self.g_state.params
        w_ceil, m_p, logs_p, x_mask, n_frames_dev = self._eval_encode_fn(
            t_bucket
        )(params, x, x_lengths, sid)
        n_frames = int(n_frames_dev)
        f_bucket = self._bucketize(max(n_frames, 1), frame_buckets)
        wav, y_len, mel = self._eval_decode_fn(t_bucket, f_bucket)(
            params, w_ceil, m_p, logs_p, x_mask, sid
        )
        wav_np = np.asarray(jax.device_get(wav))[0]
        n = int(y_len[0]) * hps.data.hop_length
        n_mel_frames = int(y_len[0])
        # alignment plot reconstructed from durations on host (numpy) —
        # avoids hauling the [T_spec, T_text] attention canvas over D2H
        durs = np.asarray(jax.device_get(w_ceil))[0][: int(x_lengths[0])]
        attn_np = np.zeros((min(int(durs.sum()), f_bucket), len(durs)), np.float32)
        pos = 0
        for j, d in enumerate(durs.astype(np.int64)):
            end = min(pos + int(d), attn_np.shape[0])
            attn_np[pos:end, j] = 1.0
            pos = end
        images = {
            "gen/mel": logging_utils.plot_spectrogram_to_numpy(
                np.asarray(mel)[0][:n_mel_frames].T
            ),
            "gen/attn": logging_utils.plot_alignment_to_numpy(attn_np.T),
        }
        audios = {"gen/audio": wav_np[:n]}
        if self.global_step == 0:
            # ground-truth reference at step 0 (finetune_speaker_v2.py:357-359)
            gt = np.asarray(item["wav"], dtype=np.float32)
            pad = self._bucketize(
                max(len(gt) // hps.data.hop_length, 1), frame_buckets
            ) * hps.data.hop_length
            gt_p = np.zeros((1, pad), np.float32)
            gt_p[0, : min(len(gt), pad)] = gt[:pad]
            gt_mel = self._eval_gt_mel_fn(pad)(gt_p)
            gt_frames = min(len(gt), pad) // hps.data.hop_length
            images["gt/mel"] = logging_utils.plot_spectrogram_to_numpy(
                np.asarray(gt_mel)[0][:gt_frames].T
            )
            audios["gt/audio"] = gt
        if self.writer_eval is not None:
            self.writer_eval.summarize(
                self.global_step,
                images=images,
                audios=audios,
                audio_sampling_rate=hps.data.sampling_rate,
            )

    # ------------------------------------------------------------------
    def fit(self, max_epochs: int) -> None:
        try:
            while self.epoch <= min(max_epochs, self.hps.train.epochs):
                self.train_epoch()
                self.logger.info("====> Epoch: %d", self.epoch)
                self.epoch += 1
        except KeyboardInterrupt:
            self.logger.warning("interrupted — saving checkpoint before exit")
            self.save()
            raise
        except Exception:
            # crash-path checkpoint: the reference loses all progress on
            # failure (bare try/except falls back to G_0.pth,
            # finetune_speaker_v2.py:102-115); here the full train state is
            # persisted so --cont resumes exactly where the run died
            self.logger.exception("training step failed — saving emergency checkpoint")
            self.save()
            raise
        self.save()
        self.export_reference_checkpoint()
