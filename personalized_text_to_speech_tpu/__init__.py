"""personalized_text_to_speech_tpu — a TPU-native trilingual multi-speaker VITS framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference PyTorch
project ``MedivhJin01/Personalized_Text-to-Speech`` (a VITS-fast-fine-tuning fork):

* trilingual (ZH/JA/EN, + KO hooks) grapheme-to-IPA text frontend
  (reference: ``text/`` package),
* multi-speaker VITS synthesizer — relative-position transformer text encoder,
  WaveNet posterior encoder, residual-coupling flow, stochastic duration predictor,
  HiFi-GAN decoder (reference: ``models.py``),
* monotonic alignment search as an on-device wavefront DP (reference:
  ``monotonic_align/core.pyx`` — a host Cython/OpenMP kernel),
* fused on-device STFT/mel DSP (reference: ``mel_processing.py`` — CPU torch.stft
  inside dataloader workers),
* data-parallel GAN fine-tuning over a ``jax.sharding.Mesh`` (reference:
  ``finetune_speaker_v2.py`` — DDP/NCCL),
* checkpoint bridge for the reference's ``G_*.pth``/``D_*.pth`` weights,
* CLI + serving APIs for single-utterance, batched, and long-form synthesis.

Everything here is a new TPU-first design: batch-last-channel layouts, static
bucketed shapes under ``jit``, MXU-as-matmul spectrograms, ``lax.scan`` /
Pallas DP kernels instead of host round-trips, and explicit PRNG threading.
"""

__version__ = "0.1.0"

from personalized_text_to_speech_tpu.config import HParams, load_hparams  # noqa: F401
