"""Inference/serving layer: the bucketed-jit TTS engine."""

from personalized_text_to_speech_tpu.infer.engine import TTSEngine  # noqa: F401
