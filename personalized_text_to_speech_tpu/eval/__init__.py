"""Objective evaluation metrics for synthesized speech."""

from personalized_text_to_speech_tpu.eval.metrics import (  # noqa: F401
    MCD,
    LSD,
    F0_metrics,
    MRSTFT,
    evaluate_pair,
)
