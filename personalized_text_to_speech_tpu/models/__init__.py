"""Model layer: VITS synthesizer, discriminators, and their building blocks."""

from personalized_text_to_speech_tpu.models.synthesizer import (  # noqa: F401
    SynthesizerTrn,
)
from personalized_text_to_speech_tpu.models.discriminator import (  # noqa: F401
    MultiPeriodDiscriminator,
)
