"""TPU-native tensor ops: DSP kernels, alignment search, splines, masking."""

from personalized_text_to_speech_tpu.ops.masking import (  # noqa: F401
    generate_path,
    sequence_mask,
    slice_segments,
    rand_slice_segments,
)
from personalized_text_to_speech_tpu.ops.spectrogram import (  # noqa: F401
    MelConfig,
    linear_spectrogram,
    mel_spectrogram,
    spec_to_mel,
)
from personalized_text_to_speech_tpu.ops.mas import maximum_path  # noqa: F401
