#!/usr/bin/env python
"""Auto-transcribe short per-speaker clips into a tagged annotation file —
parity with the reference ``scripts/short_audio_transcribe.py``.

Walks ``<in_dir>/<speaker>/*.wav``, resamples to the target rate, transcribes
with Whisper (via the baked-in ``transformers`` library — point
``--whisper_model`` at a local model directory; this environment has no
network egress to download one), detects the language, wraps text in
``[ZH]/[JA]/[EN]`` tags, and writes ``short_character_anno.txt`` lines
``path|speaker|tagged_text``.

Without a Whisper model, ``--annotate-only`` emits the file list with empty
text fields for manual transcription.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANG_TAGS = {"zh": "[ZH]", "ja": "[JA]", "en": "[EN]", "ko": "[KO]"}


def load_whisper(model_path: str):
    from transformers import WhisperForConditionalGeneration, WhisperProcessor

    processor = WhisperProcessor.from_pretrained(model_path)
    model = WhisperForConditionalGeneration.from_pretrained(model_path)
    model.eval()
    return processor, model


def transcribe_one(processor, model, wav, sr):
    import torch

    inputs = processor(wav, sampling_rate=sr, return_tensors="pt")
    with torch.no_grad():
        ids = model.generate(inputs.input_features, num_beams=5)
    text = processor.batch_decode(ids, skip_special_tokens=True)[0].strip()
    # language detection from the generated language token
    lang = "en"
    tokens = processor.batch_decode(ids, skip_special_tokens=False)[0]
    for code in LANG_TAGS:
        if f"<|{code}|>" in tokens:
            lang = code
            break
    return lang, text


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--in_dir", default="./custom_character_voice")
    parser.add_argument("--out_file", default="short_character_anno.txt")
    parser.add_argument("--whisper_model", default=None,
                        help="local path to a Whisper model dir")
    parser.add_argument("--sr", type=int, default=22050)
    parser.add_argument("--whisper_sr", type=int, default=16000)
    parser.add_argument("--annotate-only", action="store_true",
                        help="emit file list without transcription")
    args = parser.parse_args()

    from personalized_text_to_speech_tpu.data.audio import (
        load_wav,
        resample,
        save_wav,
        to_mono,
    )

    processor = model = None
    if not args.annotate_only:
        if args.whisper_model is None or not os.path.exists(args.whisper_model):
            raise SystemExit(
                "No Whisper model available. Pass --whisper_model <local dir> "
                "or use --annotate-only to emit an untranscribed file list."
            )
        processor, model = load_whisper(args.whisper_model)

    lines = []
    speakers = [
        d for d in sorted(os.listdir(args.in_dir))
        if os.path.isdir(os.path.join(args.in_dir, d))
    ]
    for speaker in speakers:
        spk_dir = os.path.join(args.in_dir, speaker)
        for i, name in enumerate(sorted(os.listdir(spk_dir))):
            if not name.lower().endswith(".wav"):
                continue
            path = os.path.join(spk_dir, name)
            try:
                wav, sr = load_wav(path)
                mono = to_mono(wav)
                # save the model-rate copy used for training
                out_path = os.path.join(spk_dir, f"processed_{i}.wav")
                save_wav(out_path, resample(mono, sr, args.sr), args.sr)
                if processor is not None:
                    wav16 = resample(mono, sr, args.whisper_sr)
                    lang, text = transcribe_one(
                        processor, model, wav16, args.whisper_sr
                    )
                    tag = LANG_TAGS.get(lang, "[EN]")
                    lines.append(f"{out_path}|{speaker}|{tag}{text}{tag}\n")
                else:
                    lines.append(f"{out_path}|{speaker}|\n")
            except Exception as e:
                print(f"skipping {path}: {type(e).__name__}: {e}")
                continue
    with open(args.out_file, "w", encoding="utf-8") as f:
        f.writelines(lines)
    print(f"wrote {len(lines)} annotations for {len(speakers)} speakers → {args.out_file}")


if __name__ == "__main__":
    main()
