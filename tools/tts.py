#!/usr/bin/env python
"""CLI batch synthesis — parity with the reference ``cmd_inference.py``.

    python tools/tts.py -m G_latest.pth -c finetune_speaker.json \
        -o output/ -l English -t "Hello world" -s speaker_name

Flags mirror the reference (``cmd_inference.py:63-75``): -m model, -c config,
-o output dir, -l language, -t text, -s speaker, -on output name,
-ns noise_scale (default .667), -nsw noise_scale_w (default .6, reference CLI
default), -ls length_scale.  Extras: ``--random-init`` (no checkpoint, random
weights — smoke testing), ``--long-form`` (sentence-split batching),
``--dtype``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # fail fast instead of futex-hanging when the TPU tunnel relay is
    # dead (utils/runtime.require_tpu_reachable; CLAUDE.md ops notes)
    from personalized_text_to_speech_tpu.utils.runtime import (
        require_tpu_reachable,
    )

    require_tpu_reachable()
    parser = argparse.ArgumentParser(description="TPU-native VITS inference")
    parser.add_argument("-m", "--model_path", type=str, default=None,
                        help="checkpoint (.pth reference format or orbax dir)")
    parser.add_argument("-c", "--config_path", type=str, required=True)
    parser.add_argument("-o", "--output_path", type=str, default="output/vits")
    parser.add_argument("-l", "--language", type=str, default="English",
                        help="English / Chinese / Japanese / Korean / Mix")
    parser.add_argument("-t", "--text", type=str, required=True)
    parser.add_argument("-s", "--spk", type=str, default=None,
                        help="speaker name (or numeric id)")
    parser.add_argument("-on", "--output_name", type=str, default="output")
    parser.add_argument("-ns", "--noise_scale", type=float, default=0.667)
    parser.add_argument("-nsw", "--noise_scale_w", type=float, default=0.6)
    parser.add_argument("-ls", "--length_scale", type=float, default=1.0)
    parser.add_argument("--random-init", action="store_true",
                        help="run with random weights (no checkpoint needed)")
    parser.add_argument("--long-form", action="store_true")
    parser.add_argument("--cleaned-text", action="store_true",
                        help="input is already IPA symbols; skip G2P")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()

    from personalized_text_to_speech_tpu.config import load_hparams
    from personalized_text_to_speech_tpu.data.audio import save_wav
    from personalized_text_to_speech_tpu.infer import TTSEngine
    from personalized_text_to_speech_tpu.utils import runtime

    runtime.enable_compilation_cache()

    hps = load_hparams(args.config_path)
    if args.model_path is None and not args.random_init:
        parser.error("need -m/--model_path (or --random-init)")

    eng = TTSEngine(
        hps,
        checkpoint_path=None if args.random_init else args.model_path,
        dtype=args.dtype,
        seed=args.seed,
    )
    speaker = args.spk if args.spk is not None else 0

    lang = None if args.language == "Mix" else args.language
    if args.cleaned_text:
        ids = eng.text_to_ids(args.text, is_symbol=True)
        wav = eng.synthesize_ids(
            [ids], [eng.speaker_id(speaker)],
            noise_scale=args.noise_scale, noise_scale_w=args.noise_scale_w,
            length_scale=args.length_scale,
        )[0]
        sr = eng.sampling_rate
    elif args.long_form:
        sr, wav = eng.long_form(
            args.text, speaker=speaker, language=lang,
            speed=1.0 / args.length_scale,
            noise_scale=args.noise_scale, noise_scale_w=args.noise_scale_w,
        )
    else:
        sr, wav = eng.tts(
            args.text, speaker=speaker, language=lang,
            speed=1.0 / args.length_scale,
            noise_scale=args.noise_scale, noise_scale_w=args.noise_scale_w,
        )

    os.makedirs(args.output_path, exist_ok=True)
    out_file = os.path.join(args.output_path, args.output_name + ".wav")
    save_wav(out_file, wav, sr)
    print(f"wrote {out_file}: {len(wav) / sr:.2f}s @ {sr}Hz")


if __name__ == "__main__":
    main()
