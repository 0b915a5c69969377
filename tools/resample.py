#!/usr/bin/env python
"""Batch-resample a directory of wavs to the config sampling rate — parity
with the reference ``scripts/resample.py`` (torchaudio-free)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--in_dir", default="./sampled_audio4ft")
    parser.add_argument("--out_dir", default=None,
                        help="default: overwrite in place")
    parser.add_argument("--sr", type=int, default=22050)
    args = parser.parse_args()

    from personalized_text_to_speech_tpu.data.audio import (
        load_wav,
        resample,
        save_wav,
        to_mono,
    )

    out_dir = args.out_dir or args.in_dir
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(args.in_dir)):
        if not name.lower().endswith(".wav"):
            continue
        wav, sr = load_wav(os.path.join(args.in_dir, name))
        mono = to_mono(wav)
        out = resample(mono, sr, args.sr)
        save_wav(os.path.join(out_dir, name), out, args.sr)
        n += 1
    print(f"resampled {n} files to {args.sr} Hz in {out_dir}")


if __name__ == "__main__":
    main()
