#!/usr/bin/env python
"""Objective evaluation of a (reference, synthesized) wav pair — parity with
the reference ``eval_pair.py`` CLI (MCD / LSD / F0 / MRSTFT), librosa-free.
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
    ap = argparse.ArgumentParser("Evaluate a single ref/syn wav pair")
    ap.add_argument("--ref_wav", required=True)
    ap.add_argument("--syn_wav", required=True)
    ap.add_argument("--sr", type=int, default=22050)
    ap.add_argument("--no_dtw", action="store_true")
    args = ap.parse_args()

    from personalized_text_to_speech_tpu.data.audio import load_wav_mono
    from personalized_text_to_speech_tpu.eval import evaluate_pair

    ref = load_wav_mono(args.ref_wav, args.sr)
    syn = load_wav_mono(args.syn_wav, args.sr)
    metrics = evaluate_pair(ref, syn, args.sr, use_dtw=not args.no_dtw)

    print("=== Metrics ===")
    for k, v in metrics.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
