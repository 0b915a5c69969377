#!/usr/bin/env python
"""Voice-conversion quality gate over parallel (same-text) recordings.

The reference implements voice conversion in the model
(``models.py:386-397``) but never wires it to an evaluation; this tool
closes that loop.  For every text recorded by both a source and a target
speaker, the source recording is converted to the target's voice
(posterior-encode → flow round-trip → decode with the target embedding) and
scored against the target's real recording with the objective metrics
(reference ``eval_pair.py:42-98`` definitions).  The *unconverted* source
vs target score is printed alongside as the baseline the conversion must
beat.

    python tools/eval_vc.py --model OUT/G_latest.pth --config c.json \
        --annotations final_annotation_train.txt --src 0 --tgt 1
"""

import argparse
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # fail fast instead of futex-hanging when the TPU tunnel relay is
    # dead (utils/runtime.require_tpu_reachable; CLAUDE.md ops notes)
    from personalized_text_to_speech_tpu.utils.runtime import (
        require_tpu_reachable,
    )

    require_tpu_reachable()
    ap = argparse.ArgumentParser("Evaluate voice conversion on parallel data")
    ap.add_argument("--model", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--annotations", nargs="+", required=True,
                    help="annotation files (path|sid|text) to mine for "
                    "same-text cross-speaker pairs")
    ap.add_argument("--src", type=int, required=True, help="source speaker id")
    ap.add_argument("--tgt", type=int, required=True, help="target speaker id")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--out_dir", default="")
    ap.add_argument("--out_json", default="")
    args = ap.parse_args()

    from personalized_text_to_speech_tpu.config import load_hparams
    from personalized_text_to_speech_tpu.data.audio import load_wav_mono
    from personalized_text_to_speech_tpu.eval import evaluate_pair
    from personalized_text_to_speech_tpu.infer.engine import TTSEngine
    from personalized_text_to_speech_tpu.utils import runtime

    runtime.enable_compilation_cache()
    hps = load_hparams(args.config)
    engine = TTSEngine(hps, checkpoint_path=args.model)
    sr = engine.sampling_rate

    by_text = defaultdict(dict)
    for ann in args.annotations:
        with open(ann, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line.strip():
                    continue
                wav_path, sid, text = line.split("|", 2)
                by_text[text][int(sid)] = wav_path
    pairs = [
        (v[args.src], v[args.tgt])
        for v in by_text.values()
        if args.src in v and args.tgt in v
    ]
    if args.limit:
        pairs = pairs[: args.limit]
    if not pairs:
        sys.exit("no same-text cross-speaker pairs found")
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)

    conv_rows, base_rows = [], []
    for src_path, tgt_path in pairs:
        src = load_wav_mono(src_path, sr)
        tgt = load_wav_mono(tgt_path, sr)
        _, conv = engine.voice_conversion(src, args.src, args.tgt)
        # score in the PCM16 representation on both sides (see eval_set.py)
        pcm = (np.clip(conv, -1, 1) * 32767.0).astype(np.int16)
        conv = pcm.astype(np.float32) / 32768.0
        if args.out_dir:
            from scipy.io import wavfile

            wavfile.write(
                os.path.join(args.out_dir, os.path.basename(src_path)),
                sr, pcm,
            )
        m_conv = {k: float(v) for k, v in evaluate_pair(tgt, conv, sr).items()}
        m_base = {k: float(v) for k, v in evaluate_pair(tgt, src, sr).items()}
        conv_rows.append(m_conv)
        base_rows.append(m_base)
        print(
            f"{os.path.basename(src_path)}→{os.path.basename(tgt_path)} "
            + " ".join(f"{k}={v:.2f}" for k, v in m_conv.items())
        )

    def agg(rows):
        out = {}
        for k in rows[0]:
            vals = np.asarray([r[k] for r in rows], dtype=np.float64)
            vals = vals[np.isfinite(vals)]
            out[k] = float(np.median(vals)) if len(vals) else float("nan")
        return out

    result = {
        "n_pairs": len(conv_rows),
        "src": args.src,
        "tgt": args.tgt,
        "converted_vs_target_median": agg(conv_rows),
        "unconverted_vs_target_median": agg(base_rows),
    }
    print(json.dumps(result))
    if args.out_json:
        with open(args.out_json, "w", encoding="utf-8") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
