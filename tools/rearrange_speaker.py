#!/usr/bin/env python
"""Compact the speaker-embedding table after fine-tuning — parity with the
reference ``scripts/rearrange_speaker.py``: shrink ``emb_g`` to only the
speakers in the config and reindex IDs 0..n-1.

Works on both checkpoint formats: reference ``.pth`` (via the torch bridge)
and our Orbax params.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", type=str, default="./G_latest.pth")
    parser.add_argument("--config_dir", type=str, default="./finetune_speaker.json")
    parser.add_argument("--out_model", type=str, default="./G_compact.pth")
    parser.add_argument("--out_config", type=str, default="./finetune_speaker_compact.json")
    parser.add_argument("--out_moegoe", type=str, default="./moegoe_config.json",
                        help="MoeGoe-format config copy (speakers as an "
                             "id-ordered name list, reference "
                             "rearrange_speaker.py:31-34); '' disables")
    args = parser.parse_args()

    from personalized_text_to_speech_tpu.config import load_hparams, save_hparams
    from personalized_text_to_speech_tpu.utils import torch_compat as tc

    hps = load_hparams(args.config_dir)
    speakers = dict(hps.speakers.items())

    state, meta = tc.load_torch_state_dict(args.model_dir)
    emb = state["emb_g.weight"]
    new_emb = np.zeros((len(speakers), emb.shape[1]), dtype=emb.dtype)
    new_map = {}
    for new_id, (name, old_id) in enumerate(sorted(speakers.items(), key=lambda kv: kv[1])):
        new_emb[new_id] = emb[int(old_id)]
        new_map[name] = new_id
    state["emb_g.weight"] = new_emb

    import torch

    torch.save(
        {
            "model": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()},
            "iteration": meta.get("iteration", 0),
            "optimizer": None,
            "learning_rate": meta.get("learning_rate", 2e-4),
        },
        args.out_model,
    )

    hps["speakers"] = new_map
    hps.data.n_speakers = len(new_map)
    save_hparams(hps, args.out_config)
    if args.out_moegoe:
        # MoeGoe ecosystem expects `speakers` as an id-ordered name list
        with open(args.out_config, encoding="utf-8") as f:
            cfg = json.load(f)
        cfg["speakers"] = [
            name for name, _ in sorted(new_map.items(), key=lambda kv: kv[1])
        ]
        with open(args.out_moegoe, "w", encoding="utf-8") as f:
            json.dump(cfg, f, indent=2, ensure_ascii=False)
    print(f"compacted {emb.shape[0]} → {len(new_map)} speakers: "
          f"{args.out_model}, {args.out_config}"
          + (f", {args.out_moegoe}" if args.out_moegoe else ""))


if __name__ == "__main__":
    main()
