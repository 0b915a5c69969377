#!/usr/bin/env python
"""Fine-tuning CLI — parity with the reference ``finetune_speaker_v2.py``.

    python tools/train.py -c configs/modified_finetune_speaker.json \
        -m OUT_MODEL -n 100 --train_with_pretrained_model \
        --pretrained_g pretrained_models/G_0.pth \
        --pretrained_d pretrained_models/D_0.pth

Flags mirror the reference CLI (reference ``utils.py:307-320``): -c config,
-m model dir, -n max epochs, --cont resume, --preserved retention count.
Multi-device data parallelism comes from the config's ``tpu.mesh`` (all
local devices on the ``data`` axis by default) — no ``mp.spawn``/DDP.

``--smoke`` runs a short synthetic-data training session (no dataset files
needed) to validate the full pipeline end-to-end.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def str2bool(v):
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("yes", "true", "t", "y", "1")


def make_smoke_dataset(tmpdir: str, hps) -> None:
    """Generate a tiny synthetic dataset + filelist for --smoke runs."""
    import numpy as np

    from personalized_text_to_speech_tpu.data.audio import save_wav

    os.makedirs(tmpdir, exist_ok=True)
    sr = hps.data.sampling_rate
    rng = np.random.default_rng(0)
    lines = []
    texts = ["ni→xɑʊ↓↑.", "heloʊ wəɹɫd.", "tɛst sɛntəns hiɹ.", "moɹ deɪtə pliz."]
    for i in range(8):
        dur = rng.uniform(0.8, 1.6)
        t = np.linspace(0, dur, int(sr * dur))
        f0 = rng.uniform(120, 260)
        wav = (0.4 * np.sin(2 * np.pi * f0 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(
            np.float32
        )
        path = os.path.join(tmpdir, f"smoke_{i}.wav")
        save_wav(path, wav, sr)
        lines.append(f"{path}|{i % 2}|{texts[i % len(texts)]}")
    filelist = os.path.join(tmpdir, "smoke_filelist.txt")
    with open(filelist, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    hps.data.training_files = filelist
    hps.data.validation_files = filelist


def main():
    # fail fast instead of futex-hanging when the TPU tunnel relay is
    # dead (utils/runtime.require_tpu_reachable; CLAUDE.md ops notes)
    from personalized_text_to_speech_tpu.utils.runtime import (
        require_tpu_reachable,
    )

    require_tpu_reachable()
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str,
                        default="./configs/modified_finetune_speaker.json")
    parser.add_argument("-m", "--model", type=str, default="pretrained_models")
    parser.add_argument("-n", "--max_epochs", type=int, default=50)
    parser.add_argument("--cont", type=str2bool, default=False,
                        help="continue from latest checkpoint")
    parser.add_argument("--drop_speaker_embed", type=str2bool, default=False)
    parser.add_argument("--train_with_pretrained_model", type=str2bool,
                        default=False)
    parser.add_argument("--pretrained_g", type=str,
                        default="./pretrained_models/G_0.pth")
    parser.add_argument("--pretrained_d", type=str,
                        default="./pretrained_models/D_0.pth")
    parser.add_argument("--preserved", type=int, default=4)
    parser.add_argument("--no-mesh", action="store_true")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host rendezvous address host:port "
                        "(TPU pods auto-discover; set for CPU/GPU fleets)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--distributed", action="store_true",
                        help="call jax.distributed.initialize() with "
                        "auto-discovery (TPU pod slices)")
    parser.add_argument("--smoke", action="store_true",
                        help="short synthetic-data end-to-end run")
    parser.add_argument("--smoke-epochs", type=int, default=1,
                        help="epochs for --smoke (raise to watch convergence)")
    args = parser.parse_args()

    from personalized_text_to_speech_tpu.config import (
        default_model_config,
        load_hparams,
    )
    from personalized_text_to_speech_tpu.train.loop import Trainer
    from personalized_text_to_speech_tpu.utils import runtime

    if args.distributed or args.coordinator:
        # multi-host rendezvous BEFORE any backend use (reference
        # dist.init_process_group, finetune_speaker_v2.py:69)
        runtime.init_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    runtime.enable_compilation_cache()

    if args.smoke:
        hps = default_model_config(n_speakers=2)
        hps.train.batch_size = 2
        hps.train.log_interval = 1
        hps.train.eval_interval = 4
        hps.model.upsample_initial_channel = 128
        hps.model.n_layers = 2
        make_smoke_dataset(os.path.join(args.model, "smoke_data"), hps)
        args.max_epochs = args.smoke_epochs
    else:
        hps = load_hparams(args.config)

    hps["preserved"] = args.preserved
    model_dir = os.path.join("./", args.model)

    use_pretrained = args.train_with_pretrained_model and os.path.exists(
        args.pretrained_g
    )
    trainer = Trainer(
        hps,
        model_dir,
        pretrained_g=args.pretrained_g if use_pretrained else None,
        pretrained_d=args.pretrained_d
        if use_pretrained and os.path.exists(args.pretrained_d)
        else None,
        use_mesh=not args.no_mesh,
        drop_speaker_embed=args.drop_speaker_embed,
    )
    if args.cont:
        trainer.resume()
    trainer.fit(args.max_epochs)
    print(f"training done at step {trainer.global_step}")


if __name__ == "__main__":
    main()
