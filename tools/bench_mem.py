"""Compile-time memory audit for the GAN train step.

Quantifies what ``train.accum_steps`` (exact gradient accumulation) and
``train.remat`` (jax.checkpoint on the generator forward) buy: for each
requested combination the step is compiled AOT and XLA's buffer assignment
is read back (``compiled.memory_analysis()``), printing one JSON line per
combo with the peak temp-buffer bytes (activations + workspace — the part
accumulation/remat shrink) and the resident argument bytes (params + opt
state + batch — invariant).

This runs on ANY backend: on the CPU backend the absolute numbers differ
from a TPU's (different layouts/fusions), but the *relative* effect of the
memory knobs is the quantity of interest and is decided by the same HLO
dataflow.  On a real chip the same tool reports HBM numbers directly.

The reference has no equivalent knobs to audit (it steps every batch and
keeps every activation; OOM means "use a smaller batch",
reference README.md fine-tune notes).

Usage:
    python tools/bench_mem.py                     # production widths,
                                                  # batch 16 x 400 frames
    python tools/bench_mem.py --batch 8 --frames 200 --tiny
    python tools/bench_mem.py --combos 1:none 4:none 1:full 4:full
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # fail fast instead of futex-hanging when the TPU tunnel relay is
    # dead (utils/runtime.require_tpu_reachable; CLAUDE.md ops notes)
    from personalized_text_to_speech_tpu.utils.runtime import (
        require_tpu_reachable,
    )

    require_tpu_reachable()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=400,
                    help="spectrogram frame bucket (wav = frames*hop)")
    ap.add_argument("--text", type=int, default=96, help="text bucket")
    ap.add_argument("--tiny", action="store_true",
                    help="narrow model widths (fast structural check)")
    ap.add_argument(
        "--combos", nargs="*", default=["1:none", "1:dots", "1:full",
                                        "2:none", "4:none", "4:dots"],
        help="accum_steps:remat pairs",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from personalized_text_to_speech_tpu.config import default_model_config
    from personalized_text_to_speech_tpu.models.discriminator import (
        MultiPeriodDiscriminator,
    )
    from personalized_text_to_speech_tpu.models.synthesizer import SynthesizerTrn
    from personalized_text_to_speech_tpu.train.state import create_train_state
    from personalized_text_to_speech_tpu.train.step import Batch, make_train_step
    from personalized_text_to_speech_tpu.utils import runtime

    runtime.enable_compilation_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", ".jax_test_cache",
        )
        if jax.default_backend() == "cpu"
        else None
    )

    hps = default_model_config(n_speakers=8)
    if args.tiny:
        hps.model.hidden_channels = 64
        hps.model.inter_channels = 64
        hps.model.filter_channels = 128
        hps.model.n_layers = 2
        hps.model.upsample_initial_channel = 64
        hps.model.gin_channels = 32

    hop = hps.data.hop_length
    b, tt, ts = args.batch, args.text, args.frames

    g_model = SynthesizerTrn.from_hparams(hps)
    d_model = MultiPeriodDiscriminator()

    rng = jax.random.PRNGKey(0)
    x = jnp.ones((b, tt), dtype=jnp.int32)
    xl = jnp.full((b,), tt, dtype=jnp.int32)
    spec0 = jnp.zeros((b, ts, hps.data.filter_length // 2 + 1))
    sl = jnp.full((b,), ts, dtype=jnp.int32)
    sid = jnp.zeros((b,), dtype=jnp.int32)
    g_params = g_model.init(
        {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
        x, xl, spec0, sl, sid,
    )["params"]
    wav0 = jnp.zeros((b, hps.train.segment_size))
    d_params = d_model.init(rng, wav0, wav0)["params"]
    g_state = create_train_state(g_model.apply, g_params, hps, steps_per_epoch=1)
    d_state = create_train_state(d_model.apply, d_params, hps, steps_per_epoch=1)

    batch = Batch(
        text=x,
        text_lengths=xl,
        wav=jnp.zeros((b, ts * hop), jnp.float32),
        wav_lengths=jnp.full((b,), ts * hop, jnp.int32),
        sid=sid,
    )

    mib = 1024.0 * 1024.0
    for combo in args.combos:
        k_s, remat = combo.split(":")
        k = int(k_s)
        t0 = time.time()
        step = make_train_step(
            g_model, d_model, hps, accum_steps=k, remat=remat
        )
        compiled = (
            jax.jit(step, donate_argnums=(0, 1))
            .lower(g_state, d_state, batch, jax.random.PRNGKey(1))
            .compile()
        )
        ma = compiled.memory_analysis()
        print(json.dumps({
            "metric": "train-step XLA memory",
            "backend": jax.default_backend(),
            "batch": b, "frames": ts, "widths": "tiny" if args.tiny else "production",
            "accum_steps": k, "remat": remat,
            "temp_mib": round(ma.temp_size_in_bytes / mib, 1),
            "args_mib": round(ma.argument_size_in_bytes / mib, 1),
            "output_mib": round(ma.output_size_in_bytes / mib, 1),
            "compile_s": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
