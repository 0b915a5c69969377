#!/usr/bin/env python
"""Convert checkpoints between the reference ``.pth`` format and Orbax.

    # reference → orbax params
    python tools/convert_checkpoint.py --config c.json \
        --input G_latest.pth --output ckpt_dir/params_0

    # orbax params → reference .pth
    python tools/convert_checkpoint.py --config c.json \
        --input ckpt_dir/params_0 --output G_export.pth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--discriminator", action="store_true",
                        help="convert a D_*.pth instead of a generator")
    parser.add_argument("--drop_speaker_embed", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from personalized_text_to_speech_tpu.config import load_hparams
    from personalized_text_to_speech_tpu.utils import checkpoint as ckpt
    from personalized_text_to_speech_tpu.utils import torch_compat as tc

    hps = load_hparams(args.config)
    rng = jax.random.PRNGKey(0)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        if args.discriminator:
            from personalized_text_to_speech_tpu.models.discriminator import (
                MultiPeriodDiscriminator,
            )

            model = MultiPeriodDiscriminator()
            wav0 = jnp.zeros((1, hps.train.segment_size))
            template = model.init(rng, wav0, wav0)
        else:
            from personalized_text_to_speech_tpu.models.synthesizer import (
                SynthesizerTrn,
            )

            model = SynthesizerTrn.from_hparams(hps)
            ts = max(model.segment_size + 1, 16)
            template = model.init(
                {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
                jnp.ones((1, 8), jnp.int32), jnp.array([8]),
                jnp.zeros((1, ts, hps.data.filter_length // 2 + 1)),
                jnp.array([ts]), jnp.array([0]),
            )

    if args.input.endswith(".pth"):
        state, meta = tc.load_torch_state_dict(args.input)
        params = tc.torch_to_flax(
            state, template, drop_speaker_embed=args.drop_speaker_embed
        )
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(args.output), params)
        ckptr.wait_until_finished()
        print(f"wrote orbax params → {args.output} "
              f"(iteration {meta.get('iteration')})")
    else:
        inp = args.input.rstrip("/")
        if os.path.isdir(os.path.join(inp, "default")):
            # a Trainer step directory (checkpoints/<step>): the payload is
            # the full train state {g_params, g_opt_state, d_params,
            # d_opt_state} — export the requested model's params mid-run
            # without waiting for fit() to finish
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            raw = ckptr.restore(os.path.abspath(os.path.join(inp, "default")))
            key = "d_params" if args.discriminator else "g_params"
            params = {"params": raw[key]}
        else:
            params = ckpt.restore_params(args.input, template)
        tc.save_torch_checkpoint(params, args.output)
        print(f"wrote reference checkpoint → {args.output}")


if __name__ == "__main__":
    main()
