"""Multi-process worker for the real multi-host training test.

Launched (not collected) by ``tests/test_multihost.py`` as two OS processes
that rendezvous through ``utils.runtime.init_distributed`` and run the ACTUAL
fused GAN train step on a cross-process device mesh (2 processes × 2 local
CPU devices = one 4-way ``data`` axis).  Gradient all-reduces ride real
cross-process collectives (gloo), exactly the topology of a TPU pod slice —
the single-process path only ever exercises intra-process collectives.

Counterpart of the reference's DDP spawn (reference
``finetune_speaker_v2.py:69,144-145``: ``dist.init_process_group`` +
``mp.spawn`` one process per GPU).
"""

import argparse
import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_batch(b, tt, ts, hop):
    """Deterministic global batch — identical in every process and in the
    single-process reference run of the pytest."""
    import jax.numpy as jnp
    import numpy as np

    from personalized_text_to_speech_tpu.train.step import Batch

    rng_np = np.random.default_rng(3)
    t = np.linspace(0, 8, ts * hop)
    wav_data = np.stack(
        [0.5 * np.sin(2 * np.pi * (20 + 3 * i) * t) for i in range(b)]
    ).astype(np.float32)
    return Batch(
        text=jnp.asarray(rng_np.integers(1, 10, (b, tt)), jnp.int32),
        text_lengths=jnp.asarray(rng_np.integers(4, tt + 1, (b,)), jnp.int32),
        wav=jnp.asarray(wav_data),
        wav_lengths=jnp.asarray(
            rng_np.integers(ts - 6, ts + 1, (b,)) * hop, jnp.int32
        ),
        sid=jnp.asarray(rng_np.integers(0, 4, (b,)), jnp.int32),
    )


def init_models():
    import jax
    import jax.numpy as jnp

    from personalized_text_to_speech_tpu.models.discriminator import (
        MultiPeriodDiscriminator,
    )
    from tests.test_model import tiny_model
    from tests.test_train import HOP, tiny_hps

    hps = tiny_hps()
    g_model = tiny_model()
    d_model = MultiPeriodDiscriminator(periods=(2, 3))
    rng = jax.random.PRNGKey(0)
    tt, ts = 6, 24
    g_params = g_model.init(
        {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
        jnp.ones((2, tt), jnp.int32), jnp.array([6, 5]),
        jnp.zeros((2, ts, 33)), jnp.array([24, 20]), jnp.array([0, 1]),
    )["params"]
    wav0 = jnp.zeros((2, 8 * HOP))
    d_params = d_model.init(rng, wav0, wav0)["params"]
    return hps, g_model, d_model, g_params, d_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", required=True, help="npz path (process 0 writes)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_default_matmul_precision", "highest")
    # share the suite's persistent compile cache (tests/conftest.py)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_test_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from personalized_text_to_speech_tpu.utils import runtime

    runtime.init_distributed(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == args.num_processes * n_local

    # establish the cross-process gloo context NOW, while both workers are
    # at the same point: gloo's KV handshake has a fixed 30 s deadline, and
    # on a contended 1-core host the model-init/compile skew between the
    # two workers can exceed it if the first collective comes later
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("gloo-context-warmup")

    import numpy as np

    from personalized_text_to_speech_tpu.parallel import (
        create_mesh,
        replicated,
        shard_batch,
    )
    from personalized_text_to_speech_tpu.train.state import create_train_state
    from personalized_text_to_speech_tpu.train.step import make_train_step
    from tests.test_train import HOP

    hps, g_model, d_model, g_params, d_params = init_models()
    b, tt, ts = 8, 6, 24
    batch = build_batch(b, tt, ts, HOP)

    mesh = create_mesh({"data": -1})

    # pre-establish the full-mesh gloo clique with a tiny all-reduce: gloo
    # builds one context per communicator clique with a 30 s KV deadline,
    # and the big-step compile skew between workers (compile-cache races on
    # a contended host) can exceed it — the tiny psum compiles in seconds
    # on both sides, so the clique exists before the real step runs
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    warm = jax.device_put(
        np.ones((n_global,), np.float32), NamedSharding(mesh, P("data"))
    )
    total = jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P())
    )(warm)
    assert float(total) == n_global

    g_state = jax.device_put(
        create_train_state(g_model.apply, g_params, hps, 4), replicated(mesh)
    )
    d_state = jax.device_put(
        create_train_state(d_model.apply, d_params, hps, 4), replicated(mesh)
    )
    # each process feeds ONLY its rank's rows; shard_batch assembles the
    # global array from the process-local shards
    rows = b // args.num_processes
    local = jax.tree_util.tree_map(
        lambda a: np.asarray(a)[args.process_id * rows : (args.process_id + 1) * rows],
        batch,
    )
    batch_s = shard_batch(local, mesh)

    step = jax.jit(
        make_train_step(g_model, d_model, hps, debug_grads=True),
        donate_argnums=(),
    )
    with mesh:
        g_state, d_state, metrics = step(
            g_state, d_state, batch_s, jax.random.PRNGKey(100)
        )

    scalars = {
        k: float(v)
        for k, v in metrics.items()
        if not k.startswith("_")
    }
    grads_g = [np.asarray(x) for x in jax.tree_util.tree_leaves(metrics["_grads_g"])]
    grads_d = [np.asarray(x) for x in jax.tree_util.tree_leaves(metrics["_grads_d"])]
    if args.process_id == 0:
        out = {f"gg_{i}": a for i, a in enumerate(grads_g)}
        out.update({f"gd_{i}": a for i, a in enumerate(grads_d)})
        out["n_gg"] = np.array(len(grads_g))
        out["n_gd"] = np.array(len(grads_d))
        out["scalar_keys"] = np.array(sorted(scalars))
        out["scalar_vals"] = np.array(
            [scalars[k] for k in sorted(scalars)], dtype=np.float64
        )
        np.savez(args.out, **out)
    print(f"worker {args.process_id}: ok ({n_global} global devices)")


if __name__ == "__main__":
    main()
