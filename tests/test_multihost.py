"""Real multi-HOST (multi-process) data-parallel correctness.

Two OS processes rendezvous via ``jax.distributed`` (the TPU-pod topology:
``utils.runtime.init_distributed`` ↔ reference
``dist.init_process_group('nccl')``, ``finetune_speaker_v2.py:69``), build a
cross-process 4-device mesh, and run the REAL fused GAN train step with each
process feeding only its rank's batch rows.  The resulting gradients — whose
all-reduce crossed a process boundary over gloo — must equal the
single-process, single-device gradients on the same global batch.
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_gan_step_matches_single(tmp_path):
    out = tmp_path / "proc0.npz"
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [
                sys.executable, WORKER,
                "--process_id", str(i), "--num_processes", "2",
                "--port", str(port), "--out", str(out),
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    try:
        for p in procs:
            # cold-compiling the fused GAN step in two processes on a
            # contended 1-core host can take >15 min; warm cache is ~1 min
            stdout, _ = p.communicate(timeout=2400)
            logs.append(stdout.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"
    assert out.exists()

    # ---- single-process, single-device reference on the same global batch
    from personalized_text_to_speech_tpu.train.state import create_train_state
    from personalized_text_to_speech_tpu.train.step import make_train_step
    from tests.mp_worker import build_batch, init_models
    from tests.test_train import HOP

    hps, g_model, d_model, g_params, d_params = init_models()
    batch = build_batch(8, 6, 24, HOP)
    g1 = create_train_state(g_model.apply, g_params, hps, 4)
    d1 = create_train_state(d_model.apply, d_params, hps, 4)
    step = jax.jit(
        make_train_step(g_model, d_model, hps, debug_grads=True),
        donate_argnums=(),
    )
    _, _, m1 = step(g1, d1, batch, jax.random.PRNGKey(100))

    data = np.load(out)
    for name, tree_key in (("gg", "_grads_g"), ("gd", "_grads_d")):
        leaves1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(m1[tree_key])]
        n = int(data[f"n_{name}"])
        assert n == len(leaves1)
        scale = max(float(np.abs(l).max()) for l in leaves1)
        for i in range(n):
            np.testing.assert_allclose(
                leaves1[i], data[f"{name}_{i}"],
                rtol=1e-4, atol=1e-6 * max(scale, 1.0),
                err_msg=f"{tree_key}[{i}]",
            )
    scal1 = {
        k: float(v) for k, v in m1.items() if not k.startswith("_")
    }
    keys = [str(k) for k in data["scalar_keys"]]
    vals = data["scalar_vals"]
    for k, v in zip(keys, vals):
        np.testing.assert_allclose(
            scal1[k], v, rtol=2e-4, atol=2e-4, err_msg=k
        )
