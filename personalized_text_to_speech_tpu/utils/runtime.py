"""Runtime setup helpers: persistent compilation cache and device warmup.

On this class of TPU attach (tunneled single chip), two one-time costs
dominate cold starts and must be managed explicitly:

* XLA compilation of the big synthesizer graphs takes minutes — the
  persistent compilation cache makes every later process start cheap,
* the FIRST device→host transfer pays a large channel-setup cost (measured
  ~minutes on the tunnel); a tiny warmup readback at startup absorbs it so
  it never lands inside a timed or user-facing call.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)

# Pin CPU codegen to the portable AVX2 baseline in every process that
# imports the runtime: XLA's CPU AOT loader rejects persisted entries whose
# compile-time machine features don't exactly match the host (native-ISA
# selection bakes in LLVM tuning pseudo-features like +prefer-no-scatter),
# so native entries die on any host machine-type change — and because the
# rejected entry still occupies its cache key, the module recompiles in
# EVERY later process, forever (observed: ~60 rejected loads per bench run
# after the round-4/5 host change).  TPU compiles are keyed by their own
# backend/options and are unaffected.  Must be in XLA_FLAGS before the CPU
# client is created; the axon sitecustomize only force-creates the TPU
# client, so import time is early enough.  tests/conftest.py and
# __graft_entry__ apply the same cap.
if "max_isa" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_cpu_max_isa=AVX2"
    ).strip()


def relay_alive() -> bool:
    """On axon loopback attaches, every device op futex-waits forever if
    the tunnel relay process (``.tpu_init.py``) has died — detect that
    without touching the device.  Returns True when not on a
    loopback-relay attach (nothing to check) or when the relay is up.
    See CLAUDE.md operational findings: the relay cannot be restarted from
    inside the VM, so the only useful behavior is failing fast."""
    if os.environ.get("PALLAS_AXON_POOL_IPS") != "127.0.0.1":
        return True  # not a loopback-relay attach
    try:
        import subprocess

        out = subprocess.run(
            ["ps", "-eo", "cmd"], capture_output=True, text=True, timeout=10
        ).stdout
        return ".tpu_init.py" in out
    except Exception:
        return True  # can't tell — proceed normally


def require_tpu_reachable() -> None:
    """Fail fast (SystemExit 1) instead of futex-hanging when the TPU
    tunnel relay is dead.  Call at the top of every TPU-touching CLI,
    before the first device op."""
    if not relay_alive():
        raise SystemExit(
            "axon loopback relay (.tpu_init.py) is not running — the TPU "
            "is unreachable from this VM and every device op would hang "
            "forever; restart the attach, or run CPU-side tools with "
            "`env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu`"
        )


def enable_compilation_cache(cache_dir: str = None) -> str:
    """Turn on the persistent compilation cache (idempotent)."""
    cache_dir = cache_dir or os.environ.get(
        "PTTS_JAX_CACHE_DIR", DEFAULT_CACHE_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def warmup_transfers() -> float:
    """Force one device round-trip; returns seconds spent (first call on a
    fresh attach can be very slow — by design we pay it here)."""
    t0 = time.perf_counter()
    x = jnp.zeros((8, 128))
    _ = jax.device_get(x + 1.0)
    return time.perf_counter() - t0


def setup(cache: bool = True, warmup: bool = True) -> None:
    if cache:
        enable_compilation_cache()
    if warmup:
        warmup_transfers()


def init_distributed(
    coordinator_address: str = None,
    num_processes: int = None,
    process_id: int = None,
) -> None:
    """Multi-host rendezvous for pod-slice training.

    TPU-native replacement for the reference's
    ``dist.init_process_group('nccl', init_method='env://')``
    (``finetune_speaker_v2.py:69``): on TPU pods ``jax.distributed.initialize``
    auto-discovers the topology; explicit args cover CPU/GPU fleets.  After
    this, ``jax.process_index()/process_count()`` drive the bucket-batcher
    sharding and ``jax.devices()`` spans the whole slice.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
