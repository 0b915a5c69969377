"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-device sharding tests use the standard JAX fake-multihost trick
(``xla_force_host_platform_device_count``); no TPU is needed to validate
sharding/collective correctness.  Must be set before jax initializes.
"""

import os

# The axon TPU plugin registers itself from sitecustomize at interpreter
# startup (before pytest/conftest run) and force-selects the tunneled TPU.
# Re-point JAX at an 8-device virtual CPU mesh and drop the already-built
# backends so the selection takes effect.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
# XLA:CPU hard-kills the process when a collective rendezvous exceeds 40 s;
# on a loaded 1-core host the 8 virtual devices' threads can straggle past
# that, so give the suite slack (must precede CPU backend init).
if "terminate_timeout" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_cpu_collective_call_terminate_timeout_seconds=600"
    ).strip()
# XLA:CPU's AOT cache loader rejects MULTI-DEVICE executables compiled with
# native ISA selection: compile-time target features include LLVM *tuning*
# pseudo-features (+prefer-no-scatter/+prefer-no-gather on AVX512 hosts)
# that the load-time host-CPUID check can never report, so every SPMD cache
# entry recompiles on every run (measured round 5: the 4 big GAN-step
# compiles re-ran warm, 634 s).  Capping codegen at AVX2 keeps those tuning
# features out of the signature and the cache loads cleanly; tests are
# compile-bound, not execute-bound, so the narrower ISA is the right trade.
if "max_isa" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_cpu_max_isa=AVX2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass

jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: the model-graph compiles dominate suite
# runtime on this 1-core host; cache them across pytest invocations
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_test_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
