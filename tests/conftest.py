"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-device sharding tests use the standard JAX fake-multihost trick
(``xla_force_host_platform_device_count``); no TPU is needed to validate
sharding/collective correctness.  Must be set before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
