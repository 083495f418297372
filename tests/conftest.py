"""Test harness: run everything on CPU with 8 virtual devices.

The environment pins JAX_PLATFORMS=axon (the TPU tunnel), so the env var
alone is not enough — we must override via jax.config before the backend
initializes. Pallas kernels fall back to their jnp twins on CPU via each
op's handler chain; sharding tests get an 8-device mesh without hardware.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
# Matmuls in float32 tests should actually accumulate in fp32; model code
# passes explicit precision where it matters.
jax.config.update("jax_default_matmul_precision", "highest")
