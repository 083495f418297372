"""Test harness: run everything on CPU with 8 virtual devices.

Pallas kernels run in interpret mode on CPU (each op's handler chain falls
back automatically); sharding tests get an 8-device mesh without hardware.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
