"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the reference's property that the whole suite runs without special
hardware (its MPI layer compiles to single-task no-ops — SURVEY.md section 4):
distributed logic here is exercised on `--xla_force_host_platform_device_count=8`
CPU devices, so sharding tests need no TPU pod.

Must set env vars BEFORE jax initializes a backend, hence module scope.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
