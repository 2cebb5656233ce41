"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the reference's property that the whole suite runs without special
hardware (its MPI layer compiles to single-task no-ops — SURVEY.md section 4):
distributed logic here is exercised on `--xla_force_host_platform_device_count=8`
CPU devices, so sharding tests need no TPU pod.

Must set env vars BEFORE jax initializes a backend, hence module scope.
"""

import os

# Force, don't setdefault: the environment may preselect a TPU platform
# plugin, and unit tests must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# A sitecustomize hook in this environment imports jax at interpreter
# startup (before conftest), latching jax_platforms to the TPU plugin.
# Re-point the already-imported config at CPU; backends are initialized
# lazily, so this wins as long as no array has been created yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.devices()[0].platform
)
