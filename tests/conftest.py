import os

# Tests run on a virtual 8-device CPU mesh so sharding is exercised without
# TPU hardware (SURVEY.md §4: multi-chip tests use CPU mesh simulation).
#
# NOTE: something in the pytest startup path imports jax before this
# conftest runs, snapshotting JAX_PLATFORMS=axon from the environment — so
# setting os.environ here is NOT enough; jax.config.update below is what
# actually forces the CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend, got " + jax.default_backend())
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
