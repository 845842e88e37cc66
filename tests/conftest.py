import os

# Tests run on a virtual 8-device CPU mesh so sharding is exercised without
# TPU hardware (SURVEY.md §4: multi-chip tests use CPU mesh simulation).
#
# NOTE: something in the pytest startup path imports jax before this
# conftest runs, snapshotting JAX_PLATFORMS=axon from the environment — so
# setting os.environ here is NOT enough; jax.config.update below is what
# actually forces the CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"

# Interpret-mode compile-time control: the windowed Pallas kernels compile
# a body that scales with S x (2W+1)^3; at the production S=4 the
# interpret-mode lowering takes XLA:CPU tens of minutes (test_sim3d_cli_smoke
# alone >9.5 min; passes in ~3.5 min at S=1). Pin S=1 for the whole suite;
# individual perf experiments can still override the env explicitly.
os.environ.setdefault("FLUIDNET_SLICES_PER_PROGRAM", "1")

# Parity tests compare the fused sweeps against the exact reference
# implementation at tight tolerances: run them with f32 tap arithmetic.
# The production bf16 tap path has its own drift-budget test
# (tests/test_advect_fast.py::test_bf16_sweep_drift).
os.environ.setdefault("FLUIDNET_SWEEP_BF16", "0")

# The production fused-epilogue / fused-prologue kernels (default ON)
# multiply interpret-mode lowering time like S above; the suite runs the
# unfused compositions, and each fused path has dedicated value+grad
# parity tests that enable it explicitly (test_advect_fast.py::
# test_fused_epilogue_matches_unfused, tests/test_prologue.py — the
# latter includes a whole simulate() step with the knob forced on).
os.environ.setdefault("FLUIDNET_FUSED_EPILOGUE", "0")
os.environ.setdefault("FLUIDNET_FUSED_PROLOGUE", "0")

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


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute CLI/integration smokes (deselect with "
        "-m 'not slow'; `make test` runs everything)")
