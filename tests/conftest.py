"""Test harness: 8 virtual CPU devices, float64 enabled.

The driver environment force-registers a TPU ('axon') PJRT plugin via
sitecustomize and pins jax_platforms=axon; tests run on a virtual
8-device CPU mesh instead (multi-chip sharding is validated without
real chips, SURVEY.md 2.5), so we override the platform before any
backend initialization.
"""

import os

# --xla_cpu_parallel_codegen_split_count=1: the round-2 "xdist flake"
# was a SEGFAULT inside XLA:CPU's backend_compile_and_load under
# 2-worker contention (reproduced 2026-08-21, full-suite run: worker
# crash in jax/_src/compiler.py:362 during LLVM codegen, blamed on
# whatever test was running — hence two unrelated "flaky" tests).
# Serializing the parallel LLVM codegen removes the contention-
# sensitive native race; compile time impact on this 2-core box is
# negligible.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_cpu_parallel_codegen_split_count=1"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    return REFERENCE
