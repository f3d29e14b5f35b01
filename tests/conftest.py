"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; the standard JAX idiom is to
fake a pod slice with XLA host devices so the pjit/shard_map layer is
exercised for real (SURVEY.md §4.5).  Env vars must be set before jax import.
"""

import os
import sys
from pathlib import Path

# force CPU even if the environment registers a TPU plugin (the axon
# sitecustomize overrides the JAX_PLATFORMS env var at import) — tests need
# the virtual 8-device mesh, and parity math is platform-independent int32
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_accumulation():
    """Full-suite runs segfault late inside XLA CPU *compilation* once a
    process has accumulated enough live compiled executables (position-
    varying, never reproducible in file subsets; observed after ~80-190
    tests).  Dropping executable references at module boundaries keeps the
    per-process JIT footprint bounded; tests/helpers.py's shared wrappers
    transparently recompile on next use, so within-module compile sharing
    (the performance win) is unaffected."""
    yield
    jax.clear_caches()
