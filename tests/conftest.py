"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; the standard JAX idiom is to
fake a pod slice with XLA host devices so the pjit/shard_map layer is
exercised for real (SURVEY.md §4.5).  Env vars must be set before jax import.
"""

import os
import sys
from pathlib import Path

# force CPU even if the shell presets JAX_PLATFORMS (e.g. the axon TPU
# tunnel) — tests need the virtual 8-device mesh, and parity math is
# platform-independent int32
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
