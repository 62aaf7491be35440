"""Test configuration: force an 8-device CPU mesh so TPU SPMD code paths are
exercised without TPU hardware (the standard JAX multi-device testing recipe).

Note: this environment registers a TPU PJRT plugin via sitecustomize at
interpreter start and the TPU tunnel is single-client, so tests switch JAX to
CPU *after* import via jax.config (env vars alone are overridden).
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU-suite wall time is dominated by XLA compiles; reuse them across runs.
from actalker_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
