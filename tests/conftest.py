"""Test env: force CPU with 8 virtual devices BEFORE jax backends initialise.

Note: in this environment the JAX_PLATFORMS *env var* is overridden by the
TPU platform plugin, so the config API is used instead (it wins).

Tests exercise the full pipeline (Pallas kernels run in interpret mode on
CPU) and the multi-chip sharding path on a virtual 8-device mesh; real-TPU
runs happen via bench.py / __graft_entry__.py.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
