"""Test env: run everything on CPU with 8 virtual devices so multi-chip
sharding tests work without TPU hardware (and unit tests stay fast and
deterministic).

NOTE: this environment pre-imports jax with a remote-TPU ("axon") backend
registered via sitecustomize, so setting JAX_PLATFORMS in os.environ is too
late — we must flip the platform through jax.config. XLA_FLAGS is still
honored because backends initialize lazily on first use.
"""

import os
import sys

# DENSEPOSE_REAL_TPU_TESTS=1 keeps the real backend (for tests/test_pallas_tpu.py)
if not os.environ.get("DENSEPOSE_REAL_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
