"""Test configuration.

Tests run JAX on CPU with 8 virtual devices so the multi-chip sharding
path (moonbit_flate_tpu/parallel) is exercised without TPU hardware, per
the multi-host test strategy in SURVEY.md §4.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This image's jax build registers the TPU tunnel plugin regardless of the
# JAX_PLATFORMS env var; the config flag does take effect.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
