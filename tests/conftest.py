"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding is validated without TPU hardware (SURVEY.md §4).

Note: this image registers the TPU PJRT plugin from ``sitecustomize`` at
interpreter start, so ``JAX_PLATFORMS=cpu`` in the environment is already
overridden; switching via ``jax.config`` after import is the reliable path.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
