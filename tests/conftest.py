"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding is validated without TPU hardware (SURVEY.md §4).

Reuses the driver entry's ``_bootstrap_virtual_cpu`` (ONE definition of the
bootstrap): it guards the already-set-XLA_FLAGS and already-initialized-JAX
cases with a clear diagnostic instead of the opaque "mesh needs N devices"
error, and verifies the device count actually materialized.

Note: this image registers the TPU PJRT plugin from ``sitecustomize`` at
interpreter start, so ``JAX_PLATFORMS=cpu`` in the environment is already
overridden; switching via ``jax.config`` after import (which the bootstrap
does) is the reliable path.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _bootstrap_virtual_cpu  # noqa: E402

_bootstrap_virtual_cpu(8)
