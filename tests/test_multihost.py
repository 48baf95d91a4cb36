"""Multi-host helper: single-process behavior (no coordinator => no-op)."""

import jax

from apsim_tpu.parallel import global_mesh, init_multihost, is_coordinator


def test_single_host_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    init_multihost()  # must not raise or try to dial anything
    assert is_coordinator()
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
