"""Mesh-sharded engine: dimension-sharded scale-out over a TPU slice.

The reference scales by partitioning posting lists across Akka cluster shards
with ``dim % maxShardNum`` and multicasting each vector once per shard with
only that shard's dims (WriteWorkerActor.scala:73-76,172-174;
SparseVectorWrapper.scala:9), then letting ClusterSharding place the shards
(CommonUtils.scala:28-46).  On a TPU slice the same decomposition is a
*column sharding* of the dense index matrix over a ``jax.sharding.Mesh``:

  - ``shard_axis="dims"`` (default, reference parity): ``X [rows, dims]`` is
    sharded ``P(None, "shards")`` — each device owns a contiguous block of
    compact dims (contiguous instead of modulo for locality; SURVEY.md §2).
    ``X @ Qᵀ`` then contracts over the sharded axis and XLA inserts the
    ``psum`` of per-device partial dot products over ICI — exactly the
    "assemble full cosine from shard-local partial sums" the actor system
    never did (it recomputed full dots per shard instead).
  - ``shard_axis="rows"``: data-parallel alternative — each device owns a
    block of vectors, queries are broadcast; no psum, results concatenate.

  - ``shard_axis="both"``: a 2-D mesh ``(rows × dims)`` — the index matrix is
    sharded ``P("rows", "dims")``: row blocks give data parallelism, dim
    blocks give the reference-style posting partition within each row group;
    XLA composes the psum over the dim axis with the row-parallel layout.
    This is the layout that scales both corpus size AND vocabulary at once.

Everything else (extraction, growth, rescore) is inherited unchanged from
:class:`~apsim_tpu.engine.engine.Engine`; GSPMD propagates the sharding
through the scatter/extract jits.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import AllPairsConfig
from ..engine.engine import Engine
from ..vector.batch import round_up

__all__ = ["MeshEngine", "make_mesh"]

AXIS = "shards"
ROW_AXIS = "rows"
DIM_AXIS = "dims"


def make_mesh(shape: Sequence[int] | int | None = None, devices=None) -> Mesh:
    """Mesh over the slice (or an explicit device list): 1-D ``(shards,)``
    for a single shard axis, or 2-D ``(rows, dims)`` when given two sizes."""
    if devices is None:
        devices = jax.devices()
    if shape is None or shape == ():
        n = len(devices)
        dims = (n,)
    elif isinstance(shape, int):
        dims = (shape,)
    else:
        dims = tuple(int(s) for s in shape)
    n = int(np.prod(dims))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    if len(dims) == 1:
        return Mesh(np.array(devices[:n]), (AXIS,))
    if len(dims) == 2:
        return Mesh(
            np.array(devices[:n]).reshape(dims), (ROW_AXIS, DIM_AXIS)
        )
    raise ValueError(f"mesh shape must be 1-D or 2-D, got {dims}")


class MeshEngine(Engine):
    """Engine whose index matrix lives sharded across a device mesh.

    The public API is identical to :class:`Engine`; construction takes the
    mesh (or builds one over all visible devices).  ``max_shard_num`` from the
    reference config maps to the mesh size.
    """

    def __init__(
        self,
        config: AllPairsConfig | None = None,
        mesh: Mesh | None = None,
    ):
        config = config or AllPairsConfig()
        if mesh is None:
            mesh = make_mesh(config.mesh_shape or None)
        self.mesh = mesh
        self.n_shards = int(np.prod(mesh.devices.shape))
        if len(mesh.devices.shape) == 2:
            # 2-D mesh: rows × dims jointly sharded
            n_rows_shards, n_dim_shards = mesh.devices.shape
            spec = P(ROW_AXIS, DIM_AXIS)
            config = config.replace(
                shard_axis="both",
                dim_bucket=round_up(config.dim_bucket, 128 * n_dim_shards),
                row_bucket=round_up(
                    max(config.row_bucket, config.query_tile),
                    8 * n_rows_shards,
                ),
            )
        elif config.shard_axis == "dims":
            spec = P(None, AXIS)
            # column blocks must tile evenly across shards
            config = config.replace(
                dim_bucket=round_up(config.dim_bucket, 128 * self.n_shards)
            )
        elif config.shard_axis == "rows":
            spec = P(AXIS, None)
            config = config.replace(
                row_bucket=round_up(
                    max(config.row_bucket, config.query_tile),
                    8 * self.n_shards,
                )
            )
        else:
            raise ValueError(f"unknown shard_axis: {config.shard_axis}")
        self.x_sharding = NamedSharding(mesh, spec)
        super().__init__(config)

    def _place(self, x):
        return jax.device_put(x, self.x_sharding)

    def shard_layout(self) -> dict:
        """Introspection: which compact-dim (or row) block each device owns —
        the moral equivalent of the reference's shard→entry routing table
        (CommonUtils.scala:28-40)."""
        n = self.n_shards
        out = {}
        if self.cfg.shard_axis == "both":
            nr, nd = self.mesh.devices.shape
            rb = self.row_cap // nr if self.row_cap else 0
            db = self.dim_cap // nd if self.dim_cap else 0
            for (ri, di), d in np.ndenumerate(self.mesh.devices):
                out[str(d)] = {
                    "row_block": (ri * rb, (ri + 1) * rb),
                    "dim_block": (di * db, (di + 1) * db),
                }
        elif self.cfg.shard_axis == "dims":
            block = self.dim_cap // n if self.dim_cap else 0
            for i, d in enumerate(self.mesh.devices.flat):
                out[str(d)] = {"dim_block": (i * block, (i + 1) * block)}
        else:
            block = self.row_cap // n if self.row_cap else 0
            for i, d in enumerate(self.mesh.devices.flat):
                out[str(d)] = {"row_block": (i * block, (i + 1) * block)}
        return out
