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

    # ----------------------------------------------- rows-sharded fast path
    # Round 2's gap #3: every multi-device layout fell back to the XLA
    # rectangle path.  With rows sharding, the upper-triangle block schedule
    # partitions by row block, so each device runs the int8 Pallas kernel
    # over its own blocks against one all-gathered int8 index copy
    # (ops/mesh_pallas.py) — no psum, collectives ride ICI.

    def _mesh_rows_geom(self):
        """(tm, tn, tk, interpret) when the rows-sharded kernel geometry
        fits the current capacities, else None.  Since every device scores
        its striped schedule from the all-gathered copy, only ``row_cap``
        must tile (no per-device ``b_rows`` alignment) — the ladder mirrors
        the single-chip kernel's geometries."""
        if self.cfg.shard_axis != "rows" or self.x is None:
            return None
        if self.row_cap % self.n_shards:
            return None  # sharding itself needs even row blocks
        interpret = jax.default_backend() != "tpu"
        ladder = (
            (1024, 512, 2048), (512, 512, 2048), (256, 256, 2048),
        )
        if interpret:
            ladder = ladder + ((64, 64, 64),)
        for tm, tn, tk in ladder:
            if (
                self.row_cap % tm == 0
                and self.row_cap % tn == 0
                and self.dim_cap % tk == 0
            ):
                return tm, tn, tk, interpret
        return None

    def _pallas_ok(self) -> bool:
        if self.x is not None and len(self.x.devices()) == 1:
            return super()._pallas_ok()
        mode = self.cfg.use_pallas
        if mode == "off" or self.x is None:
            return False
        if mode != "on" and jax.default_backend() != "tpu":
            return False
        if not (
            self.cfg.pallas_int8
            and not getattr(self, "_int8_off", False)
            and self._max_row_nnz() < ((1 << 30) // (127 * 127))
            and self.cfg.matmul_precision != "highest"
        ):
            return False
        if mode != "on":
            # auto mode HBM guard (mesh analog of the single-device `fits`
            # check): per device, the bit-packed hit structure is the
            # striped 1/n share of ~row_cap²/14 bytes, PLUS one all-gathered
            # int8 index copy of row_cap·dim_cap bytes
            n = self.n_shards
            bits_fit = self.row_cap * self.row_cap // (14 * n) <= (1 << 31)
            gather_fit = self.row_cap * self.dim_cap <= (1 << 32)
            if not (bits_fit and gather_fit):
                return False
        return self._mesh_rows_geom() is not None

    def _all_pairs_pallas(self, tau_eff, cap: int):
        if self.x is not None and len(self.x.devices()) == 1:
            return super()._all_pairs_pallas(tau_eff, cap)
        return self._all_pairs_pallas_rows(tau_eff, cap)

    def _all_pairs_pallas_rows(self, tau_eff, cap: int):
        import jax.numpy as jnp
        from jax.sharding import NamedSharding

        from ..ops import mesh_pallas
        from ..ops import pallas_score as ps
        from ..ops import score as score_ops
        from ..vector.batch import pow2_bucket

        self._used_int8 = True
        tm, tn, tk, interpret = self._mesh_rows_geom()
        n = self.n_shards
        bi, bj, va = mesh_pallas.rows_schedule(self.row_cap, n, tm, tn)
        sh = NamedSharding(self.mesh, P(AXIS, None))
        bi_d = jax.device_put(jnp.asarray(bi), sh)
        bj_d = jax.device_put(jnp.asarray(bj), sh)
        va_d = jax.device_put(jnp.asarray(va), sh)
        caps = getattr(self, "_mesh_caps", None)
        if caps is None:
            c = pow2_bucket(cap, 1024)
            cb = max(c // ps.GROUP, 1024)
            caps = (c, cb, cb)  # generous cap0 default: see pallas_score
        pack = self.row_cap <= 65536
        while True:
            fn = mesh_pallas.mesh_rows_extract_int8(
                self.mesh, AXIS, self.row_cap, self.dim_cap, *caps,
                tm, tn, tk, interpret, pack,
            )
            rows, cols, heads = fn(self.x, bi_d, bj_d, va_d, tau_eff)
            heads_np = np.asarray(heads)
            parsed = [
                ps.unpack_pallas_head(heads_np[d]) for d in range(n)
            ]
            mx = tuple(
                max(p[k] for p in parsed) for k in (2, 3, 4)
            )
            if mx[0] > caps[0] or mx[1] > caps[1] or mx[2] > caps[2]:
                caps = score_ops.grow_caps(caps, mx)
                continue
            break
        self._mesh_caps = score_ops.tighten_caps(mx, caps)
        all_i, all_j = [], []
        for d, (rows_h, cols_h, total, _, _) in enumerate(parsed):
            if total == 0:
                continue
            if total <= rows_h.size:
                all_i.append(rows_h[:total])
                all_j.append(cols_h[:total])
            else:
                dec = score_ops.decode_pairs((rows[d], cols[d]), total)
                all_i.append(dec[0])
                all_j.append(dec[1])
        if not all_i:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(all_i), np.concatenate(all_j)

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
