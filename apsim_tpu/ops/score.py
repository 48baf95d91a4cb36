"""Core device ops: densify, index update, tiled MXU scoring with on-device
pair extraction, top-k.

This is the TPU replacement for the reference's hot path — the
``querySimilarItems`` posting-list walk (IndexingWorkerActor.scala:74-111)
plus ``calculateSimilarity``'s per-pair HashMap dot product
(CommonUtils.scala:98-117).  Instead of walking ragged posting lists, the
index is a dense ``[row_cap, dim_cap]`` matrix over *compact* columns (see
``index/compact.py``); scoring is a blocked ``X @ Qᵀ`` on the MXU, and the
thresholded candidate pairs are *compacted on device* (nonzero with a static
capacity) so only ``O(pairs)`` bytes cross the host link — critical because
this environment's device↔host link runs at ~35 MB/s.

TPU-specific notes (learned the hard way, kept as executable knowledge):
  - An epilogue that varies along BOTH output dims (e.g. ``rows < cols`` from
    two broadcasted iotas) fused into a matmul sends the TPU compiler into a
    150 s compile; a ``lax.optimization_barrier`` between the matmul and the
    mask keeps compiles at ~1 s for the price of materializing the score tile
    in HBM (negligible traffic).
  - Padded/invalid rows are all-zero, so any ``tau_eff > 0`` threshold
    excludes them for free — no validity iota needed in the hot mask.
  - All jits take static shapes only through ``static_argnames``; every
    (row_cap, dim_cap, tile, cap) bucket compiles exactly once.

Overflow contract: extraction returns the TRUE hit count even when it exceeds
``cap`` (writes past the buffer are dropped); callers must retry with a larger
cap when ``count > cap``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "densify",
    "new_index_matrix",
    "insert_rows",
    "grow",
    "allpairs_extract",
    "match_tile_extract",
    "dense_queries_extract",
    "topk_scores",
    "MIN_TAU_EFF",
]

# floor for the device threshold: keeps all-zero (padded/invalid) rows out of
# the candidate set without any index arithmetic in the matmul epilogue
MIN_TAU_EFF = 1e-30


def _precision(name: str):
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


@functools.partial(jax.jit, static_argnames=("rows", "cols", "dtype"))
def densify(dims, vals, rows: int, cols: int, dtype: str = "float32"):
    """Scatter a padded sparse batch ``dims/vals [M, K]`` into a dense
    ``[rows, cols]`` matrix.  Padding entries carry ``dims == cols`` (one past
    the last column) and are dropped by XLA's out-of-bounds scatter rule."""
    out = jnp.zeros((rows, cols), dtype=jnp.dtype(dtype))
    row_ids = jax.lax.broadcasted_iota(jnp.int32, dims.shape, 0)
    return out.at[row_ids, dims].add(
        vals.astype(out.dtype), mode="drop", unique_indices=True
    )


def new_index_matrix(row_cap: int, dim_cap: int, dtype: str = "float32"):
    return jnp.zeros((row_cap, dim_cap), dtype=jnp.dtype(dtype))


@functools.partial(jax.jit, donate_argnums=(0,))
def insert_rows(x, dims, vals, row_offset):
    """Scatter-append a padded batch into the index matrix starting at
    ``row_offset`` (donated, in-place on device) — the TPU analog of the
    WriteWorker's micro-batched flush into the inverted index
    (WriteWorkerActor.scala:164-183 → IndexingWorkerActor.buildInvertedIndex)."""
    row_ids = row_offset + jax.lax.broadcasted_iota(jnp.int32, dims.shape, 0)
    return x.at[row_ids, dims].add(
        vals.astype(x.dtype), mode="drop", unique_indices=True
    )


@functools.partial(jax.jit, static_argnames=("row_cap", "dim_cap"))
def grow(x, row_cap: int, dim_cap: int):
    """Copy into a larger zero matrix (capacity-doubling growth)."""
    out = jnp.zeros((row_cap, dim_cap), dtype=x.dtype)
    return jax.lax.dynamic_update_slice(out, x, (0, 0))


def _score_tile(x, q0, tile, precision):
    """One [row_cap, tile] fp32 score tile: X @ X[q0:q0+tile]ᵀ."""
    row_cap, dim_cap = x.shape
    q = jax.lax.dynamic_slice(x, (q0, 0), (tile, dim_cap))
    s = jax.lax.dot_general(
        x, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(precision),
    )
    # barrier: keep the 2D index mask OUT of the matmul epilogue (see module
    # docstring — fusing it in causes a pathological TPU compile)
    return jax.lax.optimization_barrier(s)


def _extract(m_flat, buf_i, buf_j, cursor, row_cap, tile, q0, cap):
    """Compact the True positions of ``m_flat`` into (buf_i, buf_j) at
    ``cursor``; returns updated carry.  Entries past ``cap`` are dropped but
    still counted."""
    cnt = jnp.sum(m_flat, dtype=jnp.int32)
    (flat,) = jnp.nonzero(m_flat, size=cap, fill_value=row_cap * tile)
    rows = (flat // tile).astype(jnp.int32)
    cols = (q0 + flat % tile).astype(jnp.int32)
    pos = cursor + jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
    # sentinel fills decode to row == row_cap; they sit past ``cursor + cnt``
    # and are either overwritten by the next tile or ignored via the count
    buf_i = buf_i.at[pos].set(rows, mode="drop")
    buf_j = buf_j.at[pos].set(cols, mode="drop")
    return buf_i, buf_j, cursor + cnt


@functools.partial(
    jax.jit, static_argnames=("tile", "cap", "mode", "precision")
)
def allpairs_extract(
    x, tau_eff, tile: int, cap: int, mode: str = "upper",
    precision: str = "highest",
):
    """All-pairs join over the whole index in ONE device call.

    Loops row tiles on device (``fori_loop``), scores each against the full
    index on the MXU, thresholds at ``tau_eff`` and compacts the surviving
    (row, col) pairs into fixed-capacity buffers.  Returns
    ``(buf_i, buf_j, count)``; ``count`` is exact even on overflow.

    mode="upper": strict upper triangle (canonical i<j pairs) — the dedup the
    reference approximates with per-query hash maps
    (IndexingWorkerActor.scala:89-91).
    mode="all": every thresholded (row, col) including self/symmetric.
    """
    row_cap, _ = x.shape
    n_tiles = row_cap // tile

    def body(t, carry):
        buf_i, buf_j, cursor = carry
        q0 = t * tile
        s = _score_tile(x, q0, tile, precision)
        m = s >= tau_eff
        if mode == "upper":
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = q0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            m &= rows < cols
        return _extract(
            m.reshape(-1), buf_i, buf_j, cursor, row_cap, tile, q0, cap
        )

    init = (
        jnp.full((cap,), -1, jnp.int32),
        jnp.full((cap,), -1, jnp.int32),
        jnp.int32(0),
    )
    return jax.lax.fori_loop(0, n_tiles, body, init)


@functools.partial(jax.jit, static_argnames=("tile", "cap", "precision"))
def match_tile_extract(
    x, q0, lo, tau_eff, tile: int, cap: int, precision: str = "highest"
):
    """Streaming-match one query tile ``x[q0:q0+tile]`` against the full
    index: keep (row, col) with ``s >= tau_eff``, ``col >= lo`` (only columns
    belonging to the new batch) and ``row != col`` (no self-pairs).  Both
    directions of an intra-batch pair surface, matching the reference's
    index-before-query emission (SURVEY.md fine-print #2)."""
    row_cap, _ = x.shape
    s = _score_tile(x, q0, tile, precision)
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cols = q0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    m = (s >= tau_eff) & (rows != cols) & (cols >= lo)
    buf_i = jnp.full((cap,), -1, jnp.int32)
    buf_j = jnp.full((cap,), -1, jnp.int32)
    return _extract(
        m.reshape(-1), buf_i, buf_j, jnp.int32(0), row_cap, tile, q0, cap
    )


@functools.partial(jax.jit, static_argnames=("cap", "precision"))
def dense_queries_extract(x, q, tau_eff, cap: int, precision: str = "highest"):
    """Score externally-supplied dense query rows ``q [T, dim_cap]`` (NOT part
    of the index — the frozen-index benchmark path) and compact hits.
    Returns (buf_row, buf_qcol, count)."""
    row_cap = x.shape[0]
    tile = q.shape[0]
    s = jax.lax.dot_general(
        x, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(precision),
    )
    s = jax.lax.optimization_barrier(s)
    m = s >= tau_eff
    buf_i = jnp.full((cap,), -1, jnp.int32)
    buf_j = jnp.full((cap,), -1, jnp.int32)
    return _extract(
        m.reshape(-1), buf_i, buf_j, jnp.int32(0), row_cap, tile,
        jnp.int32(0), cap,
    )


@functools.partial(jax.jit, static_argnames=("k", "precision"))
def topk_scores(x, q, n_rows, k: int, precision: str = "highest"):
    """Top-k cosine neighbors per dense query row: (scores [T, k],
    row indices [T, k]); rows past ``n_rows`` masked to -inf."""
    s = jax.lax.dot_general(
        q, x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(precision),
    )  # [T, row_cap]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(row_ids < n_rows, s, -jnp.inf)
    return jax.lax.top_k(s, k)
