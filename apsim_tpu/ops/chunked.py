"""Chunked-sparse scoring: exact joins without a resident dense index.

The dense engine materializes ``X [rows, dim_cap]`` (HBM ceiling ≈ 130k rows
at Enron-like vocabularies).  This mode keeps the index as flat COO entry
arrays sorted by dim-chunk and densifies ONE ``[row_cap, C]`` slab at a time:

    S_super = Σ_c  slab_c @ slab_c[q0:q0+super]ᵀ

Memory: ``O(nnz + rows·C + rows·super)`` — a few GB at 1M rows — instead of
``O(rows · dims)``.

Structure notes (learned on hardware):
  - the tile loop lives on the HOST; each device call handles one
    ``super``-wide query stripe with an internal ``fori`` over chunks.  A
    single fused program with both loops (tiles × chunks) nested crashed the
    TPU worker at ≥100k rows; per-stripe programs are small and stable.
  - ``super`` ≫ tile amortizes the per-chunk slab scatter (the dominant cost)
    over more query columns.

Chunk assignment interleaves frequency-ranked compact dims
(``chunk = col % n_chunks``, ``local = col // n_chunks``) so chunk loads are
balanced and the static per-chunk entry capacity wastes little.

Batch-mode only in round 1 (build + all_pairs); streaming appends stay on
the dense engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .score import HEAD_JOIN, _extract, _pack_head, _precision

__all__ = [
    "sort_entries_by_chunk",
    "chunked_stripe_extract",
    "chunked_topk",
]


def sort_entries_by_chunk(
    rows: np.ndarray, cols: np.ndarray, vals: np.ndarray, n_chunks: int
):
    """Host-side: sort COO entries by (chunk, local dim); returns the sorted
    arrays plus int32 per-chunk offsets [n_chunks + 1] and the max per-chunk
    count (for capacity sizing)."""
    chunk = cols % n_chunks
    local = cols // n_chunks
    order = np.lexsort((local, chunk))
    rows, local, vals, chunk = (
        rows[order], local[order], vals[order], chunk[order]
    )
    counts = np.bincount(chunk, minlength=n_chunks)
    offs = np.zeros(n_chunks + 1, dtype=np.int32)
    np.cumsum(counts, out=offs[1:])
    return (
        rows.astype(np.int32),
        local.astype(np.int32),
        vals.astype(np.float32),
        offs,
        int(counts.max()) if counts.size else 0,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "row_cap", "chunk_dim", "max_ent", "super_tile", "cap", "group",
        "precision",
    ),
)
def chunked_stripe_extract(
    ent_row, ent_col, ent_val, chunk_offs, q0, tau_eff,
    row_cap: int, chunk_dim: int, max_ent: int, super_tile: int, cap: int,
    group: int = 8, precision: str = "default",
):
    """Score one ``super_tile``-wide query stripe of the upper-triangle join
    over chunked COO entries; returns (bufs, packed_head) like
    ``score.match_tile_extract``.

    ``ent_*``: flat entry arrays sorted by chunk (padded to a static length
    with rows == row_cap so the pad scatters nothing).
    """
    n_chunks = chunk_offs.shape[0] - 1
    prec = _precision(precision)

    def chunk_body(c, acc):
        start = chunk_offs[c]
        cnt = chunk_offs[c + 1] - start
        pos = jax.lax.broadcasted_iota(jnp.int32, (max_ent, 1), 0).squeeze(-1)
        idx = jnp.minimum(start + pos, ent_row.shape[0] - 1)
        valid = pos < cnt
        r = jnp.where(valid, ent_row[idx], row_cap)  # OOB row -> dropped
        lc = jnp.where(valid, ent_col[idx], 0)
        v = jnp.where(valid, ent_val[idx], 0.0)
        slab = jnp.zeros((row_cap, chunk_dim), jnp.float32)
        slab = slab.at[r, lc].add(v, mode="drop", unique_indices=True)
        q = jax.lax.dynamic_slice(slab, (q0, 0), (super_tile, chunk_dim))
        return acc + jax.lax.dot_general(
            slab, q,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    s = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        jnp.zeros((row_cap, super_tile), jnp.float32),
    )
    s = jax.lax.optimization_barrier(s)
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cols = q0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    m = (s >= tau_eff) & (rows < cols)
    buf_i = jnp.full((2 * cap,), -1, jnp.int32)
    buf_j = jnp.full((2 * cap,), -1, jnp.int32)
    buf_i, buf_j, _, total, groups = _extract(
        m, q0, buf_i, buf_j, jnp.int32(0), cap, group
    )
    return (buf_i, buf_j), _pack_head(buf_i, buf_j, total, groups, HEAD_JOIN)


@functools.partial(
    jax.jit,
    static_argnames=(
        "row_cap", "chunk_dim", "max_ent", "q_rows_cap", "q_max_ent", "k",
        "precision",
    ),
)
def chunked_topk(
    ent_row, ent_col, ent_val, chunk_offs,
    q_row, q_col, q_val, q_offs, n_rows,
    row_cap: int, chunk_dim: int, max_ent: int, q_rows_cap: int,
    q_max_ent: int, k: int, precision: str = "default",
):
    """Top-k over chunked entries: both the index AND the queries arrive as
    chunk-sorted COO (queries go through the same ``sort_entries_by_chunk``),
    so neither side ever materializes its full dense width.  Returns
    (scores [q_rows_cap, k], index row ids [q_rows_cap, k])."""
    from .score import _precision

    n_chunks = chunk_offs.shape[0] - 1
    prec = _precision(precision)

    def densify(rows_a, cols_a, vals_a, offs_a, cap_rows, ment, c):
        start = offs_a[c]
        cnt = offs_a[c + 1] - start
        pos = jax.lax.broadcasted_iota(jnp.int32, (ment, 1), 0).squeeze(-1)
        idx = jnp.minimum(start + pos, rows_a.shape[0] - 1)
        valid = pos < cnt
        r = jnp.where(valid, rows_a[idx], cap_rows)
        lc = jnp.where(valid, cols_a[idx], 0)
        v = jnp.where(valid, vals_a[idx], 0.0)
        slab = jnp.zeros((cap_rows, chunk_dim), jnp.float32)
        return slab.at[r, lc].add(v, mode="drop", unique_indices=True)

    def chunk_body(c, acc):
        slab = densify(ent_row, ent_col, ent_val, chunk_offs, row_cap,
                       max_ent, c)
        qslab = densify(q_row, q_col, q_val, q_offs, q_rows_cap,
                        q_max_ent, c)
        return acc + jax.lax.dot_general(
            qslab, slab,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    s = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        jnp.zeros((q_rows_cap, row_cap), jnp.float32),
    )
    s = jax.lax.optimization_barrier(s)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col_ids < n_rows, s, -jnp.inf)
    return jax.lax.top_k(s, k)