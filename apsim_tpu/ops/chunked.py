"""Chunked-sparse scoring: exact joins without a resident dense index.

The dense engine materializes ``X [rows, dim_cap]`` (HBM ceiling ≈ 130k rows
at Enron-like vocabularies).  This mode keeps the index as flat COO entry
arrays sorted by dim-chunk and densifies ONE ``[row_cap, C]`` slab at a time
inside the join loop:

    S_tile = Σ_c  slab_c @ slab_c[q0:q0+tile]ᵀ

Memory: ``O(nnz + rows·C + rows·tile)`` — about 5 GB at 1M rows — instead of
``O(rows · dims)``.

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

from .score import _extract

__all__ = ["sort_entries_by_chunk", "allpairs_chunked_extract"]


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
        "row_cap", "chunk_dim", "max_ent", "tile", "cap", "group",
        "precision",
    ),
)
def allpairs_chunked_extract(
    ent_row, ent_col, ent_val, chunk_offs, tau_eff,
    row_cap: int, chunk_dim: int, max_ent: int, tile: int, cap: int,
    group: int = 8, precision: str = "default",
):
    """Upper-triangle all-pairs over chunked COO entries, ONE device call.

    ``ent_*``: flat entry arrays sorted by chunk (padded to a static length
    with rows == row_cap so the pad scatters nothing).  ``chunk_offs``
    int32 [n_chunks + 1].  Returns ((buf_i, buf_j), count, max_groups) —
    the same contract as ``score.allpairs_extract``.
    """
    from .score import _precision

    n_chunks = chunk_offs.shape[0] - 1
    n_tiles = row_cap // tile
    prec = _precision(precision)

    def densify_chunk(c):
        start = chunk_offs[c]
        cnt = chunk_offs[c + 1] - start
        # static-size gather window with masking (max_ent is a pow2 bucket)
        idx = start + jax.lax.broadcasted_iota(jnp.int32, (max_ent, 1), 0).squeeze(-1)
        idx = jnp.minimum(idx, ent_row.shape[0] - 1)
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (max_ent, 1), 0).squeeze(-1)
            < cnt
        )
        r = jnp.where(valid, ent_row[idx], row_cap)  # OOB row -> dropped
        lc = jnp.where(valid, ent_col[idx], 0)
        v = jnp.where(valid, ent_val[idx], 0.0)
        slab = jnp.zeros((row_cap, chunk_dim), jnp.float32)
        return slab.at[r, lc].add(v, mode="drop", unique_indices=True)

    def tile_body(t, carry):
        buf_i, buf_j, cursor, max_groups = carry
        q0 = t * tile

        def chunk_body(c, acc):
            slab = densify_chunk(c)
            q = jax.lax.dynamic_slice(slab, (q0, 0), (tile, chunk_dim))
            return acc + jax.lax.dot_general(
                slab, q,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )

        s = jax.lax.fori_loop(
            0, n_chunks, chunk_body, jnp.zeros((row_cap, tile), jnp.float32)
        )
        s = jax.lax.optimization_barrier(s)
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = q0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        m = (s >= tau_eff) & (rows < cols)
        buf_i, buf_j, cursor, _, groups = _extract(
            m, q0, buf_i, buf_j, cursor, cap, group
        )
        return buf_i, buf_j, cursor, jnp.maximum(max_groups, groups)

    init = (
        jnp.full((2 * cap,), -1, jnp.int32),
        jnp.full((2 * cap,), -1, jnp.int32),
        jnp.int32(0),
        jnp.int32(0),
    )
    bi, bj, count, groups = jax.lax.fori_loop(0, n_tiles, tile_body, init)
    return (bi, bj), count, groups
