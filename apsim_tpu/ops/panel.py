"""Block-panel Pallas join for the out-of-core engine.

The round-2 chunked join scored one ``[row_cap, super_tile]`` stripe per
device call with XLA slab matmuls — 9.4 s at 100k rows, ~5× off the dense
Pallas rate, because XLA never hits the native int8 MXU path and the fp32
stripe accumulator lives in HBM.  This module applies the dense kernel's
recipe (``ops/pallas_score.py``: int8 MXU dot + per-pair quantization bound
+ bit-packed epilogue, all fused in VMEM) to the out-of-core layout:

  1. entries are flattened from the per-chunk buffers and SORTED BY ROW once
     per join (``sort_entries_by_row``, cached across calls) — panel slices
     become contiguous, so densifying a row panel touches only that panel's
     entries instead of scanning the whole corpus per stripe;
  2. each ``rb``-row panel is densified into an int8 slab ``[rb, d_cap]``
     (``build_panel_slab`` — one bounded scatter-set);
  3. every panel pair (I ≤ J) runs ``_kernel_int8_cross`` over its
     ``[rb × rb]`` rectangle: int8 dot tiles on the MXU, rescale + per-pair
     quantization bound + GLOBAL-coordinate strict-upper-triangle mask +
     bit-pack, score tile never leaving VMEM; the three-level compaction
     (``pallas_score._compact_bits``) then emits global (row, col) pairs
     directly (panel offsets folded into the block ids).

Exactness contract is unchanged: the quantization bound makes the candidate
set a PROVEN superset at ``tau_eff`` (same proof as the dense int8 kernel,
``ops/pallas_score.py:335-350``), and the host fp64 rescore decides the
final pair set.

Memory: ``O(nnz)`` for the sorted COO + 1-2 resident slabs (``rb · d_cap``
int8) + the per-pair bit-packed structure — no ``[row_cap, stripe]`` fp32
accumulator in HBM.

Replaces the hot loop of the reference's IndexingWorkerActor.scala:74-111
at beyond-HBM corpus sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_score import (
    GROUP, SUPER, _compact_bits, bitpack_mask, check_tiles,
    upper_blocks_rect,
)

__all__ = [
    "sort_entries_by_row",
    "build_panel_slab",
    "panel_pair_extract_int8",
    "full_grid",
    "diag_grid",
    "int8_bound_mask",
]


def int8_bound_mask(d, auxi, auxj, rows, cols, tau_eff):
    """Quantization-bound admit mask over one int32 score rectangle.

    ``d`` is the raw int8-dot block, ``auxi``/``auxj`` the ``[3, m]`` /
    ``[3, n]`` per-row (α, α·L1(q), nnz) tables, ``rows``/``cols`` the
    GLOBAL coordinates of each cell.  Admits exactly the cells whose
    dequantized score plus the proven per-pair error bound reaches
    ``tau_eff``, restricted to the strict upper triangle (bound proof:
    ``ops/pallas_score.py:335-350``).

    This is THE definition of the bound epilogue: the Mosaic cross kernel
    (``_kernel_int8_cross``), its XLA reference
    (``panel_score_bits_int8_ref``) and the mesh panel-pair epilogue
    (``ops/panel_mesh.mesh_panel_pair``) all call it, so a bound or margin
    change cannot silently diverge between deployments."""
    ai = auxi[0][:, None]    # α_i  [m, 1]
    bi_b = auxi[1][:, None]  # α_i·L1(q_i)
    ci = auxi[2][:, None]    # nnz_i
    aj = auxj[0][None, :]
    bj_b = auxj[1][None, :]
    cj = auxj[2][None, :]
    s_hat = d.astype(jnp.float32) * (ai * aj)
    bound = (
        0.5 * (aj * bi_b + ai * bj_b)
        + 0.25 * (ai * aj) * jnp.minimum(ci, cj)
    )
    return ((s_hat + bound) >= tau_eff) & (rows < cols)


def full_grid(rb_i: int, rb_j: int, tm: int, tn: int):
    """All (bi, bj) tiles of an off-diagonal panel rectangle (every global
    pair there satisfies row < col, so every tile is live)."""
    bi, bj = np.meshgrid(
        np.arange(rb_i // tm), np.arange(rb_j // tn), indexing="ij"
    )
    return bi.reshape(-1).astype(np.int32), bj.reshape(-1).astype(np.int32)


def diag_grid(rb: int, tm: int, tn: int):
    """Tiles of a diagonal panel pair that contain some strict-upper pair —
    exactly the dense kernel's schedule, so the subtle strict-upper edge
    has ONE definition."""
    return upper_blocks_rect(rb, tm, tn)


@functools.partial(jax.jit, static_argnames=("rb", "n_panels"))
def sort_entries_by_row(rows2d, cols2d, q2d, counts, rb: int, n_panels: int):
    """Row-sorted flat COO from the per-chunk entry buffers.

    Returns ``(rows_s, gcols_s, q_s, panel_counts)``: entries sorted by
    global row (padding slots carry row = 2^30 and sort to the tail),
    columns mapped back from (chunk, local) to GLOBAL compact ids
    (``global = local · n_chunks + chunk`` — the interleaved assignment of
    ``chunked.split_chunks`` inverted), values int8-quantized, and the
    int32 per-panel entry counts (tail bucket = padding).
    """
    n_chunks, cap = rows2d.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (n_chunks, cap), 1)
    valid = pos < counts[:, None]
    r = jnp.where(valid, rows2d, 1 << 30).reshape(-1)
    chunk_of = jax.lax.broadcasted_iota(jnp.int32, (n_chunks, cap), 0)
    gc = (cols2d * n_chunks + chunk_of).reshape(-1)
    order = jnp.argsort(r)
    r_s = r[order]
    gc_s = gc[order]
    q_s = q2d.reshape(-1)[order]
    pan = jnp.minimum(r_s // rb, n_panels).astype(jnp.int32)
    pcounts = jnp.zeros((n_panels + 1,), jnp.int32).at[pan].add(1)
    return r_s, gc_s, q_s, pcounts


@functools.partial(jax.jit, static_argnames=("rb", "d_cap", "p_cap"))
def build_panel_slab(r_s, gc_s, q_s, start, row0, rb: int, d_cap: int,
                     p_cap: int):
    """Densify one row panel: int8 slab ``[rb, d_cap]`` from the sorted COO
    slice at ``start``.  Membership is decided by ROW RANGE, not slice
    position, so ``dynamic_slice``'s start-clamping near the array tail is
    harmless (the clamped window still contains the whole panel slice, and
    out-of-range rows scatter-drop)."""
    r = jax.lax.dynamic_slice(r_s, (start,), (p_cap,))
    g = jax.lax.dynamic_slice(gc_s, (start,), (p_cap,))
    q = jax.lax.dynamic_slice(q_s, (start,), (p_cap,))
    ok = (r >= row0) & (r < row0 + rb)
    rl = jnp.where(ok, r - row0, rb)  # OOB row -> dropped by the scatter
    g = jnp.where(ok, g, 0)
    q = jnp.where(ok, q, 0)
    slab = jnp.zeros((rb, d_cap), jnp.int8)
    return slab.at[rl, g].set(q, mode="drop", unique_indices=True)


def _kernel_int8_cross(bi_ref, bj_ref, valid_ref, off_ref, tau_ref, x_ref,
                       q_ref, auxi_ref, auxj_ref, gb_ref, g64_ref, cnt_ref,
                       acc_ref):
    """Cross-panel int8 tile: same epilogue as the dense kernel
    (``pallas_score._kernel_int8``) except rows/cols are offset by the
    panels' global row origins (``off_ref = [row0_I, row0_J]``) so the
    strict-upper-triangle mask and the emitted counts are global-exact.
    ``valid_ref[p] == 0`` blanks a block entirely — shard_map callers pad
    per-device schedules to a common length with such blocks."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == nk - 1)
    def _():
        p = pl.program_id(0)
        tm, tn = acc_ref.shape
        rows = off_ref[0] + bi_ref[p] * tm + jax.lax.broadcasted_iota(
            jnp.int32, (tm, tn), 0
        )
        cols = off_ref[1] + bj_ref[p] * tn + jax.lax.broadcasted_iota(
            jnp.int32, (tm, tn), 1
        )
        m = int8_bound_mask(
            acc_ref[:], auxi_ref[:], auxj_ref[:], rows, cols, tau_ref[0]
        )
        mi = m.astype(jnp.int32) * valid_ref[p]
        gbi, g_any, g64i = bitpack_mask(mi)
        gb_ref[0] = gbi.astype(jnp.uint8)
        g64_ref[0] = g64i.astype(jnp.uint8)
        n_pairs = jnp.sum(mi)
        n_groups = jnp.sum(g_any)
        n_supers = jnp.sum(g64i)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
        cnt_ref[...] = jnp.where(
            lane == 0,
            n_pairs,
            jnp.where(lane == 1, n_groups, jnp.where(lane == 2, n_supers, 0)),
        )


def panel_score_bits_int8_ref(
    xi, xj, auxi, auxj, bi, bj, off, tau_eff,
    tm: int, tn: int, valid=None,
):
    """Pure-XLA reference of the cross kernel (same gb/g64/cnt contract).

    Used off-TPU under ``shard_map`` — the Mosaic TPU interpreter inside a
    multi-device shard_map program effectively hangs on the CPU backend, so
    mesh tests exercise the shard_map plumbing (schedules, gather, offsets,
    compaction) against this emulation while the kernel itself is covered
    by the single-device interpret tests."""
    n_blocks = bi.shape[0]
    if valid is None:
        valid = jnp.ones((n_blocks,), jnp.int32)
    s_full = jax.lax.dot_general(
        xi, xj,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    def one_block(b_i, b_j, v):
        d = jax.lax.dynamic_slice(s_full, (b_i * tm, b_j * tn), (tm, tn))
        ai = jax.lax.dynamic_slice(auxi, (0, b_i * tm), (3, tm))
        aj = jax.lax.dynamic_slice(auxj, (0, b_j * tn), (3, tn))
        rows = off[0] + b_i * tm + jax.lax.broadcasted_iota(
            jnp.int32, (tm, tn), 0
        )
        cols = off[1] + b_j * tn + jax.lax.broadcasted_iota(
            jnp.int32, (tm, tn), 1
        )
        mi = int8_bound_mask(d, ai, aj, rows, cols, tau_eff).astype(
            jnp.int32
        ) * v
        gbi, g_any, g64i = bitpack_mask(mi)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        cnt = jnp.where(
            lane == 0,
            jnp.sum(mi),
            jnp.where(
                lane == 1, jnp.sum(g_any), jnp.where(lane == 2, jnp.sum(g64i), 0)
            ),
        )
        return gbi.astype(jnp.uint8), g64i.astype(jnp.uint8), cnt

    return jax.vmap(one_block)(bi, bj, valid)


@functools.partial(
    jax.jit, static_argnames=("tm", "tn", "tk", "interpret")
)
def panel_score_bits_int8(
    xi, xj, auxi, auxj, bi, bj, off, tau_eff,
    tm: int, tn: int, tk: int, interpret: bool = False, valid=None,
):
    """Run the cross kernel over one panel pair's tile schedule."""
    check_tiles(xi.shape[0], xj.shape[0], xi.shape[1], tm, tn, tk)
    n_blocks = bi.shape[0]
    nk = xi.shape[1] // tk
    tau_arr = jnp.full((1,), tau_eff, jnp.float32)
    if valid is None:
        valid = jnp.ones((n_blocks,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # bi, bj, valid, off, tau
        grid=(n_blocks, nk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda p, k, bi_r, *_: (bi_r[p], k)),
            pl.BlockSpec(
                (tn, tk), lambda p, k, bi_r, bj_r, *_: (bj_r[p], k)
            ),
            pl.BlockSpec((3, tm), lambda p, k, bi_r, *_: (0, bi_r[p])),
            pl.BlockSpec(
                (3, tn), lambda p, k, bi_r, bj_r, *_: (0, bj_r[p])
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, tm // GROUP, tn), lambda p, k, *_: (p, 0, 0)),
            pl.BlockSpec((1, tm // SUPER, tn), lambda p, k, *_: (p, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda p, k, *_: (p, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
    )
    return pl.pallas_call(
        _kernel_int8_cross,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, tm // GROUP, tn), jnp.uint8),
            jax.ShapeDtypeStruct((n_blocks, tm // SUPER, tn), jnp.uint8),
            jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.int32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(bi, bj, valid, off, tau_arr, xi, xj, auxi, auxj)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tm", "tn", "tk", "cap", "capb", "cap0", "interpret", "pack_head"
    ),
)
def panel_pair_extract_int8(
    xi, xj, auxi, auxj, bi, bj, row0, col0, tau_eff,
    cap: int, capb: int, cap0: int,
    tm: int, tn: int, tk: int, interpret: bool = False,
    pack_head: bool = False,
):
    """One panel pair end-to-end: cross kernel + three-level compaction.

    ``row0``/``col0`` are the panels' global row origins (both multiples of
    the tile sizes); block ids are globalized before compaction so the
    emitted (row, col) pairs are global — no host-side offsetting.
    Returns ``((rows, cols), packed_head)`` with the dense-kernel head
    layout (``pallas_score.unpack_pallas_head``).
    """
    off = jnp.stack(
        [row0.astype(jnp.int32), col0.astype(jnp.int32)]
    )
    gb, g64, cnt = panel_score_bits_int8(
        xi, xj, auxi, auxj, bi, bj, off, tau_eff, tm, tn, tk, interpret
    )
    bi_g = bi + (row0 // tm).astype(jnp.int32)
    bj_g = bj + (col0 // tn).astype(jnp.int32)
    return _compact_bits(
        gb, g64, cnt, bi_g, bj_g, cap, capb, cap0, tm, tn, pack_head
    )
