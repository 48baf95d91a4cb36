"""Pallas TPU kernel for the all-pairs hot op.

The XLA path (``ops/score.py``) scores the full ``row_cap × row_cap``
rectangle tile-by-tile and filters the lower triangle afterwards.  This
kernel iterates ONLY the upper-triangle block pairs — their (bi, bj) indices
are scalar-prefetched so the BlockSpec index maps can follow a data-driven
schedule (``pltpu.PrefetchScalarGridSpec``) — which halves both MXU work and
HBM traffic, and fuses threshold + triangle mask + BIT-PACKING into the
matmul epilogue so the fp32 score tile never leaves VMEM.

Outputs per block p (bi[p], bj[p]):
  gb   [n_blocks, TM/8, TN]  uint8 — bit-packed hits: byte (g, c) holds the
                                     8 rows of group g at column c (bit o =
                                     row g*8+o).  8× less HBM than the uint8
                                     mask the round-1 kernel wrote.
  g64  [n_blocks, TM/64, TN] uint8 — super-group (64-row) any-hit, the
                                     level-0 structure for compaction
  cnt  [n_blocks, 8, 128]    int32 — lanes 0..2 = (pairs, hit groups, hit
                                     super-groups) of this block, so exact
                                     totals cost no extra device pass

``allpairs_extract_pallas`` wraps the kernel with a THREE-level compaction
(supers → group bytes → bits) whose ``jnp.nonzero`` domains are sized by the
*previous* level's cap instead of the raw mask: the round-1 two-level scheme
ran one nonzero over mask/8 ≈ row_cap²/16 elements (~9 ns/element on v5e ⇒
52 ms on Enron); the three-level scheme's largest domain is
``n_blocks·TM/64·TN`` (≈ row_cap²/128), ~8× smaller, and the deeper levels
scale with the candidate caps, not the corpus.

Each level has its own capacity (cap0 ≥ #hit supers, capb ≥ #hit groups,
cap ≥ #pairs); the packed head returns all three true counts so the caller
can retry with exact sizes (and cache them across calls).

Runs in interpreter mode off-TPU (CPU tests).

Replaces the reference's querySimilarItems posting walk + per-pair HashMap
dot (IndexingWorkerActor.scala:74-111, CommonUtils.scala:98-117).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .score import capb_for

__all__ = [
    "upper_blocks_rect",
    "check_tiles",
    "pallas_score_bits",
    "allpairs_extract_pallas",
    "unpack_pallas_head",
    "GROUP",
    "SUPER",
]

GROUP = 8  # rows per bit-packed byte (fixed: the uint8 width)
SUPER = 64  # rows per level-0 super-group (8 group bytes)
SUPER2 = 512  # rows per pre-level cell (XLA-reduced from g64 at compaction
              # time — not a kernel output; see _compact_bits)

HEAD_PALLAS = 32768  # pairs carried inline in the packed head (one fetch)


def check_tiles(rows_i: int, rows_j: int, dim: int, tm: int, tn: int,
                tk: int) -> None:
    """Reject silently-floored kernel grids.  The grid computes
    ``rows // tm`` etc., so a non-multiple operand would silently drop the
    trailing rows/columns from a "lossless" join (score.py raises for the
    analogous ``row_cap % tile`` case; the engine's geometry pickers always
    pass aligned shapes — this guards every OTHER caller)."""
    if rows_i % tm or rows_j % tn or dim % tk:
        raise ValueError(
            f"kernel tiles must divide operands exactly: "
            f"rows {rows_i} % tm {tm}, cols {rows_j} % tn {tn}, "
            f"dim {dim} % tk {tk}"
        )


def upper_blocks_rect(
    row_cap: int, tm: int, tn: int
) -> tuple[np.ndarray, np.ndarray]:
    """Block schedule for rectangular tiles: include (bi, bj) iff the block
    contains some strict-upper pair (min_row < max_col).  Asymmetric tiles
    (tm > tn) cut blocked operand re-reads — traffic ∝ (tm+tn)/(tm·tn)."""
    n_ti, n_tj = row_cap // tm, row_cap // tn
    bi, bj = np.meshgrid(np.arange(n_ti), np.arange(n_tj), indexing="ij")
    keep = (bi * tm) < ((bj + 1) * tn - 1)
    return bi[keep].astype(np.int32), bj[keep].astype(np.int32)


def bitpack_mask(mi):
    """Shared bit-pack hierarchy over an int32 0/1 hit mask ``mi [tm, tn]``:
    returns ``(gbi, g_any, g64i)`` — group bytes (bit o = row g·GROUP+o),
    group any-hit, and 64-row super any-hit, all int32.  Used by both Pallas
    kernel epilogues AND the XLA chunked stripe epilogue
    (``ops/chunked.py:join_epilogue_bits``) so the packing layout has one
    definition."""
    tm, tn = mi.shape
    w = jnp.left_shift(
        1,
        jax.lax.broadcasted_iota(jnp.int32, (tm // GROUP, GROUP, tn), 1),
    )
    gbi = jnp.sum(mi.reshape(tm // GROUP, GROUP, tn) * w, axis=1)
    g_any = jnp.minimum(gbi, 1)
    g64i = jnp.minimum(
        jnp.sum(g_any.reshape(tm // SUPER, SUPER // GROUP, tn), axis=1), 1
    )
    return gbi, g_any, g64i


def _kernel(bi_ref, bj_ref, tau_ref, x_ref, q_ref, gb_ref, g64_ref, cnt_ref,
            acc_ref):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        p = pl.program_id(0)
        tm, tn = acc_ref.shape
        m = acc_ref[:] >= tau_ref[0]
        # strict upper triangle in GLOBAL coordinates (supports asymmetric
        # tiles where diagonal-block identity is not bi == bj)
        rows = bi_ref[p] * tm + jax.lax.broadcasted_iota(
            jnp.int32, (tm, tn), 0
        )
        cols = bj_ref[p] * tn + jax.lax.broadcasted_iota(
            jnp.int32, (tm, tn), 1
        )
        # arithmetic masking throughout: i1-vector relayouts can fail to
        # compile in Mosaic (observed on v5e), so hits become int32 0/1
        mi = (m & (rows < cols)).astype(jnp.int32)  # [tm, tn]
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


@functools.partial(
    jax.jit, static_argnames=("tm", "tn", "tk", "interpret")
)
def pallas_score_bits(
    x, bi, bj, tau_eff, tm: int = 1024, tn: int = 512, tk: int = 1024,
    interpret: bool = False,
):
    """Run the kernel: (gb, g64, cnt) bit-packed hit structure per block."""
    row_cap, dim_cap = x.shape
    check_tiles(row_cap, row_cap, dim_cap, tm, tn, tk)
    n_blocks = bi.shape[0]
    nk = dim_cap // tk
    tau_arr = jnp.full((1,), tau_eff, jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # bi, bj, tau
        grid=(n_blocks, nk),
        in_specs=[
            pl.BlockSpec(
                (tm, tk),
                lambda p, k, bi_r, bj_r, tau_r: (bi_r[p], k),
            ),
            pl.BlockSpec(
                (tn, tk),
                lambda p, k, bi_r, bj_r, tau_r: (bj_r[p], k),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, tm // GROUP, tn), lambda p, k, *_: (p, 0, 0)),
            pl.BlockSpec((1, tm // SUPER, tn), lambda p, k, *_: (p, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda p, k, *_: (p, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, tm // GROUP, tn), jnp.uint8),
            jax.ShapeDtypeStruct((n_blocks, tm // SUPER, tn), jnp.uint8),
            jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.int32),
        ],
        # off-TPU use the TPU interpreter (emulates scalar prefetch etc.)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(bi, bj, tau_arr, x, x)


def _pack_pallas_head(row, col, total, groups, supers, pack_u32: bool):
    """Result head: first h pairs + (total, groups, supers) counts.

    ``pack_u32=True`` (any corpus with row_cap ≤ 65536, i.e. everything the
    dense engine can hold short of its ceiling) packs each pair into ONE
    int32 as ``row << 16 | col`` — halving the head bytes, which matters
    because the D2H link here moves ~55 MB/s after a ~28 ms fixed round
    trip.  The trailing flag word records the layout so the host can decode
    either format."""
    h = min(HEAD_PALLAS, row.shape[0])
    tail = [
        total.reshape(1).astype(jnp.int32),
        groups.reshape(1).astype(jnp.int32),
        supers.reshape(1).astype(jnp.int32),
        jnp.full((1,), int(pack_u32), jnp.int32),
    ]
    if pack_u32:
        # sentinel (-1, -1) slots become 0xFFFFFFFF -> decoded as (65535,
        # 65535), but decode only reads the first `total` slots anyway
        packed = jnp.left_shift(row[:h], 16) | (col[:h] & 0xFFFF)
        return jnp.concatenate([packed] + tail)
    return jnp.concatenate([row[:h], col[:h]] + tail)


def unpack_pallas_head(packed: np.ndarray):
    """(rows_head, cols_head, total, groups, supers) from a fetched head;
    the layout flag in the last word selects u32-packed vs two-array."""
    total = int(packed[-4])
    if total >= 2**31 - 1:
        raise ValueError(
            "join produced >= 2^31 candidate pairs (saturated counter); "
            "raise the threshold — fetching/rescoring that many pairs is "
            "beyond the engine's design envelope"
        )
    groups = int(packed[-3])
    supers = int(packed[-2])
    if int(packed[-1]):  # u32-packed pairs
        h = packed.shape[0] - 4
        k = min(total, h)
        u = packed[:k].view(np.uint32)
        return (
            (u >> 16).astype(np.int64),
            (u & 0xFFFF).astype(np.int64),
            total,
            groups,
            supers,
        )
    h = (packed.shape[0] - 4) // 2
    k = min(total, h)
    return (
        packed[:k].astype(np.int64),
        packed[h : h + k].astype(np.int64),
        total,
        groups,
        supers,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "tm", "tn", "tk", "cap", "capb", "cap0", "interpret", "pack_head"
    ),
)
def allpairs_extract_pallas(
    x, bi, bj, tau_eff, cap: int, capb: int = 0, cap0: int = 0,
    tm: int = 1024, tn: int = 512, tk: int = 1024, interpret: bool = False,
    pack_head: bool = False,
):
    """Upper-triangle all-pairs: ((row, col), packed_head).

    Three-level compaction over the kernel's bit-packed structure; each
    level's nonzero domain is bounded by the previous level's cap, so the
    only corpus-sized scan is level 0 (row_cap²/(tm·tn)·(tm/64)·tn =
    row_cap²/64 bits ≈ row_cap²/128 elements).

    Operands are read in bfloat16 (measured 2.7× faster than fp32 tiles —
    the kernel is HBM-bound; the MXU's DEFAULT pass rounds inputs to bf16
    anyway, so the engine's error margin already covers this).

    Overflow contract: the packed head carries the TRUE (pairs, groups,
    supers) counts; the caller retries with larger caps when any exceeds its
    capacity (entries past a cap are dropped, counts stay exact).
    """
    capb = capb or capb_for(cap, GROUP)
    cap0 = cap0 or capb  # generous default: cap0 only sizes the level-1
    # gather domain (cap0 x 8 elements); undersizing it costs a whole
    # overflow-retry executable on the first cold call
    gb, g64, cnt = pallas_score_bits(
        x.astype(jnp.bfloat16), bi, bj, tau_eff, tm, tn, tk, interpret
    )
    return _compact_bits(
        gb, g64, cnt, bi, bj, cap, capb, cap0, tm, tn, pack_head
    )


def _sat_count_sum(v):
    """Saturating int32 sum of per-block hit counts.  A plain jnp.sum wraps
    past 2^31 (each block count is < 2^20, but a 131k-row low-tau join can
    total 2^34), and a wrapped NEGATIVE total passes the caller's overflow
    check and silently truncates the result — the same bug class
    score.py's cursor saturation guards against.  The fp32 shadow sum is
    only used as a > 2^30 detector (its ~1e-7 relative error is far below
    the 2x headroom to the wrap point), so totals ≤ 2^30 stay exact."""
    exact = jnp.sum(v)
    approx = jnp.sum(v.astype(jnp.float32))
    return jnp.where(
        approx > jnp.float32(2**30), jnp.int32(2**31 - 1), exact
    )


def _compact_bits(gb, g64, cnt, bi, bj, cap, capb, cap0, tm, tn,
                  pack_head: bool = False):
    n_blocks = bi.shape[0]
    total = _sat_count_sum(cnt[:, 0, 0])
    groups = _sat_count_sum(cnt[:, 0, 1])
    supers = _sat_count_sum(cnt[:, 0, 2])
    # ---- level 0: hit super-groups (64 rows) over the whole structure
    per0 = (tm // SUPER) * tn
    if (tm // SUPER) % (SUPER2 // SUPER) == 0:
        # pre-level: reduce g64 to 512-row any-hit cells first.  The
        # reduce is bandwidth-cheap (one pass over g64), while jnp.nonzero
        # costs ~9 ns/element — so scanning the 8× smaller g512 domain and
        # gathering the g64 bytes under its hits (≤ cap0 of them: hit-512s
        # ≤ hit supers, so cap0 bounds both and the overflow contract is
        # unchanged) removes the largest corpus-sized scan.  At 100k rows
        # the level-0 scan was ~0.9 s of the 2.3 s panel join; at 500k it
        # would have been ~19 s.
        r8 = SUPER2 // SUPER
        per00 = (tm // SUPER2) * tn
        g512 = jnp.max(
            g64.reshape(n_blocks, tm // SUPER2, r8, tn), axis=2
        )
        (b00,) = jnp.nonzero(
            (g512 != 0).reshape(-1), size=cap0,
            fill_value=n_blocks * per00,
        )
        v00 = b00 < n_blocks * per00
        b00c = jnp.where(v00, b00, 0)
        p00 = (b00c // per00).astype(jnp.int32)
        rem00 = b00c % per00
        s00 = (rem00 // tn).astype(jnp.int32)
        c00 = (rem00 % tn).astype(jnp.int32)
        bytes00 = g64.reshape(n_blocks, tm // SUPER2, r8, tn)[
            p00, s00, :, c00
        ]  # [cap0, r8]
        bytes00 = jnp.where(v00[:, None], bytes00, 0)
        (f0,) = jnp.nonzero(
            (bytes00 != 0).reshape(-1), size=cap0, fill_value=cap0 * r8
        )
        v0 = f0 < cap0 * r8
        f0c = jnp.where(v0, f0, 0)
        slot00 = (f0c // r8).astype(jnp.int32)
        o00 = (f0c % r8).astype(jnp.int32)
        p0 = p00[slot00]
        s0 = s00[slot00] * r8 + o00  # super index within block
        c0 = c00[slot00]  # column within block
    else:
        (b0,) = jnp.nonzero(
            (g64 != 0).reshape(-1), size=cap0, fill_value=n_blocks * per0
        )
        v0 = b0 < n_blocks * per0
        b0c = jnp.where(v0, b0, 0)
        p0 = (b0c // per0).astype(jnp.int32)
        rem0 = b0c % per0
        s0 = (rem0 // tn).astype(jnp.int32)  # super index within block
        c0 = (rem0 % tn).astype(jnp.int32)  # column within block
    # ---- level 1: hit group bytes within each hit super (8 bytes each)
    gb4 = gb.reshape(n_blocks, tm // SUPER, SUPER // GROUP, tn)
    bytes0 = gb4[p0, s0, :, c0]  # [cap0, 8] uint8
    bytes0 = jnp.where(v0[:, None], bytes0, 0)
    (f1,) = jnp.nonzero(
        (bytes0 != 0).reshape(-1), size=capb,
        fill_value=cap0 * (SUPER // GROUP),
    )
    v1 = f1 < cap0 * (SUPER // GROUP)
    f1c = jnp.where(v1, f1, 0)
    slot1 = (f1c // (SUPER // GROUP)).astype(jnp.int32)
    o1 = (f1c % (SUPER // GROUP)).astype(jnp.int32)
    byte1 = bytes0.reshape(-1)[f1c].astype(jnp.int32)
    byte1 = jnp.where(v1, byte1, 0)
    # ---- level 2: hit bits (rows) within each hit group byte
    bits = (byte1[:, None] >> jnp.arange(GROUP, dtype=jnp.int32)[None, :]) & 1
    (f2,) = jnp.nonzero(
        bits.reshape(-1) != 0, size=cap, fill_value=capb * GROUP
    )
    v2 = f2 < capb * GROUP
    f2c = jnp.where(v2, f2, 0)
    slot2 = (f2c // GROUP).astype(jnp.int32)
    o2 = (f2c % GROUP).astype(jnp.int32)
    sl = slot1[slot2]
    g = s0[sl] * (SUPER // GROUP) + o1[slot2]  # group index within block
    P = p0[sl]
    row = bi[P] * tm + g * GROUP + o2
    col = bj[P] * tn + c0[sl]
    row = jnp.where(v2, row, -1).astype(jnp.int32)
    col = jnp.where(v2, col, -1).astype(jnp.int32)
    return (row, col), _pack_pallas_head(
        row, col, total, groups, supers, pack_head
    )


# --------------------------------------------------------------- int8 kernel
#
# Per-row symmetric quantization x_i = α_i (q_i + e_i), α_i = max|x_i|/127,
# q int8, |e| ≤ 0.5 and e = 0 off-support.  The MXU runs the q·qᵀ products at
# int8 (2× bf16 throughput, half the operand DMA bytes); the epilogue rescales
# and thresholds with a PER-PAIR quantization-error upper bound
#
#   |x_i·x_j − α_iα_j D| ≤ 0.5(α_j b_i + α_i b_j) + 0.25 α_iα_j min(n_i, n_j)
#
# where D = Σ q_i q_j (device int32), b_i = α_i L1(q_i), n_i = nnz(x_i) —
# so candidates at ``s_hat + bound ≥ tau_eff`` form a PROVEN superset and the
# host fp64 rescore keeps the emitted pair set exact, same contract as bf16.
# int32 accumulator safety: D ≤ 127·min(L1(q_i), L1(q_j)) ≤ 127²·max_nnz —
# the engine gates this path on max_nnz < 2^30/127² ≈ 66k.


@jax.jit
def quantize_rows(x):
    """(q int8, aux f32 [3, rows]): per-row symmetric int8 quantization with
    the bound ingredients (aux rows: α, α·L1(q), nnz).

    All-zero (padded/invalid) rows get α = 0, which zeroes BOTH their
    rescaled score and their error bound — the epilogue's
    ``s_hat + bound >= tau_eff`` test then excludes them exactly like the
    bf16 path's ``tau_eff > 0`` rule.  (With the earlier α = 1 fallback a
    padded row's bound was ``0.5·α_j·L1(q_j)`` ≈ the partner row's L1 ≫ tau,
    so every padded×real pair leaked through as a "candidate" — on Enron
    that was all 5.4M of them — and their out-of-range row ids crashed the
    host rescore.)"""
    ax = jnp.abs(x)
    s = jnp.max(ax, axis=1)
    alpha = jnp.where(s > 0, s / 127.0, 0.0).astype(jnp.float32)
    div = jnp.where(s > 0, alpha, 1.0)
    q = jnp.clip(
        jnp.round(x / div[:, None]), -127, 127
    ).astype(jnp.int8)
    l1q = jnp.sum(jnp.abs(q).astype(jnp.float32), axis=1)
    nnz = jnp.sum((x != 0).astype(jnp.float32), axis=1)
    aux = jnp.stack([alpha, alpha * l1q, nnz])
    return q, aux


def _kernel_int8(bi_ref, bj_ref, tau_ref, x_ref, q_ref, auxi_ref, auxj_ref,
                 gb_ref, g64_ref, cnt_ref, acc_ref):
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
        ai = auxi_ref[0][:, None]   # α_i  [tm, 1]
        bi_b = auxi_ref[1][:, None]  # α_i·L1(q_i)
        ci = auxi_ref[2][:, None]   # nnz_i
        aj = auxj_ref[0][None, :]
        bj_b = auxj_ref[1][None, :]
        cj = auxj_ref[2][None, :]
        s_hat = acc_ref[:].astype(jnp.float32) * (ai * aj)
        bound = (
            0.5 * (aj * bi_b + ai * bj_b)
            + 0.25 * (ai * aj) * jnp.minimum(ci, cj)
        )
        m = (s_hat + bound) >= tau_ref[0]
        rows = bi_ref[p] * tm + jax.lax.broadcasted_iota(
            jnp.int32, (tm, tn), 0
        )
        cols = bj_ref[p] * tn + jax.lax.broadcasted_iota(
            jnp.int32, (tm, tn), 1
        )
        mi = (m & (rows < cols)).astype(jnp.int32)
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


@functools.partial(
    jax.jit, static_argnames=("tm", "tn", "tk", "interpret")
)
def pallas_score_bits_int8(
    xq, aux, bi, bj, tau_eff, tm: int = 1024, tn: int = 512, tk: int = 2048,
    interpret: bool = False,
):
    row_cap, dim_cap = xq.shape
    check_tiles(row_cap, row_cap, dim_cap, tm, tn, tk)
    n_blocks = bi.shape[0]
    nk = dim_cap // tk
    tau_arr = jnp.full((1,), tau_eff, jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # bi, bj, tau
        grid=(n_blocks, nk),
        in_specs=[
            pl.BlockSpec(
                (tm, tk), lambda p, k, bi_r, bj_r, tau_r: (bi_r[p], k)
            ),
            pl.BlockSpec(
                (tn, tk), lambda p, k, bi_r, bj_r, tau_r: (bj_r[p], k)
            ),
            pl.BlockSpec(
                (3, tm), lambda p, k, bi_r, bj_r, tau_r: (0, bi_r[p])
            ),
            pl.BlockSpec(
                (3, tn), lambda p, k, bi_r, bj_r, tau_r: (0, bj_r[p])
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
        _kernel_int8,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, tm // GROUP, tn), jnp.uint8),
            jax.ShapeDtypeStruct((n_blocks, tm // SUPER, tn), jnp.uint8),
            jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.int32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(bi, bj, tau_arr, xq, xq, aux, aux)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tm", "tn", "tk", "cap", "capb", "cap0", "interpret", "pack_head"
    ),
)
def allpairs_extract_pallas_int8(
    xq, aux, bi, bj, tau_eff, cap: int, capb: int = 0, cap0: int = 0,
    tm: int = 1024, tn: int = 512, tk: int = 2048, interpret: bool = False,
    pack_head: bool = False,
):
    """int8 variant of ``allpairs_extract_pallas``: same ((row, col), head)
    contract, per-pair quantization bound fused into the epilogue."""
    capb = capb or capb_for(cap, GROUP)
    cap0 = cap0 or capb  # generous default: cap0 only sizes the level-1
    # gather domain (cap0 x 8 elements); undersizing it costs a whole
    # overflow-retry executable on the first cold call
    gb, g64, cnt = pallas_score_bits_int8(
        xq, aux, bi, bj, tau_eff, tm, tn, tk, interpret
    )
    return _compact_bits(
        gb, g64, cnt, bi, bj, cap, capb, cap0, tm, tn, pack_head
    )
