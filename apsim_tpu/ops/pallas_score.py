"""Pallas TPU kernel for the all-pairs hot op.

The XLA path (``ops/score.py``) scores the full ``row_cap × row_cap``
rectangle tile-by-tile and filters the lower triangle afterwards.  This
kernel iterates ONLY the upper-triangle block pairs — their (bi, bj) indices
are scalar-prefetched so the BlockSpec index maps can follow a data-driven
schedule (``pltpu.PrefetchScalarGridSpec``) — which halves both MXU work and
HBM traffic, and fuses the threshold + row-group reduction + per-block hit
count into the matmul epilogue so the fp32 score tile never leaves VMEM.

Outputs per block p (bi[p], bj[p]):
  mask   [n_blocks, TM, TN] uint8 — thresholded hits (diagonal blocks also
                                    carry the strict ``row < col`` triangle)
  rga    [n_blocks, TM/8, TN] uint8 — row-group (8) any-hit reduction, the
                                    level-1 structure for compact extraction

``allpairs_extract_pallas`` wraps the kernel with the same two-level XLA
compaction and (bufs, packed_head) contract as
``score.allpairs_extract``, so the engine can switch per config flag.

Runs in interpreter mode off-TPU (CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "upper_blocks",
    "pallas_score_blocks",
    "allpairs_extract_pallas",
]

GROUP = 8  # row-group size of the rga reduction (fixed: fits the extractor)


def upper_blocks(n_tiles: int) -> tuple[np.ndarray, np.ndarray]:
    """(bi, bj) indices of all upper-triangle blocks, diagonal included."""
    bi, bj = np.triu_indices(n_tiles)
    return bi.astype(np.int32), bj.astype(np.int32)


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


def _kernel(bi_ref, bj_ref, tau_ref, x_ref, q_ref, mask_ref, rga_ref,
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
        mask_ref[0] = (m & (rows < cols)).astype(jnp.uint8)

        mm = mask_ref[0]
        # arithmetic any(): min(sum, 1) — a `> 0` compare here produces an i1
        # vector whose relayout Mosaic cannot compile (observed on v5e)
        rga_ref[0] = jnp.minimum(
            jnp.sum(
                mm.reshape(tm // GROUP, GROUP, tn), axis=1, dtype=jnp.int32
            ),
            1,
        ).astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("tm", "tn", "tk", "interpret")
)
def pallas_score_blocks(
    x, bi, bj, tau_eff, tm: int = 256, tn: int = 256, tk: int = 2048,
    interpret: bool = False,
):
    row_cap, dim_cap = x.shape
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
            pl.BlockSpec(
                (1, tm, tn), lambda p, k, *_: (p, 0, 0)
            ),
            pl.BlockSpec(
                (1, tm // GROUP, tn), lambda p, k, *_: (p, 0, 0)
            ),
        ],
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, tm, tn), jnp.uint8),
            jax.ShapeDtypeStruct((n_blocks, tm // GROUP, tn), jnp.uint8),
        ],
        # off-TPU use the TPU interpreter (emulates scalar prefetch etc.)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(bi, bj, tau_arr, x, x)


@functools.partial(
    jax.jit,
    static_argnames=("tm", "tn", "tk", "cap", "interpret"),
)
def allpairs_extract_pallas(
    x, bi, bj, tau_eff, cap: int, tm: int = 512, tn: int = 512,
    tk: int = 2048, interpret: bool = False,
):
    """Same contract as ``score.allpairs_extract``:
    ((buf_i, buf_j), packed_head) over the upper triangle.

    Operands are read in bfloat16 (measured 2.7× faster than fp32 tiles —
    the kernel is HBM-bound; the MXU's DEFAULT pass rounds inputs to bf16
    anyway, so the engine's error margin already covers this)."""
    mask, rga = pallas_score_blocks(
        x.astype(jnp.bfloat16), bi, bj, tau_eff, tm, tn, tk, interpret
    )
    n_blocks = bi.shape[0]
    total = jnp.sum(mask, dtype=jnp.int32)
    capb = max(cap // GROUP, 1024)
    mb = rga != 0  # [n_blocks, tm/8, tn]
    groups = jnp.sum(mb, dtype=jnp.int32)
    (bflat,) = jnp.nonzero(
        mb.reshape(-1), size=capb, fill_value=n_blocks * (tm // GROUP) * tn
    )
    per_block = (tm // GROUP) * tn
    bvalid = bflat < n_blocks * per_block
    p_idx = (bflat // per_block).astype(jnp.int32)
    rem = bflat % per_block
    g_idx = (rem // tn).astype(jnp.int32)
    c_idx = (rem % tn).astype(jnp.int32)
    mask4 = mask.reshape(n_blocks, tm // GROUP, GROUP, tn)
    strips = mask4[
        p_idx.clip(0, n_blocks - 1), g_idx, :, c_idx
    ]  # [capb, GROUP] uint8
    strips = jnp.where(bvalid[:, None], strips, 0)
    (f2,) = jnp.nonzero(
        (strips != 0).reshape(-1), size=cap, fill_value=capb * GROUP
    )
    f2valid = f2 < capb * GROUP
    slot = (f2 // GROUP).clip(0, capb - 1)
    off = (f2 % GROUP).astype(jnp.int32)
    row = bi[p_idx[slot]] * tm + g_idx[slot] * GROUP + off
    col = bj[p_idx[slot]] * tn + c_idx[slot]
    row = jnp.where(f2valid, row, -1).astype(jnp.int32)
    col = jnp.where(f2valid, col, -1).astype(jnp.int32)
    from .score import HEAD_JOIN, _pack_head

    return (row, col), _pack_head(row, col, total, groups, HEAD_JOIN)
