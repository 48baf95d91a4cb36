"""Rows-sharded mesh fast path: the int8 Pallas join under ``shard_map``.

Round 2 left every multi-device layout on the XLA rectangle path
(`engine._pallas_ok` required a single device), so per-chip throughput on a
slice was far below the single-chip Pallas headline.  With ``shard_axis=
"rows"`` the fix is natural: each device owns a contiguous row block of the
index, so the global upper-triangle block schedule PARTITIONS by the row
block — device d runs the cross-block kernel (``ops/panel.py``) over the
blocks whose rows it owns, against an all-gathered int8 copy of the full
index.  No psum is needed (rows sharding contracts nothing across devices);
the only collective is one int8 ``all_gather`` (half the bytes of bf16)
whose cost rides ICI.

The global schedule is striped round-robin across devices (device d takes
blocks d, d+n, d+2n, …) and every device scores its blocks FROM THE GATHERED
COPY (both operands), so per-device work is balanced to ±1 block.  The
earlier contiguous partition (device d scores its own row block as the
I side) made device 0's schedule ~2× the average — and since schedules are
padded to the longest and padding blocks still run the full dot loop, the
whole join ran at device 0's pace.  Striding also removes the
``b_rows % tm`` divisibility constraint that silently disqualified the fast
path for most corpus sizes (only ``row_cap`` must tile).

Exactness: identical contract to the single-chip kernel — int8 scores plus
the per-pair quantization bound form a proven candidate superset at
``tau_eff``; the host fp64 rescore decides the final set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .pallas_score import _compact_bits, quantize_rows, upper_blocks_rect
from .panel import panel_score_bits_int8, panel_score_bits_int8_ref

__all__ = ["rows_schedule", "mesh_rows_extract_int8"]


def rows_schedule(row_cap: int, n_dev: int, tm: int, tn: int):
    """Per-device block schedules ``(bi, bj, valid) [n_dev, max_blocks]``:
    the GLOBAL upper-triangle tile schedule striped round-robin across
    devices (balanced to ±1 block; blocks are global since every device
    scores from the all-gathered copy), padded with ``valid=0``."""
    bi, bj = upper_blocks_rect(row_cap, tm, tn)
    mx = -(-bi.size // n_dev)
    bi_a = np.zeros((n_dev, mx), np.int32)
    bj_a = np.zeros((n_dev, mx), np.int32)
    va_a = np.zeros((n_dev, mx), np.int32)
    for d in range(n_dev):
        sl_i, sl_j = bi[d::n_dev], bj[d::n_dev]
        bi_a[d, : sl_i.size] = sl_i
        bj_a[d, : sl_j.size] = sl_j
        va_a[d, : sl_i.size] = 1
    return bi_a, bj_a, va_a


@functools.lru_cache(maxsize=None)
def mesh_rows_extract_int8(
    mesh: Mesh, axis: str, row_cap: int, dim_cap: int,
    cap: int, capb: int, cap0: int,
    tm: int, tn: int, tk: int, interpret: bool, pack: bool,
):
    """Compiled fn: (x, bi, bj, valid, tau_eff) -> (rows, cols, heads), all
    stacked ``[n_dev, ...]`` — the full upper-triangle join, one kernel
    launch per device over its own schedule."""
    def local(x_local, bi_d, bj_d, valid_d, tau_eff):
        # per-row int8 quantization is row-local under rows sharding —
        # ONE definition (pallas_score.quantize_rows), incl. the hard-won
        # alpha=0 padded-row rule
        q, aux = quantize_rows(x_local)  # aux [3, b_rows]
        qg = jax.lax.all_gather(q, axis, axis=0, tiled=True)  # [row_cap, D]
        auxg = jax.lax.all_gather(aux, axis, axis=1, tiled=True)
        # both operands read from the gathered copy: blocks are GLOBAL, so
        # the striped schedule balances devices and no b_rows alignment is
        # needed (see module docstring)
        off = jnp.stack([jnp.int32(0), jnp.int32(0)])
        bi = bi_d.reshape(-1)
        bj = bj_d.reshape(-1)
        valid = valid_d.reshape(-1)
        if interpret:
            # Mosaic's TPU interpreter inside a multi-device shard_map
            # hangs on the CPU backend; tests emulate the kernel in XLA
            gb, g64, cnt = panel_score_bits_int8_ref(
                qg, qg, auxg, auxg, bi, bj, off, tau_eff, tm, tn, valid
            )
        else:
            gb, g64, cnt = panel_score_bits_int8(
                qg, qg, auxg, auxg, bi, bj, off, tau_eff, tm, tn, tk,
                interpret, valid,
            )
        (row, col), head = _compact_bits(
            gb, g64, cnt, bi, bj, cap, capb, cap0, tm, tn, pack
        )
        return row[None], col[None], head[None]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None), P()),
        out_specs=(P(axis, None), P(axis, None), P(axis, None)),
        check_vma=False,  # per-device schedules ARE device-varying
    )
    return jax.jit(fn)
