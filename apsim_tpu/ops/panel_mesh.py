"""Mesh-sharded block-panel join: panel slabs sharded by chunk columns.

Extends the round-3 block-panel path (``ops/panel.py``) to the chunk-sharded
out-of-core engine: every device holds its own chunks' entries, so a row
panel's int8 slab is naturally COLUMN-sharded — device d densifies
``[rb, d_local]`` from its local entries, the panel-pair score is the sum of
per-device int8 partial dots (a Mosaic matmul kernel per device, EXACT int32
``psum`` over ICI), and the quantization-bound epilogue + bit-packed
compaction run replicated on the summed scores.  The int32 psum is exact, so
the per-pair bound proof (``ops/pallas_score.py``) carries over unchanged.

This is the panel analog of ``ops/chunked_mesh.mesh_stripe_extract`` — but
where the stripe path's per-device work is XLA slab matmuls (which miss the
native int8 MXU path), the panel path's per-device dot is Mosaic.

Off-TPU the per-device dot falls back to an XLA ``dot_general`` (same
reasoning as ``panel_score_bits_int8_ref``: the Mosaic interpreter inside a
multi-device shard_map hangs on the CPU backend); the tests then validate
the shard_map plumbing, sharded sort/densify, psum and epilogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from .pallas_score import _compact_bits, _sat_count_sum, bitpack_mask
from .panel import int8_bound_mask

__all__ = [
    "mesh_panel_state",
    "mesh_build_panel_slab",
    "mesh_panel_pair",
]


def _mm_kernel(x_ref, q_ref, o_ref, acc_ref):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

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
        o_ref[:] = acc_ref[:]


def _int8_matmul(xi, xj, tm: int, tn: int, tk: int):
    """Mosaic int8 matmul: ``xi [m, d] @ xj [n, d]ᵀ -> int32 [m, n]`` —
    the native-int8 MXU path XLA's lowering misses."""
    m, d = xi.shape
    n = xj.shape[0]
    return pl.pallas_call(
        _mm_kernel,
        grid=(m // tm, n // tn, d // tk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k)),
            pl.BlockSpec((tn, tk), lambda i, j, k: (j, k)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
    )(xi, xj)


@functools.lru_cache(maxsize=None)
def mesh_panel_state(mesh: Mesh, axis: str, row_cap: int, rb: int,
                     n_panels: int):
    """Compiled fn: (rows2d, cols2d, vals2d, counts) ->
    (r_s, c_s, q_s, aux, pcounts, max_nnz).

    Per device: global per-row α/L1/nnz assembled with pmax/psum (a row's
    dims are split across devices), local entries int8-quantized, then
    sorted by row with SLAB-LOCAL columns (``local_dim · n_local_chunks +
    local_chunk`` — any per-device bijection works, the dot contracts it).
    ``r_s/c_s/q_s/pcounts`` come out device-stacked ``P(axis, None)``;
    ``aux`` replicated."""

    def local(rows2d, cols2d, vals2d, counts):
        n_local, cap = rows2d.shape
        pos = jax.lax.broadcasted_iota(jnp.int32, (n_local, cap), 1)
        valid = pos < counts[:, None]
        flat_r = jnp.where(valid, rows2d, 1 << 30).reshape(-1)
        flat_v = jnp.where(valid, vals2d, 0.0).reshape(-1)
        safe_r = jnp.minimum(flat_r, row_cap - 1)
        absv = jnp.abs(flat_v)
        mx = jnp.zeros((row_cap,), jnp.float32).at[flat_r].max(
            absv, mode="drop"
        )
        mx = jax.lax.pmax(mx, axis)
        alpha = jnp.where(mx > 0, mx / 127.0, 0.0)
        div = jnp.where(alpha[safe_r] > 0, alpha[safe_r], 1.0)
        q = jnp.clip(jnp.round(flat_v / div), -127, 127).astype(jnp.int8)
        l1q = jnp.zeros((row_cap,), jnp.float32).at[flat_r].add(
            jnp.abs(q).astype(jnp.float32), mode="drop"
        )
        l1q = jax.lax.psum(l1q, axis)
        nnz = jnp.zeros((row_cap,), jnp.float32).at[flat_r].add(
            (flat_v != 0).astype(jnp.float32), mode="drop"
        )
        nnz = jax.lax.psum(nnz, axis)
        aux = jnp.stack([alpha, alpha * l1q, nnz])
        chunk_of = jax.lax.broadcasted_iota(jnp.int32, (n_local, cap), 0)
        c_slab = (cols2d * n_local + chunk_of).reshape(-1)
        order = jnp.argsort(flat_r)
        r_s = flat_r[order]
        c_s = c_slab[order]
        q_s = q[order]
        pan = jnp.minimum(r_s // rb, n_panels).astype(jnp.int32)
        pcounts = jnp.zeros((n_panels + 1,), jnp.int32).at[pan].add(1)
        return (
            r_s[None], c_s[None], q_s[None], aux, pcounts[None],
            jnp.max(nnz).astype(jnp.int32),
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis)),
        out_specs=(
            P(axis, None), P(axis, None), P(axis, None), P(),
            P(axis, None), P(),
        ),
        check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def mesh_build_panel_slab(mesh: Mesh, axis: str, rb: int, d_local: int,
                          p_cap: int):
    """Compiled fn: (r_s, c_s, q_s, start, row0) -> int8 slab
    ``[rb, n_dev · d_local]`` column-sharded ``P(None, axis)``.  Same
    row-range-masked, clamp-safe slice as the single-device
    ``build_panel_slab`` — per-device ``start``."""

    def local(r_s, c_s, q_s, start, row0):
        r = jax.lax.dynamic_slice(r_s[0], (start[0],), (p_cap,))
        c = jax.lax.dynamic_slice(c_s[0], (start[0],), (p_cap,))
        q = jax.lax.dynamic_slice(q_s[0], (start[0],), (p_cap,))
        ok = (r >= row0) & (r < row0 + rb)
        rl = jnp.where(ok, r - row0, rb)
        c = jnp.where(ok, c, 0)
        q = jnp.where(ok, q, 0)
        slab = jnp.zeros((rb, d_local), jnp.int8)
        return slab.at[rl, c].set(q, mode="drop", unique_indices=True)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis), P()),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def mesh_panel_pair(
    mesh: Mesh, axis: str, rb: int, d_local: int,
    cap: int, capb: int, cap0: int,
    tm: int, tn: int, tk: int, interpret: bool, pack: bool,
):
    """Compiled fn: (xi, xj, aux_i, aux_j, row0_i, row0_j, tau_eff) ->
    ((rows, cols), packed_head) — one panel pair: per-device int8 partial
    dot (Mosaic on TPU, XLA off it), exact int32 psum, replicated bound
    epilogue + compaction over the whole ``[rb, rb]`` rectangle (one
    "block" of size rb×rb; the SUPER2 pre-level keeps the scans small)."""

    def local(xi, xj, aux_i, aux_j, row0_i, row0_j, tau_eff):
        if interpret:
            d = jax.lax.dot_general(
                xi, xj,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        else:
            d = _int8_matmul(xi, xj, tm, tn, tk)
        d = jax.lax.psum(d, axis)
        d = jax.lax.optimization_barrier(d)
        rows = row0_i + jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
        cols = row0_j + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        mi = int8_bound_mask(d, aux_i, aux_j, rows, cols, tau_eff).astype(
            jnp.int32
        )
        gbi, g_any, g64i = bitpack_mask(mi)
        # saturating count: an rb=65536 panel rectangle has 2^32 cells, so a
        # plain int32 sum could wrap negative and pass the overflow check
        cnt = (
            jnp.zeros((1, 8, 128), jnp.int32)
            .at[0, 0, 0].set(_sat_count_sum(mi))
            .at[0, 0, 1].set(jnp.sum(g_any, dtype=jnp.int32))
            .at[0, 0, 2].set(jnp.sum(g64i, dtype=jnp.int32))
        )
        bi = (row0_i // rb).astype(jnp.int32)[None]
        bj = (row0_j // rb).astype(jnp.int32)[None]
        return _compact_bits(
            gbi.astype(jnp.uint8)[None], g64i.astype(jnp.uint8)[None], cnt,
            bi, bj, cap, capb, cap0, rb, rb, pack,
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(), P(), P(), P(), P()),
        out_specs=((P(), P()), P()),
        check_vma=False,
    )
    return jax.jit(fn)
