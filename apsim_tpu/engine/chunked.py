"""Chunked-sparse batch join engine — exact all-pairs beyond the dense-index
HBM ceiling.

The dense :class:`Engine` needs ``rows × dim_cap`` floats resident (~130k
rows at Enron-like vocabularies on one v5e).  ``ChunkedAllPairs`` keeps only
flat COO entries + one dim-chunk slab on device (``O(nnz + rows·chunk_dim)``)
and runs the same exact join — fp64 host rescore included — at ~1M rows per
chip.  Batch mode only (build + join + re-join at other taus); streaming
inserts live on the dense engine.
"""

from __future__ import annotations

import time
from typing import List, Sequence, Tuple

import numpy as np

from ..config import AllPairsConfig
from ..index.compact import CompactSpace
from ..ops import chunked as chunked_ops
from ..ops import rescore as rescore_ops
from ..ops import score as score_ops
from ..utils.jaxsetup import setup_jax
from ..vector.batch import CSRMatrix, pow2_bucket, round_up
from .engine import _as_csr, _next_cap
from .output import PairResult

__all__ = ["ChunkedAllPairs"]


class ChunkedAllPairs:
    def __init__(self, config: AllPairsConfig | None = None,
                 chunk_dim: int = 2048, super_tile: int | None = None):
        setup_jax()
        self.cfg = config or AllPairsConfig()
        self.chunk_dim = int(chunk_dim)
        # query-stripe width: wide stripes amortize the per-chunk slab
        # scatter (100k rows: 4096 -> 55 s, 8192 -> 38 s); auto-sized at
        # build time to a ~3 GB fp32 accumulator budget unless overridden
        self.super_tile = None if super_tile is None else int(super_tile)
        self._device = None
        self._shadow: CSRMatrix | None = None
        self.ids: List[str] = []
        self.n_rows = 0
        self.row_cap = 0

    def build(self, vectors, ids: Sequence[str] | None = None) -> dict:
        import jax.numpy as jnp

        t0 = time.time()
        csr, self.ids = _as_csr(vectors, ids, self.cfg.vector_dim)
        self._shadow = csr
        self.n_rows = csr.n_rows
        compact = CompactSpace.from_csr(csr, self.cfg.dim_bucket)
        ccsr = compact.map_csr(csr)
        if self.super_tile is None:
            # widest stripe whose fp32 accumulator (row_cap × super_tile)
            # stays under ~3 GB (100k rows: 8192 measured 38 s vs 55 s @4096);
            # divide by the PADDED row count so the real allocation respects
            # the budget
            padded = round_up(max(csr.n_rows, 1), 8192)
            budget = (3 << 30) // (4 * padded)
            self.super_tile = max(1024, min(8192, (budget // 256) * 256))
        self.super_tile = min(
            self.super_tile,
            round_up(max(csr.n_rows, 1), 256),
        )
        self.row_cap = round_up(max(csr.n_rows, 1), self.super_tile)
        n_chunks = max(1, -(-compact.n_active // self.chunk_dim))
        rows_of = np.repeat(
            np.arange(csr.n_rows, dtype=np.int64), np.diff(ccsr.indptr)
        )
        ent_row, ent_col, ent_val, offs, max_cnt = (
            chunked_ops.sort_entries_by_chunk(
                rows_of, ccsr.indices.astype(np.int64), ccsr.data, n_chunks
            )
        )
        # pad the flat entry arrays to a pow2 length; pad rows scatter nothing
        cap_e = pow2_bucket(len(ent_row), 1024)
        pad = cap_e - len(ent_row)
        ent_row = np.concatenate(
            [ent_row, np.full(pad, self.row_cap, np.int32)]
        )
        ent_col = np.concatenate([ent_col, np.zeros(pad, np.int32)])
        ent_val = np.concatenate([ent_val, np.zeros(pad, np.float32)])
        self._device = (
            jnp.asarray(ent_row),
            jnp.asarray(ent_col),
            jnp.asarray(ent_val),
            jnp.asarray(offs),
        )
        self._max_ent = pow2_bucket(max_cnt, 1024)
        self._n_chunks = n_chunks
        self._compact = compact
        # margin bookkeeping (same policy as the dense engine)
        norms = csr.row_norms()
        self._max_norm = float(norms.max()) if norms.size else 0.0
        return {
            "n_rows": self.n_rows,
            "row_cap": self.row_cap,
            "n_chunks": n_chunks,
            "chunk_dim": self.chunk_dim,
            "entries": int(csr.indptr[-1]),
            "entry_cap": cap_e,
            "build_seconds": time.time() - t0,
        }

    def _tau_eff(self, tau: float) -> np.float32:
        m = max(self.cfg.rescore_margin, 2e-2)
        m *= max(self._max_norm * self._max_norm, 1.0)
        return np.float32(max(tau - m, score_ops.MIN_TAU_EFF))

    def all_pairs(self, tau: float | None = None) -> PairResult:
        tau = self.cfg.similarity_threshold if tau is None else float(tau)
        if self.n_rows == 0:
            return PairResult(
                np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64), [],
            )
        ent_row, ent_col, ent_val, offs = self._device
        grp = int(self.cfg.extract_group)
        tau_eff = self._tau_eff(tau)
        all_i: list = []
        all_j: list = []
        # host loop over query stripes; a stripe wide enough to amortize the
        # per-chunk slab scatter (the dominant cost of this mode)
        for q0 in range(0, self.n_rows, self.super_tile):
            cap = int(self.cfg.extract_cap)
            while True:
                bufs, packed = chunked_ops.chunked_stripe_extract(
                    ent_row, ent_col, ent_val, offs, np.int32(q0), tau_eff,
                    self.row_cap, self.chunk_dim, self._max_ent,
                    self.super_tile, cap, grp, self.cfg.matmul_precision,
                )
                pairs, needed = score_ops.consume_packed(
                    bufs, np.asarray(packed), cap, grp
                )
                if pairs is not None:
                    break
                cap = _next_cap(cap, needed)
            all_i.append(pairs[0])
            all_j.append(pairs[1])
        i = np.concatenate(all_i)
        j = np.concatenate(all_j)
        sims = rescore_ops.pair_dots(
            self._shadow.indptr, self._shadow.indices, self._shadow.data,
            i, j, self._shadow.n_cols,
        )
        keep = sims >= tau
        return PairResult(i[keep], j[keep], sims[keep], list(self.ids))

    def topk(self, queries, k: int):
        """k-NN over the chunked index: queries are chunk-sorted COO too, so
        neither side densifies its full width.  Same provably-exact fetch +
        fp64 re-rank contract as the dense engine (see Engine.topk for the
        margin bound)."""
        import jax.numpy as jnp

        if self.n_rows == 0:
            return {qid: [] for qid, _ in queries}
        qcsr, qids = _as_csr(list(queries), None, self.cfg.vector_dim)
        # drop dims the index never saw, map to compact columns
        mapped = self._compact.cols_of(qcsr.indices) >= 0
        row_of = np.repeat(np.arange(qcsr.n_rows), np.diff(qcsr.indptr))
        rows_m = row_of[mapped].astype(np.int64)
        cols_m = self._compact.cols_of(qcsr.indices[mapped]).astype(np.int64)
        vals_m = qcsr.data[mapped]
        q_row, q_col, q_val, q_offs, q_max = (
            chunked_ops.sort_entries_by_chunk(
                rows_m, cols_m, vals_m, self._n_chunks
            )
        )
        q_rows_cap = pow2_bucket(qcsr.n_rows, 32)
        cap_e = pow2_bucket(max(len(q_row), 1), 256)
        pad = cap_e - len(q_row)
        q_row = np.concatenate([q_row, np.full(pad, q_rows_cap, np.int32)])
        q_col = np.concatenate([q_col, np.zeros(pad, np.int32)])
        q_val = np.concatenate([q_val, np.zeros(pad, np.float32)])
        k_eff = min(k, self.n_rows)
        ent_row, ent_col, ent_val, offs = self._device
        nq = len(qids)

        def fetch(kf: int):
            s, r = chunked_ops.chunked_topk(
                ent_row, ent_col, ent_val, offs,
                jnp.asarray(q_row), jnp.asarray(q_col), jnp.asarray(q_val),
                jnp.asarray(q_offs), np.int32(self.n_rows),
                self.row_cap, self.chunk_dim, self._max_ent, q_rows_cap,
                pow2_bucket(q_max, 256), kf, "highest",
            )
            return np.asarray(s)[:nq], np.asarray(r)[:nq]

        from .engine import fetch_exact_topk

        q_norms = qcsr.row_norms()
        qmax = float(q_norms.max()) if q_norms.size else 0.0
        # entries are stored fp32 and scored at "highest" precision, so the
        # default relative bound (rescore_margin) covers the device error
        m = self.cfg.rescore_margin * max(self._max_norm * qmax, 1.0)
        rows, k_fetch = fetch_exact_topk(fetch, self.n_rows, k_eff, 2 * m)
        shadow = self._shadow
        qi_idx = np.repeat(np.arange(nq), k_fetch)
        cand_idx = rows.reshape(-1).astype(np.int64)
        sims = rescore_ops.cross_pair_dots(
            shadow.indptr, shadow.indices, shadow.data, shadow.n_cols,
            qcsr.indptr, qcsr.indices, qcsr.data, qi_idx, cand_idx,
        ).reshape(nq, k_fetch)
        out = {}
        for qi, qid in enumerate(qids):
            order = np.argsort(-sims[qi], kind="stable")[:k_eff]
            out[qid] = [
                (self.ids[int(rows[qi, t])], float(sims[qi, t]))
                for t in order
            ]
        return out
