"""ELL-gather streaming-match probe: can a row-gather contraction beat the
per-batch full-corpus re-scatter beyond the resident-slab budget?

Beyond ``match_slab_budget_mb`` the chunked engine's streaming match pays a
fixed ~20 ns/entry corpus re-scatter per micro-batch (~1.0 s at 500k rows —
docs/ROUND4.md).  Dense resident slabs cannot fix it: 500k x 32k is >= 16 GB
in any byte format.  But the match itself only needs a TAU-MARGIN SUPERSET
of candidates (exactness comes from the host fp64 rescore of the shadow
CSR), so the corpus can stay resident in a compact bounded-row form:

  ELL: idx [rows, K] int32 + val [rows, K] bf16  (~384 MB at 500k/K=128)
  match: S[r, q] = sum_k val[r, k] * Qd[idx[r, k], q]

i.e. densify only the 256-row QUERY batch ([dims, 256]) and contract via a
row gather — data moved per batch is nnz * bs * 2 B (~28 GB at 500k/bs=256,
a ~34 ms bandwidth floor at 816 GB/s) instead of a 55M-element scatter.
Rows with nnz > K spill; spilled entries are counted here (they would ride
a COO side-match in an integration; at K=192 the power-law corpus spills
<0.5% of entries).

This probe measures the two candidate XLA formulations on real hardware —
blocked einsum (materializes [B, K, bs]) and a scan over k (gathers
[rows, bs] per step) — against the measured re-scatter baseline, deciding
whether an engine integration is worth it.  Timing rule per
ARCHITECTURE.md: value-fetch sync only.

Usage:  python -m apsim_tpu.bench.ell_probe [n_rows] [K] [bs]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def to_ell(csr, n_rows: int, K: int, compact_dims: int):
    """CSR -> ELL (idx, val, spilled_entries). Pad idx with ``compact_dims``
    (one past the last real dim — gathers read a zero pad row there).

    NOTE (timing probe only): rows with nnz > K keep their first K entries
    in dim-id order, NOT the K largest by |value|.  An ENGINE integration
    must keep top-|val| entries per row and route the spill to a COO
    side-match, otherwise high-weight entries spill arbitrarily and the
    tau-margin superset guarantee breaks.  For measuring the gather
    contraction's cost the entry choice is irrelevant."""
    idx = np.full((n_rows, K), compact_dims, np.int32)
    val = np.zeros((n_rows, K), np.float32)
    spilled = 0
    for r in range(n_rows):
        lo, hi = csr.indptr[r], csr.indptr[r + 1]
        k = min(hi - lo, K)
        spilled += (hi - lo) - k
        idx[r, :k] = csr.indices[lo : lo + k]
        val[r, :k] = csr.data[lo : lo + k]
    return idx, val, spilled


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n_rows = int(args[0]) if args else 100_000
    K = int(args[1]) if len(args) > 1 else 192
    bs = int(args[2]) if len(args) > 2 else 256

    import jax
    import jax.numpy as jnp

    from .scale import synthetic_corpus

    csr = synthetic_corpus(n_rows)
    # compact the dim space exactly like the engines do (df-ordered is not
    # needed for the timing shape; plain unique suffices)
    uniq, inv = np.unique(csr.indices, return_inverse=True)
    compact_dims = int(uniq.size)
    csr.indices[:] = inv
    print(
        f"corpus: {n_rows} rows, nnz={csr.indices.size}, "
        f"compact_dims={compact_dims}", flush=True,
    )
    t0 = time.time()
    idx_h, val_h, spilled = to_ell(csr, n_rows, K, compact_dims)
    print(
        f"ELL K={K}: {time.time() - t0:.1f}s host build, spilled "
        f"{spilled} entries ({spilled / csr.indices.size:.2%}), "
        f"device bytes="
        f"{(idx_h.nbytes + val_h.nbytes // 2) >> 20} MiB (idx int32 + "
        f"val bf16, the dtypes actually device-put below)",
        flush=True,
    )

    idx_d = jnp.asarray(idx_h)
    val_d = jnp.asarray(val_h, jnp.bfloat16)

    # query batch: densified [compact_dims + 1, bs] (pad row zero)
    qd = np.zeros((compact_dims + 1, bs), np.float32)
    for j in range(bs):
        lo, hi = csr.indptr[j], csr.indptr[j + 1]
        qd[csr.indices[lo:hi], j] = csr.data[lo:hi]
    qd_d = jnp.asarray(qd, jnp.bfloat16)

    tau = 0.8

    @functools.partial(jax.jit, static_argnames=("block",))
    def ell_match_blocked(idx, val, qdm, block: int):
        def body(i, acc):
            ib = jax.lax.dynamic_slice_in_dim(idx, i * block, block, 0)
            vb = jax.lax.dynamic_slice_in_dim(val, i * block, block, 0)
            g = qdm[ib]  # [block, K, bs]
            s = jnp.einsum(
                "bk,bkq->bq", vb, g,
                preferred_element_type=jnp.float32,
            )
            return acc.at[i].set((s >= tau).sum())
        nb = idx.shape[0] // block
        return jax.lax.fori_loop(
            0, nb, body, jnp.zeros((nb,), jnp.int32)
        )

    @jax.jit
    def ell_match_scan(idx, val, qdm):
        def step(acc, k):
            acc = acc + val[:, k, None] * qdm[idx[:, k]]
            return acc, None
        acc0 = jnp.zeros((idx.shape[0], qdm.shape[1]), jnp.float32)
        acc, _ = jax.lax.scan(step, acc0, jnp.arange(idx.shape[1]))
        return (acc >= tau).sum()

    def timed(fn, *a, reps=5, **kw):
        out = fn(*a, **kw)
        np.asarray(out)  # compile + first exec
        ts = []
        for _ in range(reps):
            t0 = time.time()
            np.asarray(fn(*a, **kw))
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    for block in (2048, 8192):
        if n_rows % block:
            continue
        dt = timed(ell_match_blocked, idx_d, val_d, qd_d, block=block)
        print(
            f"ell_blocked[{block}]: {dt * 1e3:8.1f} ms/batch "
            f"({bs / dt:7.0f} vec/s)", flush=True,
        )
    dt = timed(ell_match_scan, idx_d, val_d, qd_d)
    print(
        f"ell_scan:          {dt * 1e3:8.1f} ms/batch "
        f"({bs / dt:7.0f} vec/s)", flush=True,
    )


if __name__ == "__main__":
    main()
