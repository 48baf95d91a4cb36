"""Synthetic scale benchmark: corpus sizes beyond Enron.

Generates TF-IDF-shaped data (power-law dim popularity, L2-normalized, with a
controllable near-duplicate rate so thresholded joins have hits) and measures
build + all-pairs + streaming at increasing row counts on the current device.
Validates the engine's large-row paths (tiling, extraction capacity, growth)
and reports decided-pairs/sec per size.
"""

from __future__ import annotations

import json
import time
from typing import Dict, List

import numpy as np

from ..config import AllPairsConfig
from ..engine.engine import Engine
from ..vector.batch import CSRMatrix

__all__ = ["synthetic_corpus", "run_scale"]


def synthetic_corpus(
    n_rows: int,
    n_dims: int = 1 << 20,
    active_dims: int = 32768,
    nnz_mean: int = 120,
    dup_rate: float = 0.02,
    seed: int = 0,
) -> CSRMatrix:
    """Power-law sparse corpus: dim d is sampled ∝ 1/(d+10); ``dup_rate`` of
    rows are exact copies of earlier rows (guaranteed tau≈1 pairs)."""
    rng = np.random.default_rng(seed)
    weights = 1.0 / (np.arange(active_dims) + 10.0)
    weights /= weights.sum()
    all_idx: List[np.ndarray] = []
    all_val: List[np.ndarray] = []
    for i in range(n_rows):
        nnz = max(4, int(rng.poisson(nnz_mean)))
        dims = np.unique(
            rng.choice(active_dims, size=nnz, p=weights)
        ).astype(np.int32)
        vals = rng.random(dims.size) + 0.05
        vals /= np.linalg.norm(vals)
        all_idx.append(dims)
        all_val.append(vals.astype(np.float64))
    # inject exact duplicates by overwriting dup_rate of rows post hoc
    n_dup = int(n_rows * dup_rate)
    dup_dst = rng.choice(np.arange(1, n_rows), size=n_dup, replace=False)
    for d in dup_dst:
        src = int(rng.integers(0, d))
        all_idx[d] = all_idx[src]
        all_val[d] = all_val[src]
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    for i in range(n_rows):
        indptr[i + 1] = indptr[i] + all_idx[i].size
    return CSRMatrix(
        n_rows, n_dims, indptr, np.concatenate(all_idx), np.concatenate(all_val)
    )


def run_scale(sizes=(10_000, 25_000, 50_000), tau: float = 0.8) -> Dict:
    report: Dict = {}
    for n in sizes:
        t0 = time.time()
        csr = synthetic_corpus(n)
        gen_s = time.time() - t0
        eng = Engine(AllPairsConfig())
        t0 = time.time()
        eng.build(csr)
        build_s = time.time() - t0
        eng.all_pairs(tau)  # warm (default caps; lets the engine tighten)
        eng.all_pairs(tau)  # warm the tight-cap shapes
        t0 = time.time()
        res = eng.all_pairs(tau)
        join_s = time.time() - t0
        decided = n * (n - 1) / 2
        report[str(n)] = {
            "gen_seconds": gen_s,
            "build_seconds": build_s,
            "join_seconds": join_s,
            "pairs": res.n_pairs,
            "decided_pairs_per_sec": decided / join_s,
            "row_cap": eng.row_cap,
            "dim_cap": eng.dim_cap,
            "index_gb": eng.row_cap * eng.dim_cap * 4 / 1e9,
        }
        del eng
    return report


if __name__ == "__main__":
    import sys

    sizes = tuple(int(s) for s in sys.argv[1:]) or (10_000, 25_000, 50_000)
    json.dump(run_scale(sizes), sys.stdout, indent=2)
    print()
