"""Benchmark driver: Enron all-pairs cosine join at tau=0.8 on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: decided-pairs/sec — the join decides all n(n-1)/2 pairs of the corpus
at the threshold; throughput = decided pairs / steady wall time (engine fully
built; measurement includes device scoring, D2H transfer of candidates and
exact fp64 rescore — everything after index build).

Baseline: measured faithful CPU port of the reference algorithm
(IndexingWorkerActor.querySimilarItems + CommonUtils.calculateSimilarity —
see apsim_tpu/bench/baseline.py) on a prefix of the same corpus, per
BASELINE.md ("the reference publishes no numbers; the baseline must be
measured").  Extrapolation is linear in decided pairs (the port's cost per
decided pair falls as the index grows denser, so the prefix rate is an
overestimate of the full-corpus rate — conservative for vs_baseline).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

TAU = 0.8
BASELINE_ROWS = 1200  # prefix for the CPU reference port (~1 min)
REPEATS = 9  # the device tunnel here is noisy (3x run-to-run spread);
             # median of 9 keeps the metric stable


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    # bounded device probe: a dead axon tunnel hangs backend init
    # indefinitely (observed outages > 6 h), which would hang the whole
    # benchmark run; a watchdog turns that into a clear nonzero exit
    import os
    import threading

    probe_ok = threading.Event()

    def _watchdog() -> None:
        if not probe_ok.wait(900):
            log("DEVICE UNREACHABLE: no TPU contact within 900 s — "
                "aborting benchmark (tunnel outage?)")
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    t0 = time.time()
    import jax.numpy as jnp

    assert float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8)))) == 512.0
    probe_ok.set()
    log(f"device probe: {time.time() - t0:.1f}s")

    from apsim_tpu import AllPairsConfig, Engine
    from apsim_tpu.bench.baseline import measure_baseline
    from apsim_tpu.bench.data import load_enron_tfidf

    csr, ids = load_enron_tfidf()
    n = csr.n_rows
    log(f"corpus: {n} docs, nnz={int(csr.indptr[-1])}")

    eng = Engine(AllPairsConfig())
    t0 = time.time()
    st = eng.build(csr, ids)
    log(f"build: {time.time() - t0:.1f}s {dict(st)}")

    # warm-up (compile; persistent cache makes this fast on repeat runs).
    # Two calls: the first compiles the config-default extraction caps, and
    # its result lets the engine tighten the caps to the observed candidate
    # counts — the second compiles those steady-state shapes.
    t0 = time.time()
    res = eng.all_pairs(TAU)
    log(f"warm-up all_pairs: {time.time() - t0:.1f}s, {res.n_pairs} pairs")
    t0 = time.time()
    eng.all_pairs(TAU)
    log(f"warm-up 2 (tight caps): {time.time() - t0:.1f}s")

    # warm build: rebuild with every shape compiled — this is the engine's
    # actual indexing cost.  NOTE the two build numbers are not comparable:
    # the initial build above may hit a pre-warmed persistent compile cache
    # from earlier runs on this machine (making it FASTER than this one) or
    # pay one-time remote compiles (making it slower) — environment, not
    # engine work.  This second, fully-warm build is the honest figure.
    eng2 = Engine(AllPairsConfig())
    t0 = time.time()
    eng2.build(csr, ids)
    log(f"warm build: {time.time() - t0:.1f}s")
    del eng2

    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        res = eng.all_pairs(TAU)
        times.append(time.time() - t0)
    steady = float(np.median(times))
    decided = n * (n - 1) / 2
    engine_rate = decided / steady
    log(f"steady: {steady:.3f}s median of {times} -> "
        f"{engine_rate/1e6:.1f}M decided pairs/s, {res.n_pairs} pairs")

    # exactness gate: FULL-corpus fp64 oracle (sparse spGEMM, ~22 s) — every
    # emitted pair and every absent pair checked over all n rows, not a prefix
    from apsim_tpu.bench.suite import _oracle_pairs

    want, _ = _oracle_pairs(csr, TAU)
    got = {(int(a), int(b)) for a, b in zip(res.i, res.j)}
    parity = got == want
    log(f"parity on FULL {n}-doc corpus: {parity} "
        f"({len(got)} vs {len(want)})")
    if not parity:
        log("PARITY FAILURE — benchmark invalid")

    bl = measure_baseline(csr, TAU, max_rows=BASELINE_ROWS)
    log(
        f"baseline (reference-algorithm port, {bl['n_rows']} rows): "
        f"{bl['seconds']:.1f}s, {bl['decided_pairs_per_sec']/1e3:.1f}K "
        f"decided pairs/s, {bl['pairs_found']} pairs found"
    )
    # cross-check: the baseline port and the engine agree on the prefix
    eng_prefix = {
        tuple(sorted((str(int(a)), str(int(b)))))
        for a, b in zip(res.i, res.j)
        if a < bl["n_rows"] and b < bl["n_rows"]
    }
    bl_prefix = {tuple(sorted(p)) for p in bl["pair_set"]}
    log(f"baseline/engine prefix agreement: {eng_prefix == bl_prefix} "
        f"({len(eng_prefix)} vs {len(bl_prefix)})")

    # out-of-core tier: 100k-row synthetic join through ChunkedAllPairs'
    # block-panel Pallas path (the beyond-HBM engine; VERDICT r2 item #1).
    # Recorded in the stderr tail so the round artifact carries the number.
    del eng  # release the dense index + int8/bf16 cache copies first
    try:
        from apsim_tpu.bench.ooc import run_ooc

        ooc = run_ooc(100_000)
        log(
            f"out-of-core 100k join: {ooc['join_seconds']:.2f}s, "
            f"{ooc['pairs']} pairs, "
            f"{ooc['decided_pairs_per_sec']/1e9:.2f}B decided pairs/s, "
            f"panel_path={ooc['panel_path']}"
        )
    except Exception as e:  # the headline metric must survive an ooc failure
        log(f"out-of-core bench failed: {e!r}")

    vs = engine_rate / bl["decided_pairs_per_sec"]
    print(
        json.dumps(
            {
                "metric": "enron_allpairs_decided_pairs_per_sec_tau0.8",
                "value": round(engine_rate, 1),
                "unit": "pairs/s",
                "vs_baseline": round(vs, 1),
                "parity": bool(parity),
            }
        )
    )
    if not parity:
        # the exactness gate must GATE: an invalid run exits nonzero so no
        # consumer records the throughput as a valid result
        sys.exit(1)


if __name__ == "__main__":
    main()
