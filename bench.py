"""Benchmark driver: Enron all-pairs cosine join at tau=0.8 on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Metric: decided-pairs/sec — the join decides all n(n-1)/2 pairs of the corpus
at the threshold; throughput = decided pairs / steady wall time (engine fully
built; measurement includes device scoring, D2H transfer of candidates and
exact fp64 rescore — everything after index build).  The line also carries
``int8_ops`` / ``seconds`` / ``mfu_pct`` (end-to-end utilization of the v5e
394 TOPS int8 peak — see apsim_tpu/bench/mfu.py) so efficiency per size is
auditable, not inferred.

Baseline: measured faithful CPU port of the reference algorithm
(IndexingWorkerActor.querySimilarItems + CommonUtils.calculateSimilarity —
see apsim_tpu/bench/baseline.py) on a prefix of the same corpus, per
BASELINE.md ("the reference publishes no numbers; the baseline must be
measured").  Extrapolation is linear in decided pairs (the port's cost per
decided pair falls as the index grows denser, so the prefix rate is an
overestimate of the full-corpus rate — conservative for vs_baseline).
NOTE (methodology, round 3+): the baseline port is fed ONE ROW PER
``index_batch`` CALL — the reference's own streaming ingest shape — so its
rate includes per-call dispatch overhead; earlier (round ≤2) runs fed the
whole prefix in one call.  vs_baseline figures across those rounds are not
directly comparable (the per-call basis measures ~10-15% slower).

Outage tolerance (BENCH_r03 lesson — a dead axon tunnel cost a full
round's artifact): the device probe runs in a SUBPROCESS with N bounded
retries + backoff; on final failure the driver still gets a parseable JSON
line flagged ``"stale": true`` carrying the last driver-verified value from
the newest ``BENCH_r*.json`` on disk, so a round never ships
``parsed: null``.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import numpy as np

TAU = 0.8
BASELINE_ROWS = 1200  # prefix for the CPU reference port (~1 min)
REPEATS = 9  # the device tunnel here is noisy (3x run-to-run spread);
             # median of 9 keeps the metric stable
PROBE_ATTEMPTS = 6  # r4 lesson: 3x300s missed an outage that recovered
                    # within hours; 6 probes + growing backoff spans ~1 h
PROBE_TIMEOUT_S = 300.0  # covers the ~225 s one-time device init
PROBE_BACKOFF_S = 120.0  # grows linearly per attempt (120/240/360/480/600)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def last_known_good() -> tuple[dict, str] | None:
    """Newest driver-recorded BENCH_r*.json with a parsed value."""
    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        try:
            with open(p, "r", encoding="utf-8") as f:
                d = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = d.get("parsed")
        if isinstance(parsed, dict) and "value" in parsed:
            n = d.get("n", -1)
            if best is None or n > best[0]:
                best = (n, parsed, os.path.basename(p))
    return (best[1], best[2]) if best else None


def emit_stale(reason: str) -> None:
    """Final-failure path: a parseable line, clearly flagged, then exit.
    rc=0 so the driver records the line; ``stale: true`` keeps it from
    being mistaken for a fresh measurement."""
    lkg = last_known_good()
    line = {
        "metric": "enron_allpairs_decided_pairs_per_sec_tau0.8",
        "value": None,
        "unit": "pairs/s",
        "vs_baseline": None,
        "stale": True,
        "stale_reason": reason,
    }
    if lkg is not None:
        parsed, src = lkg
        line["value"] = parsed.get("value")
        line["vs_baseline"] = parsed.get("vs_baseline")
        line["stale_source"] = src
    log(f"EMITTING STALE RESULT: {reason}")
    print(json.dumps(line), flush=True)
    os._exit(0)


def probe_device() -> None:
    """Bounded TPU-contact probe in a subprocess (a dead tunnel hangs
    backend init indefinitely; an in-process hang is unrecoverable).
    Retries with backoff so one transient outage doesn't cost the round."""
    import subprocess

    code = (
        "import jax.numpy as jnp; "
        "assert float(jnp.sum(jnp.ones((8,8)) @ jnp.ones((8,8)))) == 512.0"
    )
    for k in range(PROBE_ATTEMPTS):
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=PROBE_TIMEOUT_S, capture_output=True, text=True,
            )
            if r.returncode == 0:
                log(f"device probe ok (attempt {k + 1}, "
                    f"{time.time() - t0:.1f}s)")
                return
            log(f"device probe attempt {k + 1} rc={r.returncode}: "
                f"{r.stderr[-400:]}")
        except subprocess.TimeoutExpired:
            log(f"device probe attempt {k + 1}: no TPU contact within "
                f"{PROBE_TIMEOUT_S:.0f}s")
        if k + 1 < PROBE_ATTEMPTS:
            time.sleep(PROBE_BACKOFF_S * (k + 1))
    emit_stale(
        f"no TPU contact in {PROBE_ATTEMPTS} probes x "
        f"{PROBE_TIMEOUT_S:.0f}s (tunnel outage?)"
    )


def main() -> None:
    probe_device()

    # in-process watchdog for a tunnel that dies AFTER the probe: turns a
    # mid-run hang into the stale line instead of a silent driver timeout
    import threading

    done = threading.Event()

    def _watchdog() -> None:
        if not done.wait(2400):
            emit_stale("benchmark hung mid-run (>2400 s after probe ok)")

    threading.Thread(target=_watchdog, daemon=True).start()

    t0 = time.time()
    import jax.numpy as jnp

    assert float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8)))) == 512.0
    log(f"in-process device init: {time.time() - t0:.1f}s")

    from apsim_tpu import AllPairsConfig, Engine
    from apsim_tpu.bench.baseline import measure_baseline
    from apsim_tpu.bench.data import load_enron_tfidf
    from apsim_tpu.bench.mfu import int8_join_ops, mfu_pct

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
    ops = int8_join_ops(eng.row_cap, eng.dim_cap)
    mfu = mfu_pct(ops, steady)
    log(f"steady: {steady:.3f}s median of {times} -> "
        f"{engine_rate/1e6:.1f}M decided pairs/s, {res.n_pairs} pairs, "
        f"int8_ops={ops:.3g}, mfu={mfu:.1f}% of v5e int8 peak")

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
        f"baseline (reference-algorithm port, {bl['n_rows']} rows, "
        f"row-per-call streaming basis): "
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

    # mid-scale MFU curve (VERDICT r3 item #2): measured efficiency at
    # 16k/32k/64k through the dense engine, recorded in the stderr tail
    del eng  # release the Enron index before the sweep
    try:
        from apsim_tpu.bench.scale import synthetic_corpus

        for sweep_n in (16384, 32768, 65536):
            s_csr = synthetic_corpus(sweep_n)
            s_eng = Engine(AllPairsConfig())
            s_eng.build(s_csr)
            s_eng.all_pairs(TAU)
            s_eng.all_pairs(TAU)  # tight-cap warm
            t0 = time.time()
            s_eng.all_pairs(TAU)
            s_dt = time.time() - t0
            s_ops = int8_join_ops(s_eng.row_cap, s_eng.dim_cap)
            s_dec = sweep_n * (sweep_n - 1) / 2
            log(f"mfu_curve n={sweep_n}: {s_dt:.3f}s, "
                f"{s_dec/s_dt/1e9:.2f}B decided pairs/s, "
                f"mfu={mfu_pct(s_ops, s_dt):.1f}%")
            del s_eng
    except Exception as e:  # the headline must survive a sweep failure
        log(f"mfu curve failed: {e!r}")

    # out-of-core tier: 100k-row synthetic join through ChunkedAllPairs'
    # block-panel Pallas path (the beyond-HBM engine; VERDICT r2 item #1).
    # Recorded in the stderr tail so the round artifact carries the number.
    try:
        from apsim_tpu.bench.ooc import run_ooc

        ooc = run_ooc(100_000)
        log(
            f"out-of-core 100k join: {ooc['join_seconds']:.2f}s, "
            f"{ooc['pairs']} pairs, "
            f"{ooc['decided_pairs_per_sec']/1e9:.2f}B decided pairs/s, "
            f"mfu={ooc.get('mfu_pct', 0.0):.1f}%, "
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
                "seconds": round(steady, 4),
                "int8_ops": ops,
                "mfu_pct": round(mfu, 2),
                "stale": False,
            }
        ),
        flush=True,
    )
    done.set()
    if not parity:
        # the exactness gate must GATE: an invalid run exits nonzero so no
        # consumer records the throughput as a valid result
        sys.exit(1)


if __name__ == "__main__":
    main()
