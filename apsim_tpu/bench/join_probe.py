"""Dense-join stage attribution: where does the non-MXU time go?

VERDICT r3 weak #2: Enron steady-state runs ~20% MFU end-to-end, but no
artifact says which stage eats the rest.  This probe decomposes one warm
``Engine.all_pairs`` into:

  - dispatch+sync floor: a no-op jit call followed by a 4-byte value fetch
    (the per-call tax every stage below also pays once);
  - kernel:   ``pallas_score_bits_int8`` alone, synced by fetching one
    int32 of the count output (4 bytes — negligible transfer);
  - extract:  the full ``allpairs_extract_pallas_int8`` call incl. the
    three-level compaction, synced by the packed-head fetch the engine
    itself does (so "extract - kernel" ≈ compaction + head D2H);
  - rescore:  host fp64 rescore + emission (``all_pairs`` total minus
    extract, cross-checked against the engine Timer's sections).

Timing rule (ARCHITECTURE.md): value-fetch sync only — every stage above
ends in an ``np.asarray`` of device data.

Usage: python -m apsim_tpu.bench.join_probe [size ...] (default: 8586
16384 32768 65536; 8586 = Enron-sized synthetic).  ``--enron`` uses the
real Enron TF-IDF corpus for the first size instead.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _med(f, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return float(sorted(ts)[len(ts) // 2])


def probe_size(csr, ids=None, tau: float = 0.8, reps: int = 5) -> dict:
    import jax.numpy as jnp

    from ..config import AllPairsConfig
    from ..engine.engine import Engine
    from ..ops import pallas_score
    from .mfu import int8_join_ops, mfu_pct

    eng = Engine(AllPairsConfig())
    t0 = time.time()
    eng.build(csr, ids)
    build_s = time.time() - t0
    # two warm calls: compile config-default caps, then the tightened ones
    eng.all_pairs(tau)
    eng.all_pairs(tau)

    out = {"n_rows": csr.n_rows, "row_cap": eng.row_cap,
           "dim_cap": eng.dim_cap, "build_seconds": round(build_s, 2)}
    if not eng._pallas_ok() or not eng._used_int8:
        out["note"] = "int8 pallas path inactive; stage split skipped"
    else:
        # mirror _all_pairs_pallas's geometry and cached operands/caps
        if eng.row_cap % 1024 == 0:
            tm, tn, tk = 1024, 512, 1024
        elif eng.row_cap % 512 == 0:
            tm, tn, tk = 512, 512, 2048
        else:
            tm, tn, tk = 256, 256, 2048
        tk8 = 2 * tk if eng.dim_cap % (2 * tk) == 0 else tk
        bi, bj = pallas_score.upper_blocks_rect(eng.row_cap, tm, tn)
        bi, bj = jnp.asarray(bi), jnp.asarray(bj)
        _, q8, aux = eng._int8_cache
        tau_eff = eng._tau_eff(tau)
        cap, capb, cap0 = eng._pallas_caps
        pack = eng.row_cap <= 65536

        import jax

        noop = jax.jit(lambda v: v + 1)
        x0 = jnp.zeros((8,), jnp.int32)
        float(np.asarray(noop(x0))[0])  # compile
        out["dispatch_floor_s"] = _med(
            lambda: float(np.asarray(noop(x0))[0]), reps
        )

        def kernel_only():
            _, _, cnt = pallas_score.pallas_score_bits_int8(
                q8, aux, bi, bj, tau_eff, tm, tn, tk8
            )
            return int(np.asarray(cnt[0, 0, 0]))

        kernel_only()  # compile (cache-shared with the engine's call)
        out["kernel_s"] = _med(kernel_only, reps)

        def extract_full():
            _, packed = pallas_score.allpairs_extract_pallas_int8(
                q8, aux, bi, bj, tau_eff, cap, capb, cap0,
                tm=tm, tn=tn, tk=tk8, pack_head=pack,
            )
            return np.asarray(packed)

        extract_full()
        out["extract_s"] = _med(extract_full, reps)
        out["compact_fetch_s"] = out["extract_s"] - out["kernel_s"]

    out["all_pairs_s"] = _med(lambda: eng.all_pairs(tau), reps)
    if "extract_s" in out:
        out["rescore_emit_s"] = out["all_pairs_s"] - out["extract_s"]
    ops = int8_join_ops(eng.row_cap, eng.dim_cap)
    out["int8_ops"] = ops
    out["mfu_pct_e2e"] = round(mfu_pct(ops, out["all_pairs_s"]), 1)
    if "kernel_s" in out:
        out["mfu_pct_kernel"] = round(mfu_pct(ops, out["kernel_s"]), 1)
    # engine-side attribution cross-check (accumulated over all calls here)
    out["timer"] = {
        k: round(v / max(eng.timer.counts.get(k, 1), 1), 4)
        for k, v in eng.timer.totals.items()
        if k in ("score_extract", "rescore")
    }
    del eng
    return out


def geom_sweep(csr, tau: float = 0.8, reps: int = 5) -> dict:
    """Kernel-only A/B over tile geometries (int8 path).  The round-2b
    "geometry sweeps are pointless" verdict was measured on the bf16 kernel
    at >=70% of peak; the int8 kernel sits near ~40% end-to-end, so re-test:
    a symmetric (1024,1024) block cuts blocked operand re-reads 33% vs the
    default (1024,512).  VMEM check per step (16 MB/core): x tm*tk + q tn*tk
    int8 double-buffered + acc tm*tn int32 must fit."""
    import jax.numpy as jnp

    from ..config import AllPairsConfig
    from ..engine.engine import Engine
    from ..ops import pallas_score
    from .mfu import int8_join_ops, mfu_pct

    eng = Engine(AllPairsConfig())
    eng.build(csr)
    eng.all_pairs(tau)
    if not eng._used_int8:
        return {"note": "int8 path inactive"}
    _, q8, aux = eng._int8_cache
    tau_eff = eng._tau_eff(tau)
    ops = int8_join_ops(eng.row_cap, eng.dim_cap)
    out = {}
    for tm, tn, tk in (
        (1024, 512, 2048),   # current default
        (1024, 1024, 1024),
        (1024, 1024, 2048),
        (512, 512, 2048),
        (2048, 512, 2048),
    ):
        if eng.row_cap % tm or eng.row_cap % tn or eng.dim_cap % tk:
            continue
        vmem = (tm * tk + tn * tk) * 2 + tm * tn * 4  # db operands + acc
        if vmem > 15 * 2**20:
            continue
        bi, bj = pallas_score.upper_blocks_rect(eng.row_cap, tm, tn)
        bi, bj = jnp.asarray(bi), jnp.asarray(bj)

        def kern():
            _, _, cnt = pallas_score.pallas_score_bits_int8(
                q8, aux, bi, bj, tau_eff, tm, tn, tk
            )
            return int(np.asarray(cnt[0, 0, 0]))

        try:
            kern()  # compile
            dt = _med(kern, reps)
        except Exception as e:  # compiler VMEM rejection etc.
            out[f"{tm}x{tn}x{tk}"] = {"error": repr(e)[:200]}
            continue
        out[f"{tm}x{tn}x{tk}"] = {
            "kernel_s": round(dt, 4),
            "mfu_pct_kernel": round(mfu_pct(ops, dt), 1),
            "n_blocks": int(bi.shape[0]),
        }
        print(f"geom {tm}x{tn}x{tk}: {out[f'{tm}x{tn}x{tk}']}", flush=True)
    del eng
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sizes = [int(a) for a in args] or [8586, 16384, 32768, 65536]
    use_enron = "--enron" in sys.argv
    from .scale import synthetic_corpus

    if "--geom" in sys.argv:
        n = sizes[0]
        print(json.dumps({"geom_sweep": geom_sweep(synthetic_corpus(n)),
                          "n": n}), flush=True)
        return

    report = {}
    for k, n in enumerate(sizes):
        if use_enron and k == 0:
            from .data import load_enron_tfidf

            csr, ids = load_enron_tfidf()
            r = probe_size(csr, ids)
            key = f"enron_{csr.n_rows}"
        else:
            r = probe_size(synthetic_corpus(n))
            key = str(n)
        report[key] = r
        print(f"{key}: {json.dumps(r)}", flush=True)
    print(json.dumps({"join_probe": report}), flush=True)


if __name__ == "__main__":
    main()
