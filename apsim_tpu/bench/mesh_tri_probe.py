"""Triangular vs rectangular XLA mesh-join accounting (VERDICT r4 #8).

Round 4 made ``allpairs_extract`` — the dims-sharded mesh hot path — score
only the upper-triangle row prefix per tile bucket (commit 4d349ff).  This
probe RECORDS the win instead of asserting it: it compiles both schedules
over the same dims-sharded index and reports

  - compiler-counted FLOPs and bytes accessed (``compiled.cost_analysis()``)
    — the authoritative MXU-work/psum-traffic accounting, valid on the
    virtual CPU mesh because GSPMD partitioning is backend-independent;
  - wall time per schedule (indicative only on CPU; authoritative when run
    with ``--tpu`` on a real slice).

"Rectangular" is emulated with ``mode="all"`` — identical matmul shapes to
the pre-4d349ff upper path (full ``row_cap`` per tile; the triangle mask
was elementwise and free).  Its candidate set is ~2x, so the extraction
cap is grown on overflow exactly like the engine does.

Usage: python -m apsim_tpu.bench.mesh_tri_probe [n_rows] [--tpu]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )
    import jax

    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ..config import AllPairsConfig
    from ..engine.engine import _next_cap
    from ..ops import score as score_ops
    from ..parallel import MeshEngine, make_mesh
    from .scale import synthetic_corpus

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 8192
    csr = synthetic_corpus(n)
    ndev = len(jax.devices())
    eng = MeshEngine(
        AllPairsConfig(shard_axis="dims", use_pallas="off"),
        mesh=make_mesh(ndev),
    )
    eng.build(csr)
    tau_eff = eng._tau_eff(0.8)
    tile = eng._tile()
    grp = int(eng.cfg.extract_group)
    report = {
        "n_rows": n, "devices": ndev, "row_cap": eng.row_cap,
        "dim_cap": eng.dim_cap, "tile": tile, "shard_axis": "dims",
    }
    for mode in ("upper", "all"):
        cap = int(eng.cfg.extract_cap)
        while True:  # engine-identical overflow growth
            lowered = score_ops.allpairs_extract.lower(
                eng.x, tau_eff, tile, cap, mode,
                eng.cfg.matmul_precision, grp,
            )
            compiled = lowered.compile()
            bufs, packed = compiled(eng.x, tau_eff)
            pairs, needed = score_ops.consume_packed(
                bufs, np.asarray(packed), cap, grp
            )
            if pairs is not None:
                break
            cap = _next_cap(cap, needed)
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0] if ca else {}
        times = []
        for _ in range(5):
            t0 = time.time()
            _, pk = compiled(eng.x, tau_eff)
            np.asarray(pk)  # value-fetch sync (ARCHITECTURE.md timing rule)
            times.append(time.time() - t0)
        report[mode] = {
            "cap": cap,
            "pairs_or_candidates": int(len(pairs[0])),
            "flops": float(ca.get("flops", -1.0)),
            "bytes_accessed": float(ca.get("bytes accessed", -1.0)),
            "wall_s_median": float(np.median(times)),
        }
        print(f"{mode}: {json.dumps(report[mode])}", flush=True)
    up, rect = report["upper"], report["all"]
    if up["flops"] > 0 and rect["flops"] > 0:
        report["flops_ratio_upper_over_rect"] = up["flops"] / rect["flops"]
    report["wall_ratio_upper_over_rect"] = (
        up["wall_s_median"] / rect["wall_s_median"]
    )
    json.dump(report, sys.stdout, indent=1)
    print(flush=True)


if __name__ == "__main__":
    main()
