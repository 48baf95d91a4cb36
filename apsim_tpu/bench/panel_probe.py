"""Rolling-sweep attribution probe for the out-of-core panel join.

Builds one synthetic corpus, then (with the panel state cached in-process)
times the join's constituent device ops and re-runs the join under different
rolling-sweep shapes (``B`` resident I-panels / ``jsync`` fetch cadence).
The dense-resident 100k join runs at ~78% of the int8 MXU floor while the
rolling 500k join ran at ~37% — this probe attributes the gap so the sweep
constants (``ChunkedAllPairs._panel_B_cap`` / ``_panel_jsync_cap`` and the
``_panel_geom`` cost model) are calibrated from measurement, not guesses.

Timing rule (ARCHITECTURE.md "measurement note"): this tunnel's
``block_until_ready`` is unreliable — every device timing ends with a tiny
value fetch (scalar ``np.asarray``), never a buffer fetch.

Usage:  python -m apsim_tpu.bench.panel_probe [n_rows] [--joins-only]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, flush=True)


def main() -> None:
    import jax.numpy as jnp

    from ..config import AllPairsConfig
    from ..engine.chunked import ChunkedAllPairs
    from .scale import synthetic_corpus

    n_rows = 500_000
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        n_rows = int(args[0])
    joins_only = "--joins-only" in sys.argv

    tau = 0.8
    t0 = time.time()
    csr = synthetic_corpus(n_rows)
    log(f"gen: {time.time() - t0:.1f}s nnz={int(csr.indptr[-1])}")

    eng = ChunkedAllPairs(AllPairsConfig())
    t0 = time.time()
    eng.build(csr)
    log(f"build: {time.time() - t0:.1f}s")

    geom = eng._panel_geom()
    rb, tm, tn, tk, n_panels, d_cap = geom
    slab_gb = rb * d_cap / (1 << 30)
    log(f"geom: rb={rb} tiles=({tm},{tn},{tk}) n_panels={n_panels} "
        f"d_cap={d_cap} slab={slab_gb:.2f} GiB")
    decided = n_rows * (n_rows - 1) / 2
    macs = (n_panels * rb) ** 2 / 2 * d_cap
    log(f"int8 MXU floor @394 TOPS: {macs / 394e12:.2f}s "
        f"({decided:.3g} decided pairs)")

    # -- join A/B under different sweep shapes ------------------------------
    def timed_join(label):
        t0 = time.time()
        res = eng.all_pairs(tau)
        dt = time.time() - t0
        log(f"join[{label}]: {dt:.2f}s pairs={res.n_pairs} "
            f"({decided / dt / 1e9:.2f} B pairs/s)")
        return dt

    timed_join("default warm-up")  # compiles; caps tighten
    timed_join("default")
    if not joins_only:
        state = eng._panel_state()

        # -- slab build cost (scalar-fetch synced) ---------------------------
        t0 = time.time()
        for p in range(n_panels):
            s = eng._build_slab(state, p)
        np.asarray(jnp.sum(s.astype(jnp.int32)))
        per_build = (time.time() - t0) / n_panels
        log(f"slab build: {per_build * 1e3:.1f} ms/panel "
            f"(x{n_panels} = {per_build * n_panels:.2f}s if serialized)")

        # -- one off-diagonal pair: kernel + epilogue latency ----------------
        xi = eng._build_slab(state, 0)
        xj = eng._build_slab(state, 1)
        caps = getattr(eng, "_panel_caps", None) or (8192, 1024, 1024)
        pack = n_panels * rb <= 65536
        for rep in range(3):
            t0 = time.time()
            bufs, packed = eng._op_panel_pair(
                state, xi, xj, 0, 1, np.float32(tau - 0.05), caps, pack
            )
            head = np.asarray(packed)
            dt = time.time() - t0
            pair_macs = rb * rb * d_cap
            log(f"pair(off-diag) rep{rep}: {dt * 1e3:.1f} ms "
                f"(MXU floor {pair_macs / 394e12 * 1e3:.1f} ms, "
                f"{pair_macs / dt / 1e12:.0f} TOPS achieved)")
        del xi, xj, bufs, packed

    slab_bytes = rb * d_cap
    keep_all = n_panels * slab_bytes <= eng._panel_resident_bytes
    log(f"mode: {'resident' if keep_all else 'rolling'}")
    if not keep_all:
        for B_cap, j_cap, label in (
            (6, 6, "B<=6 jsync<=6 (default)"),
            (8, 8, "B<=8 jsync<=8"),
            (3, 12, "B<=3 jsync<=12"),
            (12, 2, "B<=12 jsync<=2"),
        ):
            eng._panel_B_cap, eng._panel_jsync_cap = B_cap, j_cap
            timed_join(label)
        eng._panel_B_cap, eng._panel_jsync_cap = 6, 6
        # bigger panels: fewer pair programs + fewer slab rebuilds per
        # decided pair, at the cost of 2x slab HBM — the cost model picks
        # rb=65536 iff the per-pair overhead is near the 30 ms calibration
        if rb < 65536 and (n_panels * rb) % 65536 == 0:
            eng.panel_rows = 65536
            eng._panel_geom_cache = None
            eng._panel_state_cache = None
            g2 = eng._panel_geom()
            if g2 is not None:
                log(f"rb=65536 geom: {g2}")
                timed_join("rb=65536 warm-up")
                timed_join("rb=65536")
            eng.panel_rows = None
            eng._panel_geom_cache = None
            eng._panel_state_cache = None


if __name__ == "__main__":
    main()
