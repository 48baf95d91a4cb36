"""Triangle-vs-rectangle accounting for the XLA all-pairs join.

VERDICT r4 item #8: the dims-sharded mesh join scores the upper TRIANGLE
via <=16 static-prefix buckets (ops/score.py:allpairs_extract mode="upper",
commit 4d349ff) instead of the full rectangle every tile — claimed ~1/2 the
MXU work and, with the contracting dim sharded, ~1/2 the psum bytes per
device.  This probe turns that claim into a measured artifact:

1. **parity** (tiny corpus, executed): mode="upper" emits exactly the
   canonical i<j pair set of mode="all";
2. **per-device accounting** (representative size): analytic matmul flops
   and psum traffic for both modes — each tile's matmul is
   ``prefix x (dim_cap / n_dev) x tile`` per device and its partial
   [prefix, tile] fp32 product is all-reduced across the dim shards;
   mode="all" has ``prefix == row_cap`` for every tile.  (Analytic, not
   ``cost_analysis()``: XLA's cost model counts a ``fori_loop`` body ONCE
   regardless of trip count, which undercounts the rectangle's single
   8-tile loop vs the triangle's per-bucket loops — measured 4.5x the
   WRONG way before this probe switched to the closed form.)
3. **executed wall-time A/B** on the dims-sharded mesh (8 virtual CPU
   devices by default, so psum and partitioning really run); with
   ``--tpu``, on the real chip single-device (timed with a value fetch
   per the tunnel timing rule).

Reference contract: the join the triangle halves is the hot loop of
IndexingWorkerActor.scala:74-111 (which deduplicates i<j pairs per query
via hash maps — the reference never materializes the rectangle either).

Usage: python -m apsim_tpu.bench.tri_probe [row_cap] [dim_cap] [--tpu]
"""

from __future__ import annotations

import json
import os
import sys
import time


def _pairs(bufs, packed, mode):
    import numpy as np

    from ..ops import score as score_ops

    rows, cols, count, _ = score_ops.unpack_head(np.asarray(packed))
    assert count <= rows.size, "probe cap overflowed; raise cap"
    s = set(zip(rows.tolist(), cols.tolist()))
    if mode == "all":  # canonicalize: drop self, fold symmetric
        s = {(min(i, j), max(i, j)) for i, j in s if i != j}
    return s


def main() -> None:
    on_tpu = "--tpu" in sys.argv
    if not on_tpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
    import jax

    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..ops import score as score_ops

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    row_cap = int(args[0]) if args else 8192
    dim_cap = int(args[1]) if len(args) > 1 else 16384
    tile = 1024
    cap = 1 << 18
    report: dict = {"row_cap": row_cap, "dim_cap": dim_cap, "tile": tile}

    # ---- leg 1: executed parity at a tiny size (square vs triangle) ----
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((1024, 512)).astype(np.float32)
    xs /= np.linalg.norm(xs, axis=1, keepdims=True)
    xs_d = jnp.asarray(xs)
    tau = jnp.float32(0.1)
    got = {
        m: _pairs(*score_ops.allpairs_extract(
            xs_d, tau, 256, cap, m, "highest", 8), m)
        for m in ("all", "upper")
    }
    report["parity"] = {
        "n_pairs": len(got["upper"]),
        "equal": got["upper"] == got["all"],
    }
    assert report["parity"]["equal"], "triangle lost pairs vs rectangle"

    # ---- leg 2: analytic per-device accounting at the requested size ----
    devs = jax.devices()
    n_dev = len(devs)
    n_tiles = row_cap // tile
    n_buckets = min(n_tiles, 16)
    bounds = [n_tiles * b // n_buckets for b in range(n_buckets + 1)]
    # per tile in bucket b: prefix = bounds[b+1]*tile rows scored
    pref_rows_upper = sum(
        (bounds[b + 1] - bounds[b]) * bounds[b + 1] * tile
        for b in range(n_buckets)
    )  # in units of tiles*rows
    pref_rows_all = n_tiles * row_cap
    dim_local = dim_cap // n_dev
    per_mode = {
        m: {
            "matmul_flops_per_device": 2 * pr * tile * dim_local,
            "psum_bytes_per_device": (
                pr * tile * 4 if n_dev > 1 else 0
            ),
        }
        for m, pr in (("all", pref_rows_all), ("upper", pref_rows_upper))
    }
    report["modes"] = per_mode
    report["flops_ratio_upper_vs_all"] = round(
        pref_rows_upper / pref_rows_all, 4
    )
    report["n_devices"] = n_dev

    # ---- leg 3: executed wall-time A/B ----
    if on_tpu:
        wr, wd, wt = row_cap, dim_cap, tile  # real MXU: full size
    else:
        # single host core runs all 8 virtual devices — keep it ~100 GFLOP
        wr, wd, wt = min(row_cap, 4096), min(dim_cap, 4096), 512
    x = rng.standard_normal((wr, wd)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-9
    tau = jnp.float32(0.8)
    wall = {}
    for mode in ("all", "upper"):
        if on_tpu:
            fn = lambda x, t, m=mode: score_ops.allpairs_extract(
                x, t, wt, cap, m, "default", 8
            )
            x_d = jnp.asarray(x)
        else:
            mesh = Mesh(np.array(devs), ("shards",))
            shard = NamedSharding(mesh, P(None, "shards"))
            fn = jax.jit(
                lambda x, t, m=mode: score_ops.allpairs_extract(
                    x, t, wt, cap, m, "default", 8
                ),
                in_shardings=(shard, None),
            )
            x_d = jax.device_put(x, shard)
        _, packed = fn(x_d, tau)
        np.asarray(packed)  # compile + first run
        ts = []
        for _ in range(5):
            t0 = time.time()
            _, packed = fn(x_d, tau)
            np.asarray(packed)  # tunnel rule: time with a value fetch
            ts.append(time.time() - t0)
        wall[mode] = round(sorted(ts)[2] * 1e3, 1)
    report["wall_ms"] = {
        "backend": jax.default_backend(),
        "shape": [wr, wd], "tile": wt, **wall,
    }
    report["wall_speedup_upper_vs_all"] = round(
        wall["all"] / wall["upper"], 3
    )

    print(json.dumps(report, indent=1), flush=True)


if __name__ == "__main__":
    main()
