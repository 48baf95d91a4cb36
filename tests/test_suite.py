"""The benchmark suite itself must run green on a small corpus (it carries
its own parity checks — this is the BASELINE.json config coverage)."""

import numpy as np

from apsim_tpu.bench.suite import run_suite

from oracle import random_sparse_corpus


def test_suite_small():
    rng = np.random.default_rng(17)
    csr = random_sparse_corpus(rng, 96, 300)
    ids = [str(i) for i in range(csr.n_rows)]
    report = run_suite(
        csr, ids, taus=(0.5, 0.7),
        stream_batch=17, topk_queries=8, mesh=True,
    )
    for tau, entry in report["threshold_sweep"].items():
        assert entry["parity_full"], tau
    assert report["streaming"]["equals_batch_join"]
    assert report["topk"]["self_match_rate"] == 1.0
    assert report["mesh"]["matches_single_device"]
    assert report["mesh"]["devices"] == 8
    # the CC_WEB loadgen leg ran end-to-end (no swallowed error)
    lg = report["ccweb_loadgen"]
    assert "error" not in lg, lg
    assert lg["messages"] > 0 and lg["avg_latency_ms"] > 0
    assert lg["indexed_after_warmup"] == lg["fixture_vectors"]


def test_lint_clean():
    """tools/lint.py (the scalastyle analog) must stay clean — run it as
    part of the suite so a regression can't land silently."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "lint.py")],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stdout[-3000:]
