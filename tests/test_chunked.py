"""Chunked-sparse batch join: exact parity without a resident dense index."""

import numpy as np
import pytest

from apsim_tpu import AllPairsConfig
from apsim_tpu.engine import ChunkedAllPairs

from oracle import brute_force_pairs, random_sparse_corpus

DIM = 500


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(23)
    return random_sparse_corpus(rng, 220, DIM)


def test_chunked_matches_oracle(corpus):
    eng = ChunkedAllPairs(
        AllPairsConfig(
            vector_dim=DIM, query_tile=64, row_bucket=64, dim_bucket=64
        ),
        chunk_dim=128,
    )
    stats = eng.build(corpus)
    assert stats["n_chunks"] >= 2  # actually exercises the chunk loop
    for tau in (0.3, 0.5, 0.7):
        assert eng.all_pairs(tau).pair_set() == brute_force_pairs(corpus, tau)


def test_chunked_matches_dense_engine(corpus):
    from apsim_tpu import Engine

    cfg = AllPairsConfig(
        vector_dim=DIM, query_tile=64, row_bucket=64, dim_bucket=64
    )
    dense = Engine(cfg)
    dense.build(corpus)
    chunked = ChunkedAllPairs(cfg, chunk_dim=256)
    chunked.build(corpus)
    assert chunked.all_pairs(0.4).pair_set() == dense.all_pairs(0.4).pair_set()


def test_chunked_single_chunk(corpus):
    # chunk_dim >= active dims: degenerates to one dense chunk
    eng = ChunkedAllPairs(
        AllPairsConfig(
            vector_dim=DIM, query_tile=64, row_bucket=64, dim_bucket=64
        ),
        chunk_dim=1024,
    )
    stats = eng.build(corpus)
    assert stats["n_chunks"] == 1
    assert eng.all_pairs(0.5).pair_set() == brute_force_pairs(corpus, 0.5)


def test_chunked_topk(corpus):
    from oracle import brute_force_sims

    eng = ChunkedAllPairs(
        AllPairsConfig(
            vector_dim=DIM, query_tile=64, row_bucket=64, dim_bucket=64
        ),
        chunk_dim=128,
    )
    eng.build(corpus)
    queries = [(f"q{i}", corpus.row(i)) for i in range(5)]
    res = eng.topk(queries, 4)
    sims = brute_force_sims(corpus)
    for qi in range(5):
        got = np.array([s for _, s in res[f"q{qi}"]])
        want = np.sort(sims[qi])[::-1][:4]
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_chunked_overflow_retry(corpus):
    eng = ChunkedAllPairs(
        AllPairsConfig(
            vector_dim=DIM, query_tile=64, row_bucket=64, dim_bucket=64,
            extract_cap=8,
        ),
        chunk_dim=128,
    )
    eng.build(corpus)
    got = eng.all_pairs(0.3).pair_set()
    assert got == brute_force_pairs(corpus, 0.3)
    assert len(got) > 8
