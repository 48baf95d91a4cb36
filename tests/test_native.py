"""Native C++ helpers: bit parity with the pure-Python paths."""

import zlib

import numpy as np
import pytest

import apsim_tpu.native as N
from apsim_tpu.etl.tfidf import hashing_tf
from apsim_tpu.vector.batch import CSRMatrix, PaddedBatch
from apsim_tpu.vector.sparse import Vectors

DOCS = [
    "hello world hello",
    "  tabs\tand\nnewlines\r\nmixed   spacing  ",
    "",
    "unicode café naïve 中文 tokens",
    "single",
]


@pytest.fixture
def native_lib():
    lib = N.get_lib()
    if lib is None:
        pytest.skip("no native toolchain")
    return lib


def _python_tf(docs, nf):
    saved_lib, saved_tried = N._lib, N._tried
    N._lib, N._tried = None, True
    try:
        return hashing_tf(docs, nf)
    finally:
        N._lib, N._tried = saved_lib, saved_tried


def test_crc32_parity(native_lib):
    for s in [b"", b"a", b"hello world", "café".encode()]:
        assert N.crc32(s) == zlib.crc32(s)


def test_hash_corpus_bit_parity(native_lib):
    nf = 1 << 16
    ip, ix, vv = N.hash_corpus(DOCS, nf)
    py = _python_tf(DOCS, nf)
    np.testing.assert_array_equal(ip, py.indptr)
    np.testing.assert_array_equal(ix, py.indices)
    np.testing.assert_array_equal(vv, py.data)


def test_hash_corpus_cap_retry(native_lib):
    # tiny initial cap exercised internally by doubling; result identical
    big = ["tok%d" % i for i in range(5000)]
    docs = [" ".join(big)]
    ip, ix, vv = N.hash_corpus(docs, 1 << 20)
    assert ip[-1] == len(ix) == len(vv)
    assert vv.sum() == 5000


def test_pad_batch_parity(native_lib):
    vecs = [
        Vectors.sparse(32, [0, 5, 9], [1.0, 2.0, 3.0]),
        Vectors.sparse(32, [], []),
        Vectors.sparse(32, [31], [4.0]),
    ]
    csr = CSRMatrix.from_vectors(vecs, 32)
    b_native = PaddedBatch.from_csr(csr, pad_dim=32, k=8)
    saved_lib, saved_tried = N._lib, N._tried
    N._lib, N._tried = None, True
    try:
        b_py = PaddedBatch.from_csr(csr, pad_dim=32, k=8)
    finally:
        N._lib, N._tried = saved_lib, saved_tried
    np.testing.assert_array_equal(b_native.dims, b_py.dims)
    np.testing.assert_array_equal(b_native.vals, b_py.vals)
    np.testing.assert_array_equal(b_native.lengths, b_py.lengths)


def test_transfer_throttled_copy(tmp_path):
    from apsim_tpu.etl.transfer import copy_tree, throttled_copy

    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "a.bin").write_bytes(b"x" * 100_000)
    (src / "sub" / "b.bin").write_bytes(b"y" * 50_000)
    jobs = copy_tree(str(src), str(tmp_path / "dst"), max_bytes_per_sec=0)
    assert len(jobs) == 2
    assert (tmp_path / "dst" / "a.bin").read_bytes() == b"x" * 100_000
    assert (tmp_path / "dst" / "sub" / "b.bin").read_bytes() == b"y" * 50_000
    # no leftover temp files (atomic rename)
    leftovers = [
        p for p in (tmp_path / "dst").rglob("*") if "_COPYING_" in p.name
    ]
    assert not leftovers
