"""Block-codec roundtrip invariants (no Spark needed).

Models the reference's codec conformance suites
(test-framework BasePostingsFormatTestCase, core TestForUtil/TestPForUtil):
encode->decode == identity on random and adversarial posting lists.
"""

import numpy as np
import pytest

from lucene_spark.index.codec import (
    BLOCK_SIZE,
    decode_posting_list,
    encode_posting_list,
    varint_decode,
    varint_encode,
)


@pytest.mark.parametrize("seed", range(5))
def test_varint_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 5000))
    # spread across byte-length regimes incl. >32-bit values
    vals = rng.integers(0, 2 ** int(rng.integers(1, 62)), size=n, dtype=np.int64)
    assert (varint_decode(varint_encode(vals)) == vals).all()


def test_varint_edges():
    for vals in ([], [0], [127], [128], [16383], [16384], [2**62 - 1], [0] * 1000):
        a = np.array(vals, dtype=np.int64)
        out = varint_decode(varint_encode(a))
        assert out.tolist() == vals
    # single-byte fast path is compact
    assert len(varint_encode(np.arange(100) % 128)) == 100


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 1000, 10000])
def test_posting_list_roundtrip(n):
    rng = np.random.default_rng(n)
    doc_ids = np.sort(rng.choice(n * 50, size=n, replace=False)).astype(np.int64)
    freqs = rng.integers(1, 100, size=n, dtype=np.int64)
    norms = rng.integers(0, 256, size=n, dtype=np.int64)
    enc = encode_posting_list(doc_ids, freqs, norms)
    d, f, m = decode_posting_list(enc["docs_enc"], enc["freqs_enc"], enc["norms_enc"])
    assert (d == doc_ids).all()
    assert (f == freqs).all()
    assert (m == norms).all()
    # skip metadata: one entry per 128-block, impacts correct
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(enc["skip"]) == nblocks
    for bi, blk in enumerate(enc["skip"]):
        s, e = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, n)
        assert blk["last_doc"] == doc_ids[e - 1]
        assert blk["max_freq"] == freqs[s:e].max()
        assert blk["min_norm"] == norms[s:e].min()
        assert blk["n"] == e - s


@pytest.mark.parametrize("n", [1, 3, 128, 777])
def test_posting_list_roundtrip_with_positions(n):
    rng = np.random.default_rng(n + 7)
    doc_ids = np.sort(rng.choice(n * 10, size=n, replace=False)).astype(np.int64)
    freqs = rng.integers(1, 8, size=n, dtype=np.int64)
    norms = rng.integers(0, 256, size=n, dtype=np.int64)
    positions = [
        np.sort(rng.choice(500, size=int(f), replace=False)).astype(np.int64)
        for f in freqs
    ]
    enc = encode_posting_list(doc_ids, freqs, norms, positions)
    d, f, m, pos = decode_posting_list(
        enc["docs_enc"], enc["freqs_enc"], enc["norms_enc"], pos_enc=enc["pos_enc"]
    )
    assert (d == doc_ids).all() and (f == freqs).all() and (m == norms).all()
    assert len(pos) == n
    for got, want in zip(pos, positions):
        assert got.tolist() == want.tolist()


def test_adversarial_deltas():
    # huge gaps next to dense runs
    doc_ids = np.array([0, 1, 2, 3, 2**40, 2**40 + 1, 2**55], dtype=np.int64)
    freqs = np.array([1, 2**31, 1, 1, 7, 1, 1], dtype=np.int64)
    norms = np.array([0, 255, 24, 231, 1, 2, 3], dtype=np.int64)
    enc = encode_posting_list(doc_ids, freqs, norms)
    d, f, m = decode_posting_list(enc["docs_enc"], enc["freqs_enc"], enc["norms_enc"])
    assert (d == doc_ids).all() and (f == freqs).all() and (m == norms).all()


def test_compression_is_compact():
    # dense doc ids -> ~1 byte per delta
    doc_ids = np.arange(0, 100000, 2, dtype=np.int64)
    freqs = np.ones_like(doc_ids)
    norms = np.full_like(doc_ids, 10)
    enc = encode_posting_list(doc_ids, freqs, norms)
    assert len(enc["docs_enc"]) <= doc_ids.size + 16
    assert len(enc["freqs_enc"]) == doc_ids.size


@pytest.mark.parametrize("seed", range(4))
def test_decode_selected_blocks(seed):
    from lucene_spark.index.codec import decode_selected_blocks

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 2000))
    doc_ids = np.sort(rng.choice(n * 20, size=n, replace=False)).astype(np.int64)
    freqs = rng.integers(1, 50, size=n, dtype=np.int64)
    norms = rng.integers(0, 256, size=n, dtype=np.int64)
    enc = encode_posting_list(doc_ids, freqs, norms)
    nb = len(enc["skip"])
    keep = rng.random(nb) < 0.5
    d, f, m = decode_selected_blocks(
        enc["docs_enc"], enc["freqs_enc"], enc["norms_enc"], enc["skip"], keep
    )
    want = np.zeros(n, dtype=bool)
    for bi in range(nb):
        if keep[bi]:
            want[bi * BLOCK_SIZE : min((bi + 1) * BLOCK_SIZE, n)] = True
    assert (d == doc_ids[want]).all()
    assert (f == freqs[want]).all()
    assert (m == norms[want]).all()
