"""doc_id assignment must be a pure function of the data.

Round-3 ADVICE: doc_id previously derived from monotonically_increasing_id
over a staged sort, so its value depended on physical partition layout and
on cached blocks never being recomputed.  The rewrite derives
``doc_id = conv_start(conv_id) + rank(turn_idx within conv)`` — these tests
pin the contract: identical ids regardless of input partitioning, dense
0..N-1, ordered by (conv_id, turn_idx), and contiguous balanced segments.

Reference analogue: deterministic docID remap on merge,
lucene/core/src/java/org/apache/lucene/index/DocIDMerger.java:73-83.
"""

import pytest


def _ids(spark, df, n_segments=4):
    from lucene_spark.index import IndexBuilder

    b = IndexBuilder(num_segments=n_segments)
    out = b.assign_doc_ids(df)
    return {
        (r.conv_id, r.turn_idx): (r.doc_id, r.segment)
        for r in out.select("conv_id", "turn_idx", "doc_id", "segment").collect()
    }


@pytest.fixture(scope="module")
def corpus_df(spark):
    from lucene_spark.fixtures import generate_transcripts, transcripts_df

    return transcripts_df(spark, rows=generate_transcripts(n_convs=40, seed=7))


def test_doc_ids_invariant_to_input_partitioning(spark, corpus_df):
    a = _ids(spark, corpus_df.repartition(1))
    b = _ids(spark, corpus_df.repartition(13, "role"))
    c = _ids(spark, corpus_df.orderBy("ts"))
    assert a == b == c


def test_doc_ids_dense_and_ordered(spark, corpus_df):
    ids = _ids(spark, corpus_df)
    n = len(ids)
    doc_ids = sorted(d for d, _ in ids.values())
    assert doc_ids == list(range(n))
    # doc_id order == (conv_id, turn_idx) order: index sorting, SURVEY §2.5
    by_key = sorted(ids.items())
    assert [d for _, (d, _) in by_key] == list(range(n))


def test_segments_contiguous_and_balanced(spark, corpus_df):
    ids = _ids(spark, corpus_df, n_segments=4)
    n = len(ids)
    segs = {}
    for doc_id, seg in ids.values():
        segs.setdefault(seg, []).append(doc_id)
    assert set(segs) == {0, 1, 2, 3}
    lo = 0
    for s in sorted(segs):
        block = sorted(segs[s])
        assert block == list(range(lo, lo + len(block)))
        lo += len(block)
        assert len(block) >= n // 4 - 1  # balanced within rounding
    assert lo == n


def test_doc_ids_stable_across_recompute(spark, corpus_df):
    """Re-evaluating the same output relation twice gives the same ids —
    no hidden dependence on a one-shot physical artifact."""
    from lucene_spark.index import IndexBuilder

    out = IndexBuilder(num_segments=4).assign_doc_ids(corpus_df)
    first = {(r.conv_id, r.turn_idx): r.doc_id for r in out.collect()}
    second = {(r.conv_id, r.turn_idx): r.doc_id for r in out.collect()}
    assert first == second
