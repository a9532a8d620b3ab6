"""Edge cases + skew bounds: empty corpora, empty texts, head-term skew."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures import transcripts_df
from lucene_spark.index import IndexBuilder
from lucene_spark.search import BooleanQuery, IndexSearcher, MatchAllDocsQuery, Occur, TermQuery


def test_empty_corpus(spark):
    empty = transcripts_df(spark, n_convs=1, seed=1).filter(F.lit(False))
    idx = IndexBuilder(num_segments=2).build(empty)
    assert idx.stats == {"max_doc": 0, "doc_count": 0, "sum_total_term_freq": 0}
    s = IndexSearcher(idx)
    assert s.search(TermQuery("x"), 5).count() == 0
    idx.unpersist_all()


def test_all_empty_texts(spark):
    df = transcripts_df(spark, n_convs=2, seed=1).withColumn("text", F.lit(""))
    idx = IndexBuilder(num_segments=2).build(df)
    assert idx.stats["doc_count"] == 0 and idx.stats["max_doc"] > 0
    s = IndexSearcher(idx)
    assert s.search(TermQuery("x"), 5).count() == 0
    # MatchAll still returns every doc (score = boost, no stats needed)
    assert s.count(MatchAllDocsQuery()) == idx.stats["max_doc"]
    idx.unpersist_all()


def test_head_term_skew_bounded_chunks(spark):
    """The north rule's explicit skew handling: a term occurring in EVERY doc
    must never form a group larger than the chunk doc-range, and the pruned
    plan must stay exact under that skew."""
    base = transcripts_df(spark, n_convs=30, seed=3)
    skewed = base.withColumn("text", F.concat(F.lit("thethe thethe "), F.col("text")))
    idx = IndexBuilder(num_segments=4).build(skewed).with_packed(chunk_bits=4)
    # every doc contains 'thethe' -> df == max_doc
    s = IndexSearcher(idx)
    dfs = s.term_doc_freqs(["thethe"])
    assert dfs["thethe"] == idx.stats["max_doc"]
    # chunk groups bounded by the doc-range width (the salt)
    mx = idx.packed.agg(F.max("doc_freq_chunk")).collect()[0][0]
    assert mx <= 16, f"chunk group {mx} exceeds 2^chunk_bits"
    n_chunks = idx.packed.filter(F.col("term") == "thethe").count()
    assert n_chunks >= idx.stats["max_doc"] // 16, "head term must spread across chunks"
    # pruned == unpruned under skew
    q = BooleanQuery.of(
        (TermQuery("thethe"), Occur.SHOULD), (TermQuery("model"), Occur.SHOULD)
    )
    a = [(r.rank, r.doc_id, r.score) for r in s.search(q, 10).collect()]
    b = [(r.rank, r.doc_id, r.score) for r in s.search(q, 10, prune=True).collect()]
    assert a == b
    idx.unpersist_all()


def test_round4_ops_edge_cases(spark):
    """Round-4 operators on degenerate inputs: zero-token docs classify by
    prior alone; sessionize/pack handle empty and single-row frames."""
    import math

    from lucene_spark.pipeline.classify import naive_bayes_classify
    from lucene_spark.pipeline.pack import pack_sequences
    from lucene_spark.pipeline.sessionize import session_stats, sessionize

    schema = "conv_id string, turn_idx int, role string, text string"
    train = spark.createDataFrame(
        [("t1", 0, "en", "alpha beta"), ("t2", 0, "en", "beta gamma"),
         ("t3", 0, "fr", "delta")],
        schema,
    )
    # zero-token test doc -> prior-only score, max-prior class wins ('en')
    test = spark.createDataFrame([("x", 0, None, "!!! ???")], schema)
    rows = naive_bayes_classify(train, test).collect()
    assert len(rows) == 1
    assert rows[0].assigned == "en"
    assert rows[0].log_score == pytest.approx(math.log(2) - math.log(3), rel=1e-9)

    ts_schema = "conv_id string, turn_idx int, ts timestamp"
    empty = spark.createDataFrame([], ts_schema)
    assert sessionize(empty).count() == 0
    assert session_stats(empty).count() == 0
    from datetime import datetime

    one = spark.createDataFrame([("c", 0, datetime(2024, 1, 1))], ts_schema)
    r = session_stats(one).collect()
    assert len(r) == 1 and r[0].n_turns == 1 and r[0].session_idx == 0

    pk_schema = "conv_id string, turn_idx int, n_tokens int"
    assert pack_sequences(spark.createDataFrame([], pk_schema), cap=10).count() == 0
    single = pack_sequences(
        spark.createDataFrame([("c", 0, 999)], pk_schema), cap=10
    ).collect()
    assert single[0].bin == 0  # oversized single row owns bin 0
