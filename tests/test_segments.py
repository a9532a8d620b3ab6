"""Packed-segment roundtrip: pack -> unpack == logical postings.

≙ the reference's codec conformance suites applied through the full Spark
path (BasePostingsFormatTestCase semantics over the chunked table format).
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def packed(tiny_index):
    from lucene_spark.index.segments import pack_postings

    # tiny chunk_bits so the fixture corpus actually exercises multi-chunk terms
    return pack_postings(tiny_index.postings, chunk_bits=5).cache()


def test_pack_unpack_roundtrip(tiny_index, packed):
    from lucene_spark.index.segments import unpack_postings

    logical = tiny_index.postings.select("term", "doc_id", "freq", "norm")
    unpacked = unpack_postings(packed).select("term", "doc_id", "freq", "norm")
    only_l = logical.exceptAll(unpacked).count()
    only_u = unpacked.exceptAll(logical).count()
    assert only_l == 0 and only_u == 0


def test_pack_unpack_positions_roundtrip(tiny_index, packed):
    from lucene_spark.index.segments import unpack_postings

    logical = tiny_index.postings.select("term", "doc_id", "positions")
    unpacked = unpack_postings(packed, with_positions=True).select(
        "term", "doc_id", "positions"
    )
    joined = logical.alias("l").join(
        unpacked.alias("u"), ["term", "doc_id"], "full"
    )
    bad = joined.filter(
        F.col("l.positions").isNull()
        | F.col("u.positions").isNull()
        | (F.col("l.positions") != F.col("u.positions"))
    ).count()
    assert bad == 0


def test_chunk_alignment_and_metadata(tiny_index, packed):
    rows = packed.collect()
    assert rows, "packed table is empty"
    for r in rows:
        assert r.first_doc >> 5 == r.chunk, "first_doc outside chunk range"
        assert r.last_doc >> 5 == r.chunk, "last_doc outside chunk range"
        assert r.first_doc <= r.last_doc
        # chunk metadata agrees with skip blocks
        assert r.max_freq == max(b.max_freq for b in r.skip)
        assert r.min_norm == min(b.min_norm for b in r.skip)
        assert r.last_doc == r.skip[-1].last_doc
        assert sum(b.n for b in r.skip) == r.doc_freq_chunk


def test_chunk_doc_freqs_sum_to_term_stats(tiny_index, packed):
    per_term = packed.groupBy("term").agg(
        F.sum("doc_freq_chunk").alias("df2"), F.max("max_freq").alias("mf2")
    )
    joined = tiny_index.term_stats.join(per_term, "term", "full")
    bad = joined.filter(
        (F.col("doc_freq") != F.col("df2")) | (F.col("max_freq") != F.col("mf2"))
    ).count()
    assert bad == 0


def test_mapside_equals_shuffle_invert(spark, tiny_corpus):
    """All three invert strategies must produce identical postings (the
    per-doc in-memory inversion is Lucene's own IndexingChain design; the
    arrow path must match the pure-JVM expression chain byte-for-byte)."""
    from lucene_spark.fixtures import transcripts_df
    from lucene_spark.index import IndexBuilder

    df = transcripts_df(spark, rows=tiny_corpus)
    a = IndexBuilder(num_segments=4, invert="mapside").build(df)
    b = IndexBuilder(num_segments=4, invert="shuffle").build(df)
    c = IndexBuilder(num_segments=4, invert="arrow").build(df)
    cols = ["term", "doc_id", "freq", "positions", "norm"]
    for x, y in ((a, b), (a, c)):
        assert x.postings.select(cols).exceptAll(y.postings.select(cols)).count() == 0
        assert y.postings.select(cols).exceptAll(x.postings.select(cols)).count() == 0
        assert x.stats == y.stats


def test_arrow_invert_matches_mapside_with_analyzer(spark, tiny_corpus):
    """The Arrow tokenize+invert pass must agree with the JVM expression
    chain under a full analysis chain (stop holes + Porter deferral)."""
    from lucene_spark.analysis import Analyzer
    from lucene_spark.fixtures import transcripts_df
    from lucene_spark.index import IndexBuilder

    df = transcripts_df(spark, rows=tiny_corpus)
    an = Analyzer(stopwords=("the", "a", "to"), stemmer="porter")
    a = IndexBuilder(num_segments=4, invert="mapside", analyzer=an).build(df)
    c = IndexBuilder(num_segments=4, invert="arrow", analyzer=an).build(df)
    cols = ["term", "doc_id", "freq", "positions", "norm"]
    assert a.postings.select(cols).exceptAll(c.postings.select(cols)).count() == 0
    assert c.postings.select(cols).exceptAll(a.postings.select(cols)).count() == 0
    assert a.stats == c.stats
