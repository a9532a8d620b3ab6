"""AllGroupHeadsCollector (grouping/AllGroupHeadsCollector.java) and
DocValuesTermsQuery (queries/DocValuesTermsQuery.java)."""

import pytest

from pyspark.sql import functions as F


def test_all_group_heads_relevance(spark, tiny_index):
    from lucene_spark.search import IndexSearcher, TermQuery
    from lucene_spark.search.facets import all_group_heads

    s = IndexSearcher(tiny_index, scoring="plain_f64")
    q = TermQuery("model")
    heads = {
        r.group: (r.doc_id, r.score)
        for r in all_group_heads(s, q, "conv_id").collect()
    }
    # brute force: per conv, best (score desc, doc_id asc)
    scored = s.scored(q).join(
        tiny_index.docs.select("doc_id", "conv_id"), "doc_id"
    )
    best = {}
    for r in scored.collect():
        cur = best.get(r.conv_id)
        if cur is None or (-r.score, r.doc_id) < (-cur[1], cur[0]):
            best[r.conv_id] = (r.doc_id, r.score)
    assert heads == best
    assert len(heads) > 1


def test_all_group_heads_sort(spark, tiny_index):
    from lucene_spark.search import IndexSearcher, Sort, SortField, TermQuery
    from lucene_spark.search.facets import all_group_heads

    s = IndexSearcher(tiny_index, scoring="plain_f64")
    q = TermQuery("model")
    heads = {
        r.group: r.doc_id
        for r in all_group_heads(
            s, q, "conv_id", sort=Sort((SortField("turn_idx", reverse=True),))
        ).collect()
    }
    scored = s.scored(q).join(
        tiny_index.docs.select("doc_id", "conv_id", "turn_idx"), "doc_id"
    )
    best = {}
    for r in scored.collect():
        cur = best.get(r.conv_id)
        if cur is None or (-r.turn_idx, r.doc_id) < (-cur[1], cur[0]):
            best[r.conv_id] = (r.doc_id, r.turn_idx)
    assert heads == {k: v[0] for k, v in best.items()}


def test_doc_values_terms_query(spark, tiny_index):
    from lucene_spark.search import (
        BooleanQuery,
        IndexSearcher,
        Occur,
        TermQuery,
    )
    from lucene_spark.search.query import DocValuesTermsQuery

    s = IndexSearcher(tiny_index, scoring="plain_f64")
    roles = ("user", "assistant")
    dv = DocValuesTermsQuery("role", roles)
    got = {r.doc_id for r in s._matches(dv).collect()}
    exp = {
        r.doc_id
        for r in tiny_index.docs.filter(F.col("role").isin(*roles)).collect()
    }
    assert got == exp and got
    # composes as a FILTER clause: scores must equal the bare term query's
    q = BooleanQuery.of(
        (TermQuery("model"), Occur.MUST), (dv, Occur.FILTER)
    )
    filtered = {
        (r.doc_id, r.score) for r in s.scored(q).collect()
    }
    bare = {
        (r.doc_id, r.score)
        for r in s.scored(TermQuery("model")).collect()
        if r.doc_id in exp
    }
    assert filtered == bare


def test_doc_values_terms_const_score(spark, tiny_index):
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.query import DocValuesTermsQuery

    s = IndexSearcher(tiny_index, scoring="plain_f64")
    rows = s.scored(DocValuesTermsQuery("role", ("user",), boost=2.5)).collect()
    assert rows and all(r.score == 2.5 for r in rows)
