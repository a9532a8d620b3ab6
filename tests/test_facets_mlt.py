"""Facets, drill-sideways, MultiPhrase, MoreLikeThis, rescoring."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.search import IndexSearcher, Occur, BooleanQuery, PhraseQuery, TermQuery
from lucene_spark.search.facets import (
    drill_down,
    drill_sideways,
    facet_counts,
    range_facet_counts,
)
from lucene_spark.search.mlt import MoreLikeThis, rescore
from lucene_spark.search.query import MultiPhraseQuery


@pytest.fixture(scope="module")
def searcher(tiny_index):
    return IndexSearcher(tiny_index)


def test_facet_counts_match_brute_force(searcher, tiny_index):
    q = TermQuery("model")
    got = {r.value: r.n for r in facet_counts(searcher, q, "role").collect()}
    docs = {r.doc_id: r.role for r in tiny_index.docs.collect()}
    match_ids = {r.doc_id for r in searcher.scored(q).collect()}
    want = {}
    for d in match_ids:
        want[docs[d]] = want.get(docs[d], 0) + 1
    assert got == want


def test_range_facets(searcher):
    q = TermQuery("the")
    got = {r.bucket: r.n for r in range_facet_counts(searcher, q, "turn_idx", [0, 5, 10, 100]).collect()}
    assert sum(got.values()) == searcher.count(q)


def test_drill_down_and_sideways(searcher):
    q = TermQuery("the")
    dd = drill_down(searcher, q, {"role": "user"})
    assert dd.filter(F.col("role") != "user").count() == 0
    side = drill_sideways(searcher, q, {"role": "user"})
    # sideways counts for 'role' ignore the role filter == plain facet counts
    a = {r.value: r.n for r in side["role"].collect()}
    b = {r.value: r.n for r in facet_counts(searcher, q, "role").collect()}
    assert a == b


def test_multi_phrase_superset_of_phrases(searcher):
    """MultiPhrase(slot alts) matches the union of the concrete phrases and
    scores with the blended weight."""
    mp = MultiPhraseQuery((("the",), ("model", "data")))
    got = {r.doc_id for r in searcher.scored(mp).collect()}
    p1 = {r.doc_id for r in searcher.scored(PhraseQuery(("the", "model"))).collect()}
    p2 = {r.doc_id for r in searcher.scored(PhraseQuery(("the", "data"))).collect()}
    assert got == (p1 | p2)
    assert len(got) > 0


def test_multi_phrase_single_slot_equals_synonym_match(searcher):
    mp = MultiPhraseQuery((("model", "data"),))
    got = {r.doc_id for r in searcher.scored(mp).collect()}
    t1 = {r.doc_id for r in searcher.scored(TermQuery("model")).collect()}
    t2 = {r.doc_id for r in searcher.scored(TermQuery("data")).collect()}
    assert got == (t1 | t2)


def test_more_like_this(searcher, tiny_index):
    mlt = MoreLikeThis(searcher, min_term_freq=1, min_doc_freq=2, max_query_terms=5)
    q = mlt.like(0)
    clauses = q.clauses
    assert 0 < len(clauses) <= 5
    assert all(c.occur == Occur.SHOULD for c in clauses)
    hits = searcher.search(q, 10).collect()
    assert len(hits) > 0
    # the source document itself should rank among the hits
    assert any(r.doc_id == 0 for r in hits) or len(hits) == 10


def test_rescore(searcher):
    base = searcher.scored(TermQuery("the"))
    re = rescore(searcher, base, TermQuery("model"), weight=1.0, rescore_weight=2.0, k=5)
    rows = re.collect()
    assert len(rows) == 5
    # rescored docs containing 'model' must outrank pure-'the' docs of equal base
    base_scores = {r.doc_id: r.score for r in base.collect()}
    model_docs = {r.doc_id for r in searcher.scored(TermQuery("model")).collect()}
    for r in rows:
        if r.doc_id in model_docs:
            assert r.score > base_scores[r.doc_id]


def test_explain_matches_scored_value(searcher):
    """CheckHits.checkExplanations semantics: explanation value == the
    scored plan's value for the same doc."""
    from lucene_spark.search import BooleanQuery, Occur, TermQuery

    q = BooleanQuery.of(
        (TermQuery("model"), Occur.SHOULD), (TermQuery("data"), Occur.SHOULD)
    )
    top = searcher.search(q, 3).collect()
    for r in top:
        ex = searcher.explain(q, r.doc_id)
        assert ex["matched"]
        assert abs(ex["value"] - float(r.score)) < 1e-6
        assert any(d["matched"] for d in ex["details"])

    miss = searcher.explain(TermQuery("zzz-absent"), top[0].doc_id)
    assert not miss["matched"] and miss["value"] == 0.0

    notq = BooleanQuery.of(
        (TermQuery("model"), Occur.MUST), (TermQuery("model"), Occur.MUST_NOT)
    )
    assert not searcher.explain(notq, top[0].doc_id)["matched"]


def test_sampled_facet_counts(spark, tiny_index):
    from lucene_spark.search.facets import facet_counts, sampled_facet_counts

    s = IndexSearcher(tiny_index)
    exact = {r.value: r.n for r in facet_counts(s, TermQuery("the"), "role").collect()}
    est = {
        r.value: r.n_est
        for r in sampled_facet_counts(s, TermQuery("the"), "role", 0.5).collect()
    }
    assert set(est) <= set(exact)
    # estimates within a loose factor of the truth on the sampled dims
    for v, n in est.items():
        assert n <= exact[v] * 3 + 5


def test_all_groups_and_distinct_values(spark, tiny_index):
    from lucene_spark.search.facets import all_groups, distinct_values

    s = IndexSearcher(tiny_index)
    groups = {r.group for r in all_groups(s, TermQuery("model")).collect()}
    brute = {
        r.conv_id
        for r in s.scored(TermQuery("model"))
        .join(tiny_index.docs, "doc_id")
        .select("conv_id")
        .collect()
    }
    assert groups == brute and len(groups) > 0
    dv = {
        r.group: r.n_values
        for r in distinct_values(s, TermQuery("model"), "conv_id", "role").collect()
    }
    assert set(dv) == brute
    assert all(1 <= n <= 5 for n in dv.values())


def test_join_util(spark, tiny_index):
    from lucene_spark.search.facets import join_util

    s = IndexSearcher(tiny_index)
    fm = (
        s.scored(TermQuery("model"))
        .join(tiny_index.docs.select("doc_id", "conv_id"), "doc_id")
        .select("conv_id", "score")
    )
    convs = (
        tiny_index.docs.select("conv_id").distinct().withColumnRenamed("conv_id", "cid")
    )
    joined = join_util(fm, convs, "conv_id", "cid", score_mode="max").collect()
    brute = {}
    for r in fm.collect():
        brute[r.conv_id] = max(brute.get(r.conv_id, 0.0), r.score)
    assert {r.cid: r.score for r in joined} == pytest.approx(brute)


def test_to_child_block_join(spark, tiny_index):
    """ToChildBlockJoinQuery: children of matching parents emit with the
    PARENT's score; every turn of a matched conversation appears, no turn
    of an unmatched one does."""
    from pyspark.sql import functions as F

    from lucene_spark.search import IndexSearcher, TermQuery
    from lucene_spark.search.facets import to_child_block_join

    s = IndexSearcher(tiny_index)
    keys = tiny_index.docs.select("doc_id", "conv_id", "turn_idx")
    parents = (
        s.scored(TermQuery("model"))
        .join(keys, "doc_id")
        .groupBy("conv_id")
        .agg(F.max("score").alias("parent_score"))
    )
    out = to_child_block_join(parents, keys.select("conv_id", "turn_idx")).collect()
    pmap = {r.conv_id: r.parent_score for r in parents.collect()}
    turns = keys.select("conv_id", "turn_idx").collect()
    want = {
        (r.conv_id, r.turn_idx, pmap[r.conv_id]) for r in turns if r.conv_id in pmap
    }
    assert {(r.conv_id, r.turn_idx, r.parent_score) for r in out} == want
    assert len(out) > 0


def test_facet_sum(spark, tiny_index):
    """facet_sum: per-category sum of a doc expression over the match set
    equals the brute-force aggregation (association-facet analog)."""
    from lucene_spark.search import IndexSearcher, TermQuery
    from lucene_spark.search.facets import facet_sum

    searcher = IndexSearcher(tiny_index)
    q = TermQuery("model")
    got = {
        r.value: r.total
        for r in facet_sum(searcher, q, "role", "length * 2").collect()
    }
    match_ids = {r.doc_id for r in searcher.scored(q).select("doc_id").collect()}
    want = {}
    for r in tiny_index.docs.collect():
        if r.doc_id in match_ids:
            want[r.role] = want.get(r.role, 0) + r.length * 2
    assert got == want


def test_dynamic_range_facets(spark, tiny_index):
    """Equal-count dynamic ranges: bucket sizes differ by at most 1, cover
    the whole match set, and bucket bounds are non-overlapping ascending."""
    from lucene_spark.search import IndexSearcher, TermQuery
    from lucene_spark.search.facets import dynamic_range_facets

    searcher = IndexSearcher(tiny_index)
    q = TermQuery("the")
    rows = dynamic_range_facets(searcher, q, "length", 4).collect()
    total = searcher.scored(q).select("doc_id").distinct().count()
    assert sum(r.n for r in rows) == total
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.bucket + 1 == b.bucket
        assert a.lo <= a.hi <= b.lo <= b.hi


def test_doc_values_stats(spark):
    """DocValuesStats (misc/search/DocValuesStats.java): count counts
    matching docs WITH a value, missing counts the rest; variance is the
    population variance (variance/count, DocValuesStats.java:130-133)."""
    import math

    from pyspark.sql import functions as F

    from lucene_spark.fixtures import transcripts_df
    from lucene_spark.index import IndexBuilder
    from lucene_spark.search import IndexSearcher, TermQuery
    from lucene_spark.search.dvstats import (
        numeric_doc_values_stats,
        sorted_doc_values_stats,
    )

    base = transcripts_df(spark, n_convs=20, seed=11)
    # null the tool column on odd turns to exercise `missing`
    df = base.withColumn(
        "tool", F.when(F.col("turn_idx") % 2 == 0, F.col("tool"))
    )
    idx = IndexBuilder(num_segments=2).build(df)
    s = IndexSearcher(idx)
    q = TermQuery("model")
    matched = {r.doc_id for r in s._matches(q).collect()}
    docs = {r.doc_id: r for r in idx.docs.collect()}

    row = numeric_doc_values_stats(s, q, "length").collect()[0]
    vals = [docs[d].length for d in matched]
    assert row.field == "length"
    assert row["count"] == len(vals) and row.missing == 0
    assert row.vmin == min(vals) and row.vmax == max(vals)
    assert row.vsum == sum(vals)
    mean = sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / len(vals)
    assert row.mean == pytest.approx(mean)
    assert row.variance == pytest.approx(var)
    assert row.stdev == pytest.approx(math.sqrt(var))

    srow = sorted_doc_values_stats(s, q, "tool").collect()[0]
    tools = [docs[d].tool for d in matched if docs[d].tool is not None]
    assert srow["count"] == len(tools)
    assert srow.missing == len(matched) - len(tools)
    assert srow.vmin == min(tools) and srow.vmax == max(tools)


def test_group_facet_counts(tiny_index):
    """GroupFacetCollector: a group with many matching docs of the same
    facet value still counts once for that value."""
    from lucene_spark.search.facets import group_facet_counts

    s = IndexSearcher(tiny_index)
    q = TermQuery("model")
    matched = {r.doc_id for r in s._matches(q).collect()}
    docs = {r.doc_id: r for r in tiny_index.docs.collect()}
    want = {}
    for d in matched:
        r = docs[d]
        if r.role is not None:
            want.setdefault(r.role, set()).add(r.conv_id)
    got = {r.value: r.n_groups for r in group_facet_counts(s, q, "conv_id", "role").collect()}
    assert got == {v: len(g) for v, g in want.items()}

    # prefix filter
    got_p = {
        r.value: r.n_groups
        for r in group_facet_counts(s, q, "conv_id", "role", prefix="a").collect()
    }
    assert got_p == {v: len(g) for v, g in want.items() if v.startswith("a")}


def test_parent_children_block_join(tiny_index):
    """ParentChildrenBlockJoinQuery: children of exactly one parent block,
    scored by the child query."""
    from lucene_spark.search.facets import parent_children

    s = IndexSearcher(tiny_index)
    q = TermQuery("model")
    child_scores = {r.doc_id: float(r.score) for r in s.scored(q).collect()}
    docs = {r.doc_id: r for r in tiny_index.docs.collect()}
    convs = sorted({r.conv_id for r in docs.values()})
    parent = convs[1]
    got = parent_children(s, q, parent).collect()
    want = {d for d in child_scores if docs[d].conv_id == parent}
    assert {r.doc_id for r in got} == want
    for r in got:
        assert r.conv_id == parent
        assert float(r.score) == pytest.approx(child_scores[r.doc_id], rel=1e-6)


def test_range_facet_counts_overlapping(tiny_index):
    """LongRange facets: a doc counts in EVERY range containing it;
    inclusivity flags respected."""
    from lucene_spark.search.facets import range_facet_counts_ranges

    s = IndexSearcher(tiny_index)
    q = TermQuery("model")
    matched = {r.doc_id for r in s._matches(q).collect()}
    docs = {r.doc_id: r for r in tiny_index.docs.collect()}
    lens = [docs[d].length for d in matched]
    ranges = [
        ("a", 0, 20, True, True),
        ("b", 10, 40, True, False),
        ("c", 0, 10**6, True, False),
        ("excl", 10, 20, False, False),
    ]
    got = {
        r.label: r.n
        for r in range_facet_counts_ranges(s, q, "length", ranges).collect()
    }
    assert got == {
        "a": sum(1 for v in lens if 0 <= v <= 20),
        "b": sum(1 for v in lens if 10 <= v < 40),
        "c": len(lens),
        "excl": sum(1 for v in lens if 10 < v < 20),
    }
