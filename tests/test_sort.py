"""Sort/SortField surface: field ordering, reverse, score mixing,
searchAfter paging — verified against a driver-side brute force over the
full match set."""

import pytest

from lucene_spark.search import IndexSearcher, Sort, SortField, TermQuery


@pytest.fixture(scope="module")
def searcher(tiny_index):
    return IndexSearcher(tiny_index)


def _brute(searcher, term, keyfuncs):
    """Full match set joined to doc fields, sorted by keyfuncs."""
    idx = searcher.index
    scored = searcher.scored(TermQuery(term))
    rows = (
        scored.join(
            idx.docs.select("doc_id", "conv_id", "turn_idx", "length"), "doc_id"
        )
    ).collect()
    return sorted(rows, key=keyfuncs)


def test_sort_by_field_asc(searcher):
    got = searcher.search_sorted(
        TermQuery("model"), 10, Sort.by(SortField("turn_idx"))
    ).collect()
    want = _brute(searcher, "model", lambda r: (r.turn_idx, r.doc_id))[:10]
    assert [(r.conv_id, r.turn_idx) for r in got] == [
        (r.conv_id, r.turn_idx) for r in want
    ]


def test_sort_by_field_reverse(searcher):
    got = searcher.search_sorted(
        TermQuery("model"), 10, Sort.by(SortField("turn_idx", reverse=True))
    ).collect()
    want = _brute(searcher, "model", lambda r: (-r.turn_idx, r.doc_id))[:10]
    assert [(r.conv_id, r.turn_idx) for r in got] == [
        (r.conv_id, r.turn_idx) for r in want
    ]


def test_sort_field_then_score(searcher):
    got = searcher.search_sorted(
        TermQuery("model"), 10,
        Sort.by(SortField("length"), SortField("score")),
    ).collect()
    want = _brute(searcher, "model", lambda r: (r.length, -r.score, r.doc_id))[:10]
    assert [(r.conv_id, r.turn_idx) for r in got] == [
        (r.conv_id, r.turn_idx) for r in want
    ]


def test_sort_relevance_matches_search(searcher):
    a = searcher.search(TermQuery("model"), 10).collect()
    b = searcher.search_sorted(TermQuery("model"), 10, Sort.relevance()).collect()
    assert [(r.conv_id, r.turn_idx, r.score) for r in a] == [
        (r.conv_id, r.turn_idx, r.score) for r in b
    ]


def test_search_after_pages_are_disjoint_and_ordered(searcher):
    srt = Sort.by(SortField("turn_idx"), SortField("score"))
    page1 = searcher.search_sorted(TermQuery("model"), 5, srt).collect()
    last = page1[-1]
    page2 = searcher.search_sorted(
        TermQuery("model"), 5, srt,
        search_after=(last.turn_idx, float(last.score), last.doc_id),
    ).collect()
    want = _brute(searcher, "model", lambda r: (r.turn_idx, -r.score, r.doc_id))[:10]
    got = [(r.conv_id, r.turn_idx) for r in page1 + page2]
    assert got == [(r.conv_id, r.turn_idx) for r in want]
    assert len({(r.conv_id, r.turn_idx) for r in page1 + page2}) == len(got)


def test_search_after_arity_check(searcher):
    with pytest.raises(ValueError):
        searcher.search_sorted(
            TermQuery("model"), 5, Sort.by(SortField("turn_idx")),
            search_after=(1,),
        )


def test_search_after_pages_through_null_region(spark, tiny_corpus):
    """Rows with NULL sort values sort last (nulls-last) and must still be
    reachable by search_after paging: page through the ENTIRE match set and
    assert the concatenation equals the full sorted order (ADVICE r02)."""
    from lucene_spark.fixtures import transcripts_df
    from lucene_spark.index import IndexBuilder
    from pyspark.sql import functions as F

    df = transcripts_df(spark, rows=tiny_corpus).withColumn(
        "ts",
        F.when(F.col("turn_idx") % 3 == 0, F.lit(None)).otherwise(F.col("ts")),
    )
    s = IndexSearcher(IndexBuilder(num_segments=2).build(df))
    srt = Sort.by(SortField("ts"))
    full = s.search_sorted(TermQuery("model"), 100000, srt).collect()
    assert any(r.ts is None for r in full), "corpus must exercise the null region"
    pages, after = [], None
    while True:
        page = s.search_sorted(TermQuery("model"), 7, srt, search_after=after).collect()
        if not page:
            break
        pages.extend(page)
        last = page[-1]
        after = (last.ts, last.doc_id)
    assert [(r.doc_id, r.ts) for r in pages] == [(r.doc_id, r.ts) for r in full]


def test_search_diversified(spark, tiny_index):
    """DiversifiedTopDocsCollector: at most max_per_key hits per key in the
    final top-k — equals brute force (per-key best m by (score desc, doc
    asc), then global top-k); max_per_key=inf degenerates to search()."""
    from lucene_spark.search import BooleanQuery, IndexSearcher, Occur, TermQuery

    searcher = IndexSearcher(tiny_index)
    q = BooleanQuery.of(
        (TermQuery("the"), Occur.SHOULD),
        (TermQuery("model"), Occur.SHOULD),
        (TermQuery("data"), Occur.SHOULD),
    )
    scored = {
        r.doc_id: r.score for r in searcher.scored(q).collect()
    }
    keys = {r.doc_id: r.conv_id for r in tiny_index.docs.collect()}

    for m in (1, 2):
        got = [
            (r.doc_id, r.conv_id, r.score)
            for r in searcher.search_diversified(q, 10, m).collect()
        ]
        by_key = {}
        for d in sorted(scored, key=lambda d: (-scored[d], d)):
            by_key.setdefault(keys[d], []).append(d)
        surv = [d for ds in by_key.values() for d in ds[:m]]
        want = sorted(surv, key=lambda d: (-scored[d], d))[:10]
        assert [g[0] for g in got] == want, m
        assert all(abs(g[2] - scored[g[0]]) < 1e-6 for g in got)
        per_key = {}
        for _, cid, _ in got:
            per_key[cid] = per_key.get(cid, 0) + 1
        assert max(per_key.values()) <= m

    # large cap == plain search
    a = [(r.doc_id,) for r in searcher.search_diversified(q, 10, 10**6).collect()]
    b = [(r.doc_id,) for r in searcher.search(q, 10).collect()]
    assert a == b
