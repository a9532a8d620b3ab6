"""Span surface vs a brute-force minimal-interval oracle.

The oracle enumerates ALL sub-interval combinations per doc, forms the
windows, and keeps the minimal ones under containment — an independent
definition of minimal-interval semantics to check the transliterated
greedy iterators (Or / Containing / ContainedBy / spans adapters)."""

import random

import pytest

from lucene_spark.search import intervals as iv
from lucene_spark.search.intervals import NO_MORE, build_iter
from lucene_spark.search.spans import (
    SpanContainingQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
    SpanWithinQuery,
)


def emitted(src, pos):
    it = build_iter(src, pos)
    if it is None:
        return []
    out = []
    while it.next_interval() != NO_MORE:
        out.append((it.start, it.end))
    return out


def _minimal(windows):
    ws = sorted(set(windows))
    out = []
    for w in ws:
        if any(o != w and w[0] <= o[0] and o[1] <= w[1] for o in ws):
            continue
        out.append(w)
    return out


def brute(src, pos):
    """Minimal intervals by exhaustive combination + containment filter."""
    if isinstance(src, iv.Term):
        return [(p, p) for p in pos.get(src.term, [])]
    if isinstance(src, iv.Ordered):
        subs = [brute(s, pos) for s in src.sources]
        if any(not s for s in subs):
            return []
        wins = []

        def rec(i, start, prev_end):
            if i == len(subs):
                wins.append((start, prev_end))
                return
            for s, e in subs[i]:
                if s > prev_end:
                    rec(i + 1, start if start is not None else s, e)

        for s, e in subs[0]:
            rec(1, s, e)
        return _minimal(wins)
    if isinstance(src, iv.Unordered):
        subs = [brute(s, pos) for s in src.sources]
        if any(not s for s in subs):
            return []
        wins = []

        def rec(i, acc):
            if i == len(subs):
                wins.append((min(a for a, _ in acc), max(b for _, b in acc)))
                return
            for w in subs[i]:
                rec(i + 1, acc + [w])

        rec(0, [])
        return _minimal(wins)
    if isinstance(src, iv.Or):
        return _minimal([w for s in src.sources for w in brute(s, pos)])
    if isinstance(src, iv.Containing):
        bigs, smalls = brute(src.big, pos), brute(src.small, pos)
        return [b for b in bigs if any(b[0] <= s0 and s1 <= b[1] for s0, s1 in smalls)]
    if isinstance(src, iv.ContainedBy):
        bigs, smalls = brute(src.big, pos), brute(src.small, pos)
        return [s for s in smalls if any(b0 <= s[0] and s[1] <= b1 for b0, b1 in bigs)]
    if isinstance(src, iv.MaxGaps):
        # single-term subs only in these tests: gaps = width - n_terms
        n = len(src.source.terms())
        return [w for w in brute(src.source, pos) if (w[1] - w[0] + 1) - n <= src.gaps]
    if isinstance(src, iv.EndingBefore):
        return [w for w in brute(src.source, pos) if w[1] < src.end]
    raise TypeError(src)


def _rand_pos(rng, terms, doc_len):
    toks = [rng.choice(terms + ["filler"] * len(terms)) for _ in range(doc_len)]
    pos = {}
    for i, t in enumerate(toks):
        pos.setdefault(t, []).append(i)
    pos.pop("filler", None)
    return pos


@pytest.mark.parametrize("seed", range(30))
def test_or_iterator_matches_brute(seed):
    rng = random.Random(seed)
    pos = _rand_pos(rng, ["a", "b", "c"], rng.randint(3, 40))
    src = iv.or_(iv.ordered("a", "b"), "c")
    assert sorted(set(emitted(src, pos))) == sorted(brute(src, pos)), pos


@pytest.mark.parametrize("seed", range(30))
def test_containing_iterator_matches_brute(seed):
    rng = random.Random(seed)
    pos = _rand_pos(rng, ["a", "b", "c"], rng.randint(3, 40))
    src = iv.containing(iv.maxgaps(4, iv.ordered("a", "c")), iv.Term("b"))
    assert sorted(set(emitted(src, pos))) == sorted(brute(src, pos)), pos


@pytest.mark.parametrize("seed", range(30))
def test_contained_by_iterator_matches_brute(seed):
    rng = random.Random(seed)
    pos = _rand_pos(rng, ["a", "b", "c"], rng.randint(3, 40))
    src = iv.contained_by(iv.Term("b"), iv.maxgaps(6, iv.ordered("a", "c")))
    assert sorted(set(emitted(src, pos))) == sorted(brute(src, pos)), pos


@pytest.mark.parametrize("seed", range(40))
def test_span_near_matches_brute(seed):
    rng = random.Random(seed)
    pos = _rand_pos(rng, ["a", "b"], rng.randint(2, 50))
    for in_order in (True, False):
        q = SpanNearQuery(("a", "b"), slop=rng.randint(0, 4), in_order=in_order)
        src = q.to_source()
        assert sorted(set(emitted(src, pos))) == sorted(brute(src, pos)), (pos, in_order)


@pytest.mark.parametrize("seed", range(20))
def test_span_first_matches_brute(seed):
    rng = random.Random(seed)
    pos = _rand_pos(rng, ["a", "b"], rng.randint(2, 30))
    q = SpanFirstQuery(SpanNearQuery(("a", "b"), slop=2), end=rng.randint(1, 20))
    src = q.to_source()
    assert sorted(set(emitted(src, pos))) == sorted(brute(src, pos)), pos


def test_span_or_nested():
    pos = {"a": [0, 10], "b": [2, 12], "c": [5]}
    q = SpanOrQuery((SpanNearQuery(("a", "b"), slop=1), SpanTermQuery("c")))
    src = q.to_source()
    assert sorted(set(emitted(src, pos))) == sorted(brute(src, pos))


def test_span_within_containing_pair():
    pos = {"a": [0, 8], "c": [4, 12], "b": [2, 20]}
    big = SpanNearQuery(("a", "c"), slop=8)
    w = SpanWithinQuery(SpanTermQuery("b"), big)
    c = SpanContainingQuery(big, SpanTermQuery("b"))
    assert sorted(set(emitted(w.to_source(), pos))) == sorted(brute(w.to_source(), pos))
    assert sorted(set(emitted(c.to_source(), pos))) == sorted(brute(c.to_source(), pos))


def test_span_query_end_to_end(spark, tiny_index):
    """SpanNearQuery through the searcher: rewrite -> IntervalQuery rides
    the position-gather plan; equals the explicit IntervalQuery."""
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.query import IntervalQuery

    s = IndexSearcher(tiny_index)
    got = s.search(SpanNearQuery(("the", "model"), slop=2), 10).collect()
    want = s.search(
        IntervalQuery(iv.maxgaps(2, iv.ordered("the", "model"))), 10
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0


def test_span_not_query():
    """SpanNotQuery (spans/SpanNotQuery.java:47-71): include spans not
    overlapping (optionally pre/post-widened) exclude spans."""
    from lucene_spark.search.spans import SpanNotQuery, SpanTermQuery

    pos = {"a": [0, 4, 9], "b": [4]}
    q = SpanNotQuery(SpanTermQuery("a"), SpanTermQuery("b"))
    assert emitted(q.to_source(), pos) == [(0, 0), (9, 9)]
    q2 = SpanNotQuery(SpanTermQuery("a"), SpanTermQuery("b"), pre=3, post=3)
    assert emitted(q2.to_source(), pos) == [(0, 0), (9, 9)]
    q3 = SpanNotQuery(SpanTermQuery("a"), SpanTermQuery("b"), pre=5, post=5)
    assert emitted(q3.to_source(), pos) == []
    # exclude term absent from the doc: every include span emits
    assert emitted(q.to_source(), {"a": [1]}) == [(1, 1)]


def test_span_not_query_end_to_end(spark, tiny_index):
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.query import IntervalQuery
    from lucene_spark.search.spans import SpanNotQuery, SpanTermQuery

    s = IndexSearcher(tiny_index)
    q = SpanNotQuery(SpanTermQuery("model"), SpanTermQuery("the"), pre=1, post=1)
    got = s.search(q, 10).collect()
    want = s.search(
        IntervalQuery(iv.not_within("model", 1, "the")), 10
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0
