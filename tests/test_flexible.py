"""StandardQueryParser (flexible dialect): fn: intervals, (…)@N, points.

Parse-shape cases ported from
``queryparser/flexible/standard/TestStandardQPEnhancements.java`` (every
checkIntervalQueryNode string), min-should-match from
``testMinShouldMatchOperator``, points behavior per
``TestPointQueryParser.java``.
"""

import pytest

from lucene_spark.search import intervals as I
from lucene_spark.search.flexible import StandardQueryParser
from lucene_spark.search.parser import QueryParseError
from lucene_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    IntervalQuery,
    Occur,
    RangePredicate,
    TermQuery,
    TermRangeQuery,
)


def _p(**kw):
    return StandardQueryParser(points_config={"length": int, "turn_idx": int}, **kw)


def _src(s: str, **kw):
    q = _p(**kw).parse(s)
    assert isinstance(q, IntervalQuery), q
    return q.source


# -- TestStandardQPEnhancements.checkIntervalQueryNode strings ---------------


def test_ordered_unordered_or():
    assert _src("fn:ordered(foo BAR baz)") == I.ordered("foo", "bar", "baz")
    assert _src("fn:unordered(foo BAR baz)") == I.unordered("foo", "bar", "baz")
    assert _src("fn:or(foo baz)") == I.or_("foo", "baz")


def test_atleast():
    assert _src("fn:atleast(3 FOO BAR baz)") == I.atleast(3, "foo", "bar", "baz")
    assert _src("fn:maxwidth(3 fn:atleast(2 foo bar baz))") == I.maxwidth(
        3, I.atleast(2, "foo", "bar", "baz")
    )
    # quoted analyzed text: "BAR baz" becomes a phrase block
    assert _src('fn:atleast(2 "foo" "BAR baz")') == I.atleast(
        2, I.Term("foo"), I.phrase("bar", "baz")
    )


def test_maxgaps_maxwidth():
    assert _src("fn:maxgaps(2 fn:unordered(foo BAR baz))") == I.maxgaps(
        2, I.unordered("foo", "bar", "baz")
    )


def test_phrase_fn():
    assert _src("fn:phrase(abc def fn:or(baz boo))") == I.phrase(
        I.Term("abc"), I.Term("def"), I.or_("baz", "boo")
    )


def test_before_after():
    assert _src("fn:before(abc fn:ordered(foo bar))") == I.before_(
        I.Term("abc"), I.ordered("foo", "bar")
    )
    assert _src("fn:after(abc fn:ordered(foo bar))") == I.after_(
        I.Term("abc"), I.ordered("foo", "bar")
    )


def test_containment_zoo():
    assert _src("fn:containing(big small)") == I.containing("big", "small")
    assert _src("fn:containedBy(small big)") == I.contained_by("small", "big")
    assert _src("fn:notContaining(minuend subtrahend)") == I.not_containing(
        "minuend", "subtrahend"
    )
    assert _src("fn:notContainedBy(small big)") == I.not_contained_by("small", "big")
    assert _src("fn:within(small 2 fn:ordered(big foo))") == I.within(
        I.Term("small"), 2, I.ordered("big", "foo")
    )
    assert _src("fn:notWithin(small 2 fn:ordered(big foo))") == I.not_within(
        I.Term("small"), 2, I.ordered("big", "foo")
    )
    assert _src("fn:overlapping(fn:ordered(big foo) small)") == I.overlapping(
        I.ordered("big", "foo"), I.Term("small")
    )
    assert _src("fn:nonOverlapping(fn:ordered(big foo) small)") == I.non_overlapping(
        I.ordered("big", "foo"), I.Term("small")
    )
    assert _src("fn:unorderedNoOverlaps(fn:ordered(big foo) small)") == (
        I.unordered_no_overlaps(I.ordered("big", "foo"), I.Term("small"))
    )


def test_extend_fn():
    assert _src("fn:extend(fn:ordered(big foo) 2 5)") == I.extend(
        I.ordered("big", "foo"), 2, 5
    )


def test_field_prefix_and_boost():
    q = _p().parse("text:fn:ordered(foo bar)^2")
    assert isinstance(q, BoostQuery) and q.boost == 2.0
    assert isinstance(q.query, IntervalQuery)
    with pytest.raises(QueryParseError):
        _p().parse("other:fn:ordered(foo bar)")


def test_fn_composes_in_boolean():
    q = _p().parse("+fn:ordered(foo bar) -baz")
    assert isinstance(q, BooleanQuery)
    occs = {c.occur for c in q.clauses}
    assert occs == {Occur.MUST, Occur.MUST_NOT}


def test_fn_errors():
    for bad in [
        "fn:bogus(a b)",
        "fn:ordered",
        "fn:ordered(",
        "fn:maxgaps(x fn:ordered(a b))",
        "fn:within(a b c)",
        "fn:ordered()",
    ]:
        with pytest.raises(QueryParseError):
            _p().parse(bad)


# -- min-should-match groups -------------------------------------------------


def test_min_should_match_operator():
    q = _p().parse("(foo OR bar OR baz)@2")
    assert isinstance(q, BooleanQuery)
    assert q.min_should_match == 2
    assert len(q.clauses) == 3


def test_min_should_match_with_boost():
    q = _p().parse("(foo bar baz)^2@2")
    assert isinstance(q, BoostQuery) and q.boost == 2.0
    assert q.query.min_should_match == 2
    q2 = _p().parse("(foo bar baz)^2 @2")
    assert q2 == q


def test_min_should_match_requires_group():
    with pytest.raises(QueryParseError):
        _p()._apply_msm(TermQuery("foo"), 2)


# -- points config -----------------------------------------------------------


def test_point_exact_and_range():
    q = _p().parse("length:42")
    assert q == ConstantScoreQuery(
        RangePredicate(column="length", lower=42, upper=42), boost=0.0
    )
    q = _p().parse("length:[30 TO 60]")
    assert q == ConstantScoreQuery(
        RangePredicate(column="length", lower=30, upper=60), boost=0.0
    )
    q = _p().parse("length:{30 TO *]")
    assert q == ConstantScoreQuery(
        RangePredicate(
            column="length", lower=30, upper=None, include_lower=False
        ),
        boost=0.0,
    )


def test_point_type_errors():
    with pytest.raises(QueryParseError):
        _p().parse("length:abc")
    with pytest.raises(QueryParseError):
        _p().parse("length:[a TO b]")
    with pytest.raises(QueryParseError):
        _p().parse("role:[a TO b]")  # keyword field: not a point


def test_text_field_range_keeps_classic_semantics():
    q = _p().parse("text:[apple TO banana]")
    assert q == TermRangeQuery("apple", "banana")


def test_classic_surface_inherited():
    q = _p(default_operator="AND").parse("+spark -slow role:de")
    assert isinstance(q, BooleanQuery)


# -- dictionary-expanded interval functions + end-to-end ----------------------


def test_fn_wildcard_and_fuzzy_need_searcher():
    with pytest.raises(QueryParseError):
        _p().parse("fn:wildcard(foo*)")
    with pytest.raises(QueryParseError):
        _p().parse("fn:fuzzyTerm(dfe)")


def test_fn_expansion_and_search(spark, tiny_index):
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.query import IntervalQuery as IQ

    s = IndexSearcher(tiny_index)
    p = _p(searcher=s)
    # fn:wildcard: expands against the dictionary
    src = p.parse("fn:wildcard(mod*)").source
    assert isinstance(src, (I.Or, I.Term))
    terms = set(src.terms())
    assert terms and all(t.startswith("mod") for t in terms)
    # fn:fuzzyTerm with explicit maxEdits / maxExpansions
    src = p.parse("fn:fuzzyTerm(modl 2 128)").source
    assert "model" in set(src.terms())
    # end-to-end equality with a hand-built interval query
    got = s.search(p.parse("fn:ordered(the model)"), 10).collect()
    want = s.search(IQ(I.ordered("the", "model")), 10).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in want
    ]
    # atLeast end-to-end: parses, searches, matches >= something
    got2 = s.search(p.parse("fn:atleast(2 model data the)"), 10).collect()
    want2 = s.search(IQ(I.atleast(2, "model", "data", "the")), 10).collect()
    assert [(r.doc_id, r.score) for r in got2] == [
        (r.doc_id, r.score) for r in want2
    ]
    assert got2


def test_msm_group_end_to_end(spark, tiny_index):
    from lucene_spark.search import IndexSearcher

    s = IndexSearcher(tiny_index)
    p = _p(searcher=s)
    q = p.parse("(model data the)@2")
    want = BooleanQuery.of(
        (TermQuery("model"), Occur.SHOULD),
        (TermQuery("data"), Occur.SHOULD),
        (TermQuery("the"), Occur.SHOULD),
        min_should_match=2,
    )
    got = s.search(q, 10).collect()
    exp = s.search(want, 10).collect()
    assert [(r.doc_id, r.score) for r in got] == [(r.doc_id, r.score) for r in exp]
    assert got
