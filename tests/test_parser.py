"""Classic query-string parser -> Query tree (SURVEY.md §2.11 subset)."""

import pytest

from lucene_spark.search import BooleanQuery, Occur, PhraseQuery, TermQuery
from lucene_spark.search.parser import QueryParser, QueryParseError
from lucene_spark.search.query import (
    BoostQuery,
    FuzzyQuery,
    PrefixQuery,
    RegexpQuery,
    TermRangeQuery,
    WildcardQuery,
)

P = QueryParser()


def occurs(q):
    assert isinstance(q, BooleanQuery)
    return [(c.query, c.occur) for c in q.clauses]


def test_single_term():
    assert P.parse("Hello") == TermQuery("hello")


def test_default_or():
    q = P.parse("hello world")
    assert occurs(q) == [
        (TermQuery("hello"), Occur.SHOULD),
        (TermQuery("world"), Occur.SHOULD),
    ]


def test_plus_minus():
    q = P.parse("+spark -slow data")
    assert occurs(q) == [
        (TermQuery("spark"), Occur.MUST),
        (TermQuery("slow"), Occur.MUST_NOT),
        (TermQuery("data"), Occur.SHOULD),
    ]


def test_and_promotes_both_sides():
    q = P.parse("table AND join")
    assert occurs(q) == [
        (TermQuery("table"), Occur.MUST),
        (TermQuery("join"), Occur.MUST),
    ]


def test_or_and_not():
    q = P.parse("a OR b NOT c")
    assert occurs(q) == [
        (TermQuery("a"), Occur.SHOULD),
        (TermQuery("b"), Occur.SHOULD),
        (TermQuery("c"), Occur.MUST_NOT),
    ]


def test_phrase_and_slop():
    assert P.parse('"the customer"') == PhraseQuery(("the", "customer"))
    assert P.parse('"the customer"~2') == PhraseQuery(("the", "customer"), slop=2)
    # single-token phrase degrades to a TermQuery (QueryParserBase:480)
    assert P.parse('"spark"') == TermQuery("spark")


def test_boost():
    assert P.parse("spark^2") == TermQuery("spark", boost=2.0)
    b = P.parse('"big data"^3')
    assert isinstance(b, BoostQuery) and b.boost == 3.0


def test_wildcards_prefix_fuzzy_regexp_range():
    assert P.parse("spar*") == PrefixQuery("spar")
    assert P.parse("sp?rk") == WildcardQuery("sp?rk")
    assert P.parse("spark~") == FuzzyQuery("spark", max_edits=2)
    assert P.parse("spark~1") == FuzzyQuery("spark", max_edits=1)
    assert P.parse("/sp.rk/") == RegexpQuery("sp.rk")
    assert P.parse("[aaa TO bbb]") == TermRangeQuery("aaa", "bbb")
    assert P.parse("{aaa TO *}") == TermRangeQuery(
        "aaa", None, include_lower=False, include_upper=False
    )


def test_field_prefix():
    assert P.parse("text:spark") == TermQuery("spark")
    with pytest.raises(QueryParseError):
        P.parse("title:spark")


def test_parens_group():
    q = P.parse("+(a b) -c")
    pairs = occurs(q)
    assert pairs[0][1] == Occur.MUST and isinstance(pairs[0][0], BooleanQuery)
    assert pairs[1] == (TermQuery("c"), Occur.MUST_NOT)


def test_analyzer_applied_to_query_text():
    # the same analyzer runs on query text (QueryParserBase:456): case-fold
    # and split multi-token words into SHOULD-of-terms
    assert P.parse("Spark") == TermQuery("spark")
    q = P.parse("state-of-the-art")
    assert occurs(q) == [
        (TermQuery("state"), Occur.SHOULD),
        (TermQuery("of"), Occur.SHOULD),
        (TermQuery("the"), Occur.SHOULD),
        (TermQuery("art"), Occur.SHOULD),
    ]


def test_end_to_end_parsing_matches_programmatic(tiny_index):
    from lucene_spark.search import IndexSearcher

    s = IndexSearcher(tiny_index)
    parsed = s.search(P.parse("the spark query"), 10).collect()
    built = s.search(
        BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in ("the", "spark", "query")]),
        10,
    ).collect()
    assert [(r.doc_id, r.score) for r in parsed] == [(r.doc_id, r.score) for r in built]


# -- conj semantics vs QueryParserBase.addClause ---------------------------


def test_or_with_and_default_yields_should():
    """'a OR b' under default_operator=AND must be SHOULD+SHOULD, not
    MUST+MUST (QueryParserBase.addClause demotes the left clause when the
    next one is introduced by OR)."""
    p = QueryParser(default_operator="AND")
    q = p.parse("hello OR world")
    assert occurs(q) == [
        (TermQuery("hello"), Occur.SHOULD),
        (TermQuery("world"), Occur.SHOULD),
    ]


def test_plus_then_or_demotes_explicit_must():
    """'+a OR b' parses as 'a OR b' in the reference (the demotion applies
    even to an explicitly-required left clause)."""
    p = QueryParser(default_operator="AND")
    q = p.parse("+hello OR world")
    assert occurs(q) == [
        (TermQuery("hello"), Occur.SHOULD),
        (TermQuery("world"), Occur.SHOULD),
    ]


def test_not_left_survives_or():
    """'-a OR b': prohibited left clause is never demoted."""
    q = QueryParser(default_operator="AND").parse("-hello OR world")
    assert occurs(q) == [
        (TermQuery("hello"), Occur.MUST_NOT),
        (TermQuery("world"), Occur.SHOULD),
    ]


def test_and_default_plain_terms_are_must():
    q = QueryParser(default_operator="AND").parse("hello world")
    assert occurs(q) == [
        (TermQuery("hello"), Occur.MUST),
        (TermQuery("world"), Occur.MUST),
    ]


def test_and_promotes_left_even_with_explicit_plus_on_right():
    q = P.parse("hello AND +world")
    assert occurs(q) == [
        (TermQuery("hello"), Occur.MUST),
        (TermQuery("world"), Occur.MUST),
    ]
