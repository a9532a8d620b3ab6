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


# -- query-time synonym expansion (QueryBuilder.java / SynonymGraphFilter) --

def test_querybuilder_single_token_synonym():
    from lucene_spark.search.query import SynonymQuery, TermQuery, BooleanQuery, Occur
    from lucene_spark.search.querybuilder import QueryBuilder, QueryTimeSynonyms

    qb = QueryBuilder(synonyms=QueryTimeSynonyms([("fast", "quick"), ("fast", "rapid")]))
    q = qb.create_boolean_query("fast data")
    assert isinstance(q, BooleanQuery)
    syn, term = q.clauses[0].query, q.clauses[1].query
    assert isinstance(syn, SynonymQuery) and set(syn.terms) == {"fast", "quick", "rapid"}
    assert isinstance(term, TermQuery) and term.term == "data"
    assert all(c.occur == Occur.SHOULD for c in q.clauses)


def test_querybuilder_multiword_dst_becomes_phrase_group():
    from lucene_spark.search.query import BooleanQuery, PhraseQuery, TermQuery
    from lucene_spark.search.querybuilder import QueryBuilder, QueryTimeSynonyms

    qb = QueryBuilder(synonyms=QueryTimeSynonyms([("ml", "machine learning")]))
    q = qb.create_boolean_query("ml")
    assert isinstance(q, BooleanQuery)
    kinds = {type(c.query) for c in q.clauses}
    assert kinds == {TermQuery, PhraseQuery}
    ph = next(c.query for c in q.clauses if isinstance(c.query, PhraseQuery))
    assert ph.terms == ("machine", "learning")


def test_querybuilder_multiword_src_longest_match():
    from lucene_spark.search.query import BooleanQuery, PhraseQuery, TermQuery
    from lucene_spark.search.querybuilder import QueryBuilder, QueryTimeSynonyms

    syn = QueryTimeSynonyms([("machine learning", "ml"), ("machine", "engine")])
    qb = QueryBuilder(synonyms=syn)
    # longest match wins: "machine learning" consumed as one element
    q = qb.create_boolean_query("machine learning rocks")
    assert isinstance(q, BooleanQuery) and len(q.clauses) == 2
    grp = q.clauses[0].query
    assert isinstance(grp, BooleanQuery)
    assert {type(c.query) for c in grp.clauses} == {PhraseQuery, TermQuery}
    # single "machine" still matches the shorter rule
    q2 = qb.create_boolean_query("machine rocks")
    from lucene_spark.search.query import SynonymQuery

    assert isinstance(q2.clauses[0].query, SynonymQuery)
    assert set(q2.clauses[0].query.terms) == {"machine", "engine"}


def test_querybuilder_rules_analyzed_through_chain():
    from lucene_spark.analysis import Analyzer
    from lucene_spark.search.query import SynonymQuery
    from lucene_spark.search.querybuilder import QueryBuilder, QueryTimeSynonyms

    an = Analyzer(stopwords=frozenset({"the"}), stemmer="porter")
    syn = QueryTimeSynonyms([("training", "the learning")], analyzer=an)
    qb = QueryBuilder(analyzer=an, synonyms=syn)
    # both sides stem + stop: "training"->train, "the learning"->learn
    q = qb.create_boolean_query("training")
    assert isinstance(q, SynonymQuery) and set(q.terms) == {"train", "learn"}


def test_parser_with_synonyms():
    from lucene_spark.search.parser import QueryParser
    from lucene_spark.search.query import BooleanQuery, Occur, PhraseQuery, SynonymQuery, TermQuery
    from lucene_spark.search.querybuilder import QueryTimeSynonyms

    p = QueryParser(synonyms=QueryTimeSynonyms([("fast", "quick"), ("ml", "machine learning")]))
    q = p.parse("+fast ml")
    assert isinstance(q, BooleanQuery)
    by_occur = {c.occur: c.query for c in q.clauses}
    assert isinstance(by_occur[Occur.MUST], SynonymQuery)
    grp = by_occur[Occur.SHOULD]
    assert isinstance(grp, BooleanQuery)
    assert {type(c.query) for c in grp.clauses} == {TermQuery, PhraseQuery}


def test_synonym_query_searches(spark, tiny_index, tiny_oracle):
    """End-to-end: SynonymQuery expansion scores as summed-freq/max-df
    pseudo-term — equals the oracle's brute force."""
    import numpy as np

    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.querybuilder import QueryBuilder, QueryTimeSynonyms

    s = IndexSearcher(tiny_index)
    qb = QueryBuilder(synonyms=QueryTimeSynonyms([("data", "model")]))
    q = qb.create_boolean_query("data")
    got = [(r.conv_id, r.turn_idx, np.float32(r.score)) for r in s.search(q, 10).collect()]
    # oracle: one pseudo-term, freq summed, df = max
    o = tiny_oracle
    import math

    members = ["data", "model"]
    mdf = max(o.doc_freq(t) for t in members)
    N = o.doc_count
    w = np.float32(math.log(1 + (N - mdf + 0.5) / (mdf + 0.5)))
    cache = o.norm_inverse_cache()
    scores = {}
    freqs = {}
    for t in members:
        for d, f in o.postings.get(t, {}).items():
            freqs[d] = freqs.get(d, 0) + f
    one = np.float32(1.0)
    for d, f in freqs.items():
        inv = cache[o.docs[d].norm]
        scores[d] = np.float32(np.float32(w - w / (one + np.float32(f) * inv)))
    want = [(c, t, np.float32(sc)) for c, t, sc in o.topk_keys(o._topk(scores, 10))]
    assert got == want


# -- keyword (filter) fields ------------------------------------------------


def test_keyword_field_parses_to_constant_score_filter():
    from lucene_spark.search.parser import QueryParser
    from lucene_spark.search.query import (
        BooleanQuery, ConstantScoreQuery, Occur, RangePredicate, TermQuery,
    )

    q = QueryParser().parse("+spark +role:de")
    assert isinstance(q, BooleanQuery)
    kinds = {}
    for c in q.clauses:
        kinds[type(c.query)] = (c.query, c.occur)
    cs, occ = kinds[ConstantScoreQuery]
    assert occ == Occur.MUST and cs.boost == 0.0
    assert cs.query == RangePredicate(column="role", lower="de", upper="de")
    tq, occ2 = kinds[TermQuery]
    assert tq.term == "spark" and occ2 == Occur.MUST


def test_keyword_field_negated_and_tool():
    from lucene_spark.search.parser import QueryParser
    from lucene_spark.search.query import ConstantScoreQuery, Occur

    q = QueryParser().parse("spark -tool:src3")
    negs = [(c.query, c.occur) for c in q.clauses if c.occur == Occur.MUST_NOT]
    assert len(negs) == 1 and isinstance(negs[0][0], ConstantScoreQuery)
    assert negs[0][0].query.column == "tool"


def test_unknown_field_still_rejected():
    import pytest as _pt

    from lucene_spark.search.parser import QueryParseError, QueryParser

    with _pt.raises(QueryParseError):
        QueryParser().parse("bogusfield:x")
    with _pt.raises(QueryParseError):
        QueryParser(keyword_fields=()).parse("role:de")
