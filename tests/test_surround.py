"""Surround parser (search/surround.py) vs the reference's own test
vectors: Test01Exceptions / Test02Boolean / Test03Distance document sets
(queryparser/surround/query/Test0*.java), end-to-end through the real
engine (index build -> parse -> search -> matched-doc set)."""

import pytest

from lucene_spark.search import (
    SurroundParseError,
    SurroundQueryParser,
    TooManyBasicQueries,
)

# Test02Boolean.java:32 / Test03Distance.java docs1
DOCS1 = [
    "word1 word2 word3",
    "word4 word5",
    "ord1 ord2 ord3",
    "orda1 orda2 orda3 word2 worda3",
    "a c e a b c",
]
# Test03Distance.java docs2/docs3
DOCS2 = ["w1 w2 w3 w4 w5", "w1 w3 w2 w3", ""]
DOCS3 = [
    "low pressure temperature inversion and rain",
    "when the temperature has a negative height above a depression no"
    " precipitation gradient is expected",
    "when the temperature has a negative height gradient above a depression"
    " no precipitation is expected",
    "",
]


def _build(spark, texts):
    from lucene_spark.index import IndexBuilder
    from lucene_spark.search import IndexSearcher

    rows = [(f"d{i}", 0, "u", None, None, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, tool string,"
        " ts timestamp, text string",
    )
    idx = IndexBuilder(num_segments=2).build(df)
    return IndexSearcher(idx)


@pytest.fixture(scope="module")
def db1(spark):
    return _build(spark, DOCS1)


@pytest.fixture(scope="module")
def db2(spark):
    return _build(spark, DOCS2)


@pytest.fixture(scope="module")
def db3(spark):
    return _build(spark, DOCS3)


def _matched(searcher, query, max_basic=16):
    p = SurroundQueryParser(searcher=searcher, max_basic_queries=max_basic)
    q = p.parse(query)
    return {int(r.doc_id) for r in searcher.search(q, 50).collect()}


# -- Test01Exceptions.java:33-56 ----------------------------------------------
EXCEPTION_QUERIES = [
    "*", "a*", "ab*", "?", "a?", "ab?", "a???b", "a?", "a*b?",
    "word1 word2", "word2 AND", "word1 OR",
    "AND(word2)", "AND(word2,)", "AND(word2,word1,)",
    "OR(word2)", "OR(word2 ,", "OR(word2 , word1 ,)",
    "xx NOT", "xx (a AND b)", "(a AND b", "a OR b)", "",
    # Test03Distance.java:49-58 — non-distance subqueries under W
    "(aa and bb) w cc",
    "(aa or bb) w (cc and dd)",
    "(aa not bb) w cc",
    "(aa or bb) w (bi:cc)",
    "(aa or bb) w bi:cc",
    "(aa or bi:bb) w cc",
    "(aa or (bi:bb)) w cc",
    "(aa or (bb and dd)) w cc",
]


@pytest.mark.parametrize("q", EXCEPTION_QUERIES)
def test_exception_queries(q):
    with pytest.raises(SurroundParseError):
        SurroundQueryParser().parse(q)


# -- Test02Boolean.java --------------------------------------------------------
BOOLEAN_CASES = [
    ("word1", {0}),
    ("word*", {0, 1, 3}),
    ("ord2", {2}),
    ("kxork*", set()),
    ("wor*", {0, 1, 3}),
    ("ab", set()),
    ("abc?", set()),
    ("word?", {0, 1, 3}),
    ("w?rd?", {0, 1, 3}),
    ("w*rd?", {0, 1, 3}),
    ("w*rd??", {3}),
    ("w*?da?", {3}),
    ("w?da?", set()),
    ("word1 AND word2", {0}),
    ("word* and ord*", {3}),
    ("and(word1,word2)", {0}),
    ("word1 or word2", {0, 3}),
    ("word* OR ord*", {0, 1, 2, 3}),
    ("OR (word1, word2)", {0, 3}),
    ("word2 NOT word1", {3}),
    ("word2* not ord*", {0}),
    ("(word1 or ab)and or(word2,xyz, defg)", {0}),
    ("or( word2* not ord*, and(xyz,def))", {0}),
]


@pytest.mark.parametrize("q,exp", BOOLEAN_CASES)
def test_boolean_ported(db1, q, exp):
    assert _matched(db1, q) == exp, q


# -- Test03Distance.java (db1 cases) ------------------------------------------
DISTANCE1_CASES = [
    ("word1 w word2", {0}),
    ("word1 n word2", {0}),
    ("word2 n word1", {0}),
    ("word2 w word1", set()),
    ("word2 2W word1", set()),
    ("word2 2N word1", {0}),
    ("word1 2N word2", {0}),
    ("word2 3w word1", set()),
    ("word2 3n word1", {0}),
    ("word1 3n word2", {0}),
    ("orda1 w orda3", set()),
    ("orda1 2w orda3", {3}),
    ("word1* w word2", {0}),
    ("word* w word2", {0}),
    ("word2 w word*", {0, 3}),
    ("word* n word2", {0, 3}),
    ("word2 n word*", {0, 3}),
    ("word1* w word2*", {0}),
    ("word1* N word2*", {0}),
    ("kxork* w kxor*", set()),
    ("kxork* 99n kxor*", set()),
    ("word2* 2W word1*", set()),
    ("word2* 2N word1*", {0}),
    ("ord* W word*", {3}),
    ("ord* N word*", {3}),
    ("word* N ord*", {3}),
    ("(orda2 OR orda3) W word*", {3}),
    ("(orda2 OR orda3) W (word2 OR worda3)", {3}),
    ("(orda2 OR orda3) 2W (word2 OR worda3)", {3}),
    ("(orda2 OR orda3) 2N (word2 OR worda3)", {3}),
]


@pytest.mark.parametrize("q,exp", DISTANCE1_CASES)
def test_distance_db1_ported(db1, q, exp):
    assert _matched(db1, q) == exp, q


# -- Test03Distance.java (db2 prefix/nested cases) -----------------------------
DISTANCE2_CASES = [
    ("W (w1, w2, w3)", {0}),
    ("N(w1, w2, w3)", {0, 1}),
    ("N(w3, w1, w2)", {0, 1}),
    ("2W(w1,w2,w3)", {0, 1}),
    ("2N(w1,w2,w3)", {0, 1}),
    ("2N(w2,w3,w1)", {0, 1}),
    ("w1 W w2 W w3", {0}),
    ("w1 N w2 N w3", {0}),
    ("w1 2W w2 2W w3", {0, 1}),
    ("w1 2N w2 2N w3", {0, 1}),
]


@pytest.mark.parametrize("q,exp", DISTANCE2_CASES)
def test_distance_db2_ported(db2, q, exp):
    assert _matched(db2, q) == exp, q


def test_distance_db3_example(db3):
    # Test03Distance.test3Example01 — the module's flagship query: doc 1
    # fails only because "gradient" is in the wrong place there
    q = (
        "50n((low w pressure*) or depression*,"
        "5n(temperat*, (invers* or (negativ* 3n gradient*))),"
        "rain* or precipitat*)"
    )
    assert _matched(db3, q) == {0, 2}


# -- surround-specific contracts ------------------------------------------------
def test_boost_weights_scale_scores(db1):
    p = SurroundQueryParser(searcher=db1)
    plain = {int(r.doc_id): float(r.score)
             for r in db1.search(p.parse("word1 or word2"), 10).collect()}
    boosted = {int(r.doc_id): float(r.score)
               for r in db1.search(p.parse("word1^2 or word2"), 10).collect()}
    assert set(plain) == set(boosted) == {0, 3}
    # doc 3 matches only word2 (unboosted) — its score is unchanged;
    # doc 0's word1 contribution doubles
    assert boosted[3] == pytest.approx(plain[3], rel=1e-9)
    assert boosted[0] > plain[0]
    # left-associative multiplication: ^2^3 == ^6
    q = p.parse("word1^2^3")
    assert q.boost == pytest.approx(6.0)


def test_too_many_basic_queries(db1):
    with pytest.raises(TooManyBasicQueries):
        _matched(db1, "word* w ord*", max_basic=2)


def test_trunc_in_distance_needs_searcher():
    with pytest.raises(SurroundParseError):
        SurroundQueryParser().parse("word* w word2")


def test_empty_expansion_is_match_no_docs(db1):
    from lucene_spark.search import MatchNoDocsQuery

    p = SurroundQueryParser(searcher=db1)
    assert isinstance(p.parse("kxork* w kxor*"), MatchNoDocsQuery)


def test_text_field_prefix_transparent(db1):
    assert _matched(db1, "text:word1") == {0}
    with pytest.raises(SurroundParseError):
        SurroundQueryParser().parse("role:word1")


def test_mixed_case_operator_is_a_term(db1):
    # "Or" is not an operator token (QueryParser.jj matches OR|or only)
    assert _matched(db1, "Or") == set()
