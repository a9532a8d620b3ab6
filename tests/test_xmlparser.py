"""XML query parser (search/xmlparser.py) vs the reference's own query
files: the TestCoreParser.java cases, with each *.xml vector from
queryparser/src/test/.../xml/ transcribed over a small known corpus
(the reference runs them against a Reuters sample and only smoke-dumps
results; here every case asserts the exact match set or structure)."""

import pytest

from lucene_spark.search import (
    BooleanQuery,
    CoreParser,
    DisjunctionMaxQuery,
    Occur,
    ParserException,
    TermQuery,
)
from lucene_spark.search.spans import (
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
)

DOCS = [
    # id 0: merger + bank
    "bank merger approved by the board",
    # id 1: sumitomo + bank
    "sumitomo bank posts record profit",
    # id 2: bank only
    "central bank holds rates",
    # id 3: miner killed (span vector shape)
    "a miner was killed in the accident",
    # id 4: mine + worker within 6
    "the mine worker strike continues",
    # id 5: fire within first 10 positions
    "fire crews responded to the refinery",
    # id 6: sugar at position 9 (0-based)
    "a b c d e f g h i sugar j k",
    # id 7: sugar at position 2 — outside [9, 11)
    "raw white sugar futures fell",
]


@pytest.fixture(scope="module")
def searcher(spark):
    from lucene_spark.index import IndexBuilder
    from lucene_spark.search import IndexSearcher

    rows = [(f"d{i}", 0, "en" if i % 2 == 0 else "fr", None, None, t)
            for i, t in enumerate(DOCS)]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, tool string,"
        " ts timestamp, text string",
    )
    idx = IndexBuilder(num_segments=2).build(df)
    return IndexSearcher(idx)


def _matched(searcher, xml):
    q = CoreParser().parse(xml)
    return {int(r.doc_id) for r in searcher.search(q, 50).collect()}


# -- TermQuery.xml ------------------------------------------------------------
def test_term_query(searcher):
    xml = '<TermQuery fieldName="text">sumitomo</TermQuery>'
    assert CoreParser().parse(xml) == TermQuery("sumitomo")
    assert _matched(searcher, xml) == {1}


def test_term_query_boost():
    q = CoreParser().parse('<TermQuery boost="2.5">bank</TermQuery>')
    assert q == TermQuery("bank", 2.5)


def test_term_query_empty_fails():
    with pytest.raises(ParserException):
        CoreParser().parse("<TermQuery></TermQuery>")


# -- DOCTYPE_TermQuery.xml / ENTITY_TermQuery.xml (security) -------------------
def test_doctype_rejected():
    xml = ('<!DOCTYPE TermQuery [<!ENTITY internalTerm "sumitomo">]>'
           "<TermQuery>&internalTerm;</TermQuery>")
    with pytest.raises(ParserException):
        CoreParser().parse(xml)


# -- TermsQuery.xml ------------------------------------------------------------
def test_terms_query(searcher):
    xml = '<TermsQuery fieldName="text">sumitomo bank</TermsQuery>'
    assert _matched(searcher, xml) == {0, 1, 2}
    xml2 = ('<TermsQuery minimumNumberShouldMatch="2">'
            "sumitomo bank</TermsQuery>")
    assert _matched(searcher, xml2) == {1}


# -- BooleanQuery.xml ----------------------------------------------------------
BOOLEAN_XML = """
<BooleanQuery fieldName="text">
  <Clause occurs="should">
    <TermQuery>merger</TermQuery>
  </Clause>
  <Clause occurs="mustnot">
    <TermQuery>sumitomo</TermQuery>
  </Clause>
  <Clause occurs="must">
    <TermQuery>bank</TermQuery>
  </Clause>
</BooleanQuery>
"""


def test_boolean_query(searcher):
    q = CoreParser().parse(BOOLEAN_XML)
    assert [c.occur for c in q.clauses] == [
        Occur.SHOULD, Occur.MUST_NOT, Occur.MUST
    ]
    assert _matched(searcher, BOOLEAN_XML) == {0, 2}


def test_boolean_query_bad_occurs():
    with pytest.raises(ParserException):
        CoreParser().parse(
            '<BooleanQuery><Clause occurs="nope">'
            "<TermQuery>x</TermQuery></Clause></BooleanQuery>"
        )


# -- NestedBooleanQuery.xml: direct Clause children only ------------------------
def test_nested_boolean_query(searcher):
    xml = """
<BooleanQuery fieldName="text">
  <Clause occurs="should">
    <BooleanQuery fieldName="text">
      <Clause occurs="must">
        <TermQuery>doesnotexistbutok</TermQuery>
      </Clause>
    </BooleanQuery>
  </Clause>
  <Clause occurs="should">
    <TermQuery>bank</TermQuery>
  </Clause>
</BooleanQuery>
"""
    q = CoreParser().parse(xml)
    # the grandchild Clause must NOT be lifted to the top level
    assert len(q.clauses) == 2
    assert _matched(searcher, xml) == {0, 1, 2}


# -- DisjunctionMaxQuery.xml: structural assert like the reference's ------------
def test_disjunction_max_query():
    xml = """
<DisjunctionMaxQuery fieldName="text">
  <TermQuery>merger</TermQuery>
  <DisjunctionMaxQuery tieBreaker="0.3">
    <TermQuery>verger</TermQuery>
  </DisjunctionMaxQuery>
</DisjunctionMaxQuery>
"""
    q = CoreParser().parse(xml)
    expected = DisjunctionMaxQuery(
        queries=(
            TermQuery("merger"),
            DisjunctionMaxQuery(queries=(TermQuery("verger"),),
                                tie_breaker=0.3),
        ),
        tie_breaker=0.0,
    )
    assert q == expected


# -- RangeQuery / PointRangeQuery as filter columns ------------------------------
def test_user_input_with_range_filter(searcher):
    xml = """
<BooleanQuery fieldName="text">
  <Clause occurs="must">
    <UserQuery>bank</UserQuery>
  </Clause>
  <Clause occurs="filter">
    <RangeQuery fieldName="role" lowerTerm="en" upperTerm="en"/>
  </Clause>
</BooleanQuery>
"""
    # bank docs {0,1,2} ∩ role=en (even ids) = {0,2}
    assert _matched(searcher, xml) == {0, 2}


def test_point_range_query(searcher):
    xml = """
<BooleanQuery fieldName="text">
  <Clause occurs="must">
    <MatchAllDocsQuery/>
  </Clause>
  <Clause occurs="filter">
    <PointRangeQuery fieldName="turn_idx" type="int" lowerTerm="0" upperTerm="0"/>
  </Clause>
</BooleanQuery>
"""
    assert _matched(searcher, xml) == set(range(len(DOCS)))
    with pytest.raises(ParserException):
        CoreParser().parse(
            '<PointRangeQuery fieldName="turn_idx" type="bogus"/>'
        )
    with pytest.raises(ParserException):
        CoreParser().parse(
            '<PointRangeQuery fieldName="turn_idx" lowerTerm="xyz"/>'
        )


def test_range_query_on_text_dictionary(searcher):
    # term range on the text field: [suga TO sumz] covers sugar + sumitomo
    xml = '<RangeQuery fieldName="text" lowerTerm="suga" upperTerm="sumz"/>'
    assert _matched(searcher, xml) == {1, 6, 7}


# -- ConstantScoreQuery.xml ------------------------------------------------------
def test_constant_score_query(searcher):
    xml = """
<ConstantScoreQuery boost="3.0">
  <RangeQuery fieldName="role" lowerTerm="fr" upperTerm="fr"/>
</ConstantScoreQuery>
"""
    q = CoreParser().parse(xml)
    rows = searcher.search(q, 50).collect()
    assert {int(r.doc_id) for r in rows} == {1, 3, 5, 7}
    assert all(abs(r.score - 3.0) < 1e-6 for r in rows)


# -- SpanQuery.xml: the full reference vector, transcribed -----------------------
SPAN_XML = """
<SpanOr fieldName="text">
  <SpanNear slop="8" inOrder="false">
      <SpanOr>
        <SpanTerm>killed</SpanTerm>
        <SpanTerm>died</SpanTerm>
        <SpanTerm>dead</SpanTerm>
      </SpanOr>
      <SpanOr>
        <SpanOrTerms>miner miners</SpanOrTerms>
        <SpanNear slop="6" inOrder="false">
          <SpanTerm>mine</SpanTerm>
          <SpanOrTerms>worker workers</SpanOrTerms>
          <BoostingTermQuery>heavy</BoostingTermQuery>
        </SpanNear>
      </SpanOr>
  </SpanNear>
  <SpanFirst end="10">
    <SpanOrTerms>fire burn</SpanOrTerms>
  </SpanFirst>
</SpanOr>
"""


def test_span_query_vector(searcher):
    q = CoreParser().parse(SPAN_XML)
    sq = CoreParser().parse_as_span_query(SPAN_XML)
    assert q == sq  # TestCoreParser.testSpanQueryXML equality assert
    # doc 3 (miner killed), doc 5 (fire in first 10); doc 4 has no
    # killed/died/dead so the inner near cannot match it
    assert _matched(searcher, SPAN_XML) == {3, 5}


def test_span_near_requires_slop():
    with pytest.raises(ParserException):
        CoreParser().parse(
            "<SpanNear><SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanNear>"
        )


def test_span_structure():
    q = CoreParser().parse_as_span_query(
        '<SpanNear slop="2" inOrder="true">'
        "<SpanTerm>a</SpanTerm><SpanOrTerms>b c</SpanOrTerms></SpanNear>"
    )
    assert q == SpanNearQuery(
        (SpanTermQuery("a"),
         SpanOrQuery((SpanTermQuery("b"), SpanTermQuery("c")))),
        slop=2,
        in_order=True,
    )


# -- SpanPositionRangeQuery.xml ---------------------------------------------------
def test_span_position_range(searcher):
    xml = ('<SpanPositionRange start="9" end="11">'
           '<SpanTerm fieldName="text">sugar</SpanTerm>'
           "</SpanPositionRange>")
    # sugar@9 in doc 6 is inside [9, 11); sugar@2 in doc 7 is not
    assert _matched(searcher, xml) == {6}


def test_span_not(searcher):
    xml = """
<SpanNot fieldName="text">
  <Include>
    <SpanTerm>bank</SpanTerm>
  </Include>
  <Exclude>
    <SpanNear slop="0" inOrder="true">
      <SpanTerm>sumitomo</SpanTerm>
      <SpanTerm>bank</SpanTerm>
    </SpanNear>
  </Exclude>
</SpanNot>
"""
    # bank spans not inside a "sumitomo bank" window: docs 0 and 2
    assert _matched(searcher, xml) == {0, 2}


def test_unknown_element():
    with pytest.raises(ParserException):
        CoreParser().parse("<NoSuchQuery>x</NoSuchQuery>")


def test_mixed_field_rejected():
    with pytest.raises(ParserException):
        CoreParser().parse('<TermQuery fieldName="title">x</TermQuery>')
