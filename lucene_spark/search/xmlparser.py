"""XML query parser: the element-per-Query dialect.

≙ ``queryparser/xml/CoreParser.java`` and its ``builders/`` package — one
XML element per core Query type, assembled by tag-dispatched builders:

* ``TermQuery`` (TermQueryBuilder: RAW term text, not analyzed; boost attr)
* ``TermsQuery`` (TermsQueryBuilder: analyzed text -> SHOULD TermQueries +
  ``minimumNumberShouldMatch``)
* ``BooleanQuery`` (BooleanQueryBuilder: direct ``Clause`` children only —
  the NestedBooleanQuery.xml regression — with ``occurs`` ∈ should / must /
  mustNot / filter, case-insensitive per getOccursValue)
* ``MatchAllDocsQuery``, ``DisjunctionMaxQuery`` (``tieBreaker``),
  ``ConstantScoreQuery`` (first child)
* ``UserQuery`` (UserInputQueryBuilder: classic QueryParser over the text)
* ``RangeQuery`` (RangeQueryBuilder: term range on the text field;
  non-default fieldName = docvalues-column range, the engine's filter-field
  idiom — never scored, like the classic parser's keyword fields)
* ``PointRangeQuery`` (PointRangeQueryBuilder: typed numeric column range,
  type ∈ int/long/float/double; open bounds allowed)
* spans: ``SpanTerm`` (raw), ``SpanOrTerms`` (analyzed), ``SpanOr``,
  ``SpanNear`` (``slop`` REQUIRED, ``inOrder`` default false),
  ``SpanNot`` (``Include``/``Exclude`` children), ``SpanFirst``
  (``end`` default 1), ``SpanPositionRange`` (``start``/``end`` default 1)
* ``BoostingTermQuery`` (BoostingTermBuilder wraps PayloadScoreQuery):
  accepted for compatibility with reference query files and parsed as a
  SpanTerm — the parquet substrate has no payloads (n/a by design,
  SURVEY §2), so the match semantics are preserved and the payload score
  contribution is not
* ``fieldName`` inherits from ancestor elements
  (DOMUtils.getAttributeWithInheritance); only the engine's single text
  field may be queried/scored, other fields are column predicates
* documents carrying a DOCTYPE are rejected — CoreParser's
  DISALLOW_EXTERNAL_ENTITY_RESOLVER security posture (its
  DOCTYPE_TermQuery/ENTITY_TermQuery tests assert parse failure); this
  also keeps xml.etree's expat from expanding internal entities
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from lucene_spark.search.parser import QueryParser
from lucene_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    Occur,
    Query,
    RangePredicate,
    TermQuery,
    TermRangeQuery,
)
from lucene_spark.search.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanPositionRangeQuery,
    SpanQuery,
    SpanTermQuery,
)
from lucene_spark.analysis.tokenizer import tokenize_text


class ParserException(ValueError):
    """≙ queryparser/xml/ParserException.java"""


_SPAN_TAGS = frozenset(
    ("SpanTerm", "SpanOrTerms", "SpanOr", "SpanNear", "SpanNot",
     "SpanFirst", "SpanPositionRange", "BoostingTermQuery")
)

_POINT_CASTS = {
    "int": int, "long": int, "float": float, "double": float,
}

_DOCTYPE_RE = re.compile(r"<!DOCTYPE", re.IGNORECASE)


def _attr_float(e, name, default):
    v = e.get(name)
    return default if v is None else float(v)


def _attr_int(e, name, default):
    v = e.get(name)
    return default if v is None else int(v)


def _attr_bool(e, name, default):
    v = e.get(name)
    if v is None:
        return default
    return v.strip().lower() == "true"


def _text_or_fail(e) -> str:
    t = (e.text or "").strip()
    if not t:
        raise ParserException(f"<{e.tag}> requires non-blank text")
    return t


def _children(e):
    return list(e)


class CoreParser:
    """``parse(xml) -> Query``.  ``xml`` is a string (or anything
    ``ET.fromstring`` accepts after the DOCTYPE guard).

    ``analyzer`` analyzes ``TermsQuery``/``SpanOrTerms``/``UserQuery``
    content (tokenize-only when None); ``synonyms`` pass through to the
    UserQuery classic parser."""

    def __init__(self, default_field: str = "text", analyzer=None,
                 synonyms=None, keyword_fields: tuple = ("role", "tool")):
        self.default_field = default_field
        self.analyzer = analyzer
        self.synonyms = synonyms
        self.keyword_fields = tuple(keyword_fields)

    # -- public surface ----------------------------------------------------
    def parse(self, xml: str) -> Query:
        return self._get_query(self._root(xml), self.default_field)

    def parse_as_span_query(self, xml: str) -> SpanQuery:
        """CoreParser.parseAsSpanQuery — the root must be a span element."""
        return self._get_span(self._root(xml), self.default_field)

    def _root(self, xml: str):
        if _DOCTYPE_RE.search(xml):
            raise ParserException(
                "DOCTYPE declarations are not allowed (external-entity "
                "security; CoreParser.DISALLOW_EXTERNAL_ENTITY_RESOLVER)"
            )
        try:
            return ET.fromstring(xml)
        except ET.ParseError as err:
            raise ParserException(f"error parsing XML: {err}") from err

    # -- helpers -------------------------------------------------------------
    def _field(self, e, inherited: str) -> str:
        return e.get("fieldName", inherited)

    def _analyze(self, text: str) -> list:
        if self.analyzer is not None:
            return self.analyzer.analyze_query(text)
        return tokenize_text(text)

    def _boosted(self, q: Query, e) -> Query:
        boost = _attr_float(e, "boost", 1.0)
        return q if boost == 1.0 else BoostQuery(q, boost).rewrite()

    def _check_text_field(self, e, field: str) -> None:
        if field != self.default_field:
            raise ParserException(
                f"<{e.tag}> supports only the text field "
                f"{self.default_field!r}; got {field!r} (single-field "
                "engine — use RangeQuery/PointRangeQuery for columns)"
            )

    # -- query dispatch (QueryBuilderFactory) ---------------------------------
    def _get_query(self, e, field: str) -> Query:
        field = self._field(e, field)
        tag = e.tag
        if tag in _SPAN_TAGS:
            return self._boosted(self._get_span(e, field), e)
        fn = getattr(self, f"_q_{tag}", None)
        if fn is None:
            raise ParserException(f"no builder for element <{tag}>")
        return fn(e, field)

    def _q_TermQuery(self, e, field: str) -> Query:
        value = _text_or_fail(e)
        if field in self.keyword_fields:
            # keyword columns are exact-match filters, never scored — the
            # classic parser's field idiom
            return ConstantScoreQuery(
                RangePredicate(column=field, lower=value, upper=value),
                boost=0.0,
            )
        self._check_text_field(e, field)
        return self._boosted(TermQuery(value), e)

    def _q_TermsQuery(self, e, field: str) -> Query:
        self._check_text_field(e, field)
        msm = _attr_int(e, "minimumNumberShouldMatch", 0)
        terms = self._analyze(_text_or_fail(e))
        q = BooleanQuery.of(
            *[(TermQuery(t), Occur.SHOULD) for t in terms],
            min_should_match=msm,
        )
        return self._boosted(q, e)

    def _q_MatchAllDocsQuery(self, e, field: str) -> Query:
        return MatchAllDocsQuery()

    def _q_BooleanQuery(self, e, field: str) -> Query:
        msm = _attr_int(e, "minimumNumberShouldMatch", 0)
        clauses = []
        for kid in _children(e):  # direct children only (NestedBooleanQuery)
            if kid.tag != "Clause":
                continue
            occur = self._occurs(kid)
            sub_elems = _children(kid)
            if not sub_elems:
                raise ParserException("<Clause> requires a child query")
            clauses.append((self._get_query(sub_elems[0], field), occur))
        q = BooleanQuery.of(*clauses, min_should_match=msm)
        return self._boosted(q, e)

    @staticmethod
    def _occurs(clause_elem) -> Occur:
        occs = clause_elem.get("occurs")
        low = (occs or "should").lower()
        if low == "should":
            return Occur.SHOULD
        if low == "must":
            return Occur.MUST
        if low == "mustnot":
            return Occur.MUST_NOT
        if occs == "filter":  # case-sensitive in getOccursValue, mirrored
            return Occur.FILTER
        raise ParserException(
            f'Invalid value for "occurs" attribute of clause: {occs}'
        )

    def _q_DisjunctionMaxQuery(self, e, field: str) -> Query:
        tie = _attr_float(e, "tieBreaker", 0.0)
        disjuncts = tuple(self._get_query(kid, field) for kid in _children(e))
        return self._boosted(
            DisjunctionMaxQuery(queries=disjuncts, tie_breaker=tie), e
        )

    def _q_ConstantScoreQuery(self, e, field: str) -> Query:
        kids = _children(e)
        if not kids:
            raise ParserException("<ConstantScoreQuery> requires a child")
        boost = _attr_float(e, "boost", 1.0)
        return ConstantScoreQuery(self._get_query(kids[0], field), boost=boost)

    def _q_UserQuery(self, e, field: str) -> Query:
        self._check_text_field(e, field)
        parser = QueryParser(
            field=field, analyzer=self.analyzer, synonyms=self.synonyms,
            keyword_fields=self.keyword_fields,
        )
        return self._boosted(parser.parse((e.text or "").strip()), e)

    def _q_RangeQuery(self, e, field: str) -> Query:
        lower = e.get("lowerTerm") or None
        upper = e.get("upperTerm") or None
        inc_lo = _attr_bool(e, "includeLower", True)
        inc_hi = _attr_bool(e, "includeUpper", True)
        if field == self.default_field:
            return TermRangeQuery(lower, upper, include_lower=inc_lo,
                                  include_upper=inc_hi)
        # column range — filter-field semantics, never scored
        return ConstantScoreQuery(
            RangePredicate(column=field, lower=lower, upper=upper,
                           include_lower=inc_lo, include_upper=inc_hi),
            boost=0.0,
        )

    def _q_PointRangeQuery(self, e, field: str) -> Query:
        if field == self.default_field:
            raise ParserException(
                "<PointRangeQuery> targets a numeric column, not the text "
                "field"
            )
        typ = (e.get("type") or "int").lower()
        cast = _POINT_CASTS.get(typ)
        if cast is None:
            raise ParserException(
                "type attribute must be one of: [long, int, double, float]"
            )
        try:
            lower = e.get("lowerTerm")
            upper = e.get("upperTerm")
            lo = None if lower is None else cast(lower)
            hi = None if upper is None else cast(upper)
        except ValueError as err:
            raise ParserException(
                "Could not parse lowerTerm or upperTerm into a number"
            ) from err
        return ConstantScoreQuery(
            RangePredicate(column=field, lower=lo, upper=hi), boost=0.0
        )

    # -- span dispatch (SpanQueryBuilderFactory) ------------------------------
    def _get_span(self, e, field: str) -> SpanQuery:
        field = self._field(e, field)
        tag = e.tag
        if tag not in _SPAN_TAGS:
            raise ParserException(f"<{tag}> is not a span element")
        self._check_text_field(e, field)
        if tag in ("SpanTerm", "BoostingTermQuery"):
            return SpanTermQuery(_text_or_fail(e))
        if tag == "SpanOrTerms":
            terms = self._analyze(_text_or_fail(e))
            return SpanOrQuery(tuple(SpanTermQuery(t) for t in terms))
        if tag == "SpanOr":
            return SpanOrQuery(
                tuple(self._get_span(kid, field) for kid in _children(e))
            )
        if tag == "SpanNear":
            slop = e.get("slop")
            if slop is None:
                raise ParserException("<SpanNear> requires a slop attribute")
            in_order = _attr_bool(e, "inOrder", False)
            return SpanNearQuery(
                tuple(self._get_span(kid, field) for kid in _children(e)),
                slop=int(slop),
                in_order=in_order,
            )
        if tag == "SpanNot":
            inc = exc = None
            for kid in _children(e):
                if kid.tag == "Include":
                    inc = kid
                elif kid.tag == "Exclude":
                    exc = kid
            if inc is None or exc is None or not _children(inc) or not _children(exc):
                raise ParserException(
                    "<SpanNot> requires <Include> and <Exclude> children"
                )
            return SpanNotQuery(
                self._get_span(_children(inc)[0], field),
                self._get_span(_children(exc)[0], field),
            )
        if tag == "SpanFirst":
            end = _attr_int(e, "end", 1)
            kids = _children(e)
            if not kids:
                raise ParserException("<SpanFirst> requires a child span")
            return SpanFirstQuery(self._get_span(kids[0], field), end)
        if tag == "SpanPositionRange":
            start = _attr_int(e, "start", 1)
            end = _attr_int(e, "end", 1)
            kids = _children(e)
            if not kids:
                raise ParserException(
                    "<SpanPositionRange> requires a child span"
                )
            return SpanPositionRangeQuery(
                self._get_span(kids[0], field), start, end
            )
        raise ParserException(f"no span builder for element <{tag}>")
