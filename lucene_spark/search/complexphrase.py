"""ComplexPhraseQueryParser: phrases with embedded wildcards / fuzzies /
ranges / boolean groups, rewritten onto the span surface.

≙ ``queryparser/complexPhrase/ComplexPhraseQueryParser.java``:

* grammar = the classic parser's (this class subclasses it, exactly like the
  reference extends ``classic.QueryParser``); only the PHRASE atom changes —
  the quoted content is re-parsed as a mini query
  (ComplexPhraseQueryParser.java:85-135 two-pass design collapses to one
  recursive pass here: our parser is re-entrant, the reference's JavaCC one
  is not, which is the only reason it needs the pass-2 machinery)
* each top-level clause of the re-parsed phrase body becomes one SpanNear
  slot (ComplexPhraseQuery.rewrite:258-363):
    - TermQuery               -> SpanTermQuery
    - multi-term query        -> expand against the index's term dictionary
                                 (SCORING_BOOLEAN_REWRITE analog, :96-111)
                                 -> SpanOr of the matching terms; an EMPTY
                                 expansion becomes a must-match-nothing span
                                 (the reference's "Dummy clause" :304-316 —
                                 prevents "fred smithe*" matching on just
                                 "fred", LUCENE-8305)
    - SynonymQuery / grouped boolean -> SpanOr of the positive terms,
                                 wrapped in SpanNot when the group carries
                                 MUST_NOT members (addComplexPhraseClause
                                 :373-424)
* top-level MUST_NOT clauses inside the phrase ("fred -johns") produce the
  mixed positive/negative shape: include = SpanNear(positives, slop + #negs),
  exclude = SpanNear(all slots, slop), result = SpanNot(include, exclude)
  (:333-362)
* a SINGLE-element phrase returns the element query unchanged — term,
  multi-term, or synonym queries score natively, not as spans (:261-265)
* phrase slop maps to SpanNear slop verbatim; ``in_order`` defaults True
  (setInOrder :74-76); interior ^boosts are unwrapped and ignored inside
  spans (:291-293, TestComplexPhraseQuery.testBoosts), the phrase-level
  boost survives via the classic parser's caret handling

Scoring note (documented engine subset, same as search/spans.py): the
resulting span tree rides the interval machinery — saturation over minimal
intervals — rather than the reference spans module's sloppyFreq BM25; the
single-element passthrough scores with the engine's native term/multi-term
scorers, exactly as the reference returns the unwrapped query there.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lucene_spark.search.parser import QueryParseError, QueryParser
from lucene_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    MatchNoDocsQuery,
    Occur,
    PrefixQuery,
    Query,
    RegexpQuery,
    SynonymQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucene_spark.search.spans import (
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanQuery,
    SpanTermQuery,
)

_MULTI_TERM = (PrefixQuery, WildcardQuery, FuzzyQuery, RegexpQuery, TermRangeQuery)

# the reference's "Dummy clause because no terms found - must match nothing"
# (ComplexPhraseQueryParser.java:308): a term the tokenizer can never emit,
# so its position source is empty and the enclosing SpanNear matches nothing
_NO_MATCH_TERM = "__complex_phrase_no_match__"

DEFAULT_MAX_EXPANSIONS = 1024  # BooleanQuery.maxClauseCount analog


class ComplexPhraseQueryParser(QueryParser):
    """Classic parser + complex phrases.  Pass ``searcher`` (an
    IndexSearcher) to enable multi-term elements inside multi-slot phrases —
    they expand against the term dictionary at parse time, where the
    reference resolves them through ``indexSearcher.rewrite`` with the
    scoring-boolean rewrite forced (ComplexPhraseQueryParser.java:96-111).

    ``in_order=False`` gives un-ordered proximity (setInOrder analog)."""

    def __init__(self, field: str = "text", default_operator: str = "OR",
                 analyzer=None, synonyms=None,
                 keyword_fields: tuple = ("role", "tool"),
                 fuzzy_prefix_length: int = 0,
                 searcher=None, in_order: bool = True,
                 max_expansions: int = DEFAULT_MAX_EXPANSIONS):
        super().__init__(field, default_operator, analyzer, synonyms,
                         keyword_fields, fuzzy_prefix_length)
        self.searcher = searcher
        self.in_order = in_order
        self.max_expansions = max_expansions

    # -- phrase atom override --------------------------------------------
    def _parse_atom(self, toks, pos):
        kind, m = toks[pos]
        if kind != "phrase":
            return super()._parse_atom(toks, pos)
        q = self._complex_phrase(
            m.group("phrase_body"), int(m.group("slop") or 0)
        )
        return self._boost_suffix(toks, pos + 1, q)

    def _complex_phrase(self, body: str, slop: int) -> Query:
        toks = self._lex(body)
        contents, p = self._parse_clauses(toks, 0)
        if p != len(toks):
            raise QueryParseError(f"unexpected token in phrase {body!r}")
        return self._rewrite_contents(contents, slop)

    # -- ComplexPhraseQuery.rewrite (java:258-363) ------------------------
    def _rewrite_contents(self, contents: Query, slop: int) -> Query:
        # single element: term / multi-term / synonym queries are returned
        # unchanged and score natively (java:261-265); an empty phrase is
        # MatchNoDocs either way
        if isinstance(
            contents, (TermQuery, SynonymQuery, MatchNoDocsQuery) + _MULTI_TERM
        ):
            return contents
        if not isinstance(contents, BooleanQuery):
            raise QueryParseError(
                f"unsupported query type {type(contents).__name__} "
                "inside a complex phrase"
            )
        slots: list[SpanQuery] = []
        negatives: list[bool] = []
        for c in contents.clauses:
            qc = c.query
            while isinstance(qc, BoostQuery):  # interior boosts: span-less
                qc = qc.query
            negatives.append(c.occur == Occur.MUST_NOT)
            slots.append(self._element_span(qc))
        num_neg = sum(negatives)
        if num_neg == 0:
            return SpanNearQuery(tuple(slots), slop=slop,
                                 in_order=self.in_order)
        if num_neg == len(slots):
            raise QueryParseError("phrase with only negative clauses")
        # mixed positives and negatives (java:337-362): match the positive
        # sequence (slop widened by the gaps the negatives would fill) minus
        # any window where the FULL sequence, negatives included, occurs
        positives = [s for s, neg in zip(slots, negatives) if not neg]
        include = (
            positives[0]
            if len(positives) == 1
            else SpanNearQuery(tuple(positives), slop=slop + num_neg,
                               in_order=self.in_order)
        )
        exclude = SpanNearQuery(tuple(slots), slop=slop,
                                in_order=self.in_order)
        return SpanNotQuery(include, exclude)

    def _element_span(self, qc: Query) -> SpanQuery:
        """One phrase slot -> SpanQuery (java:295-329)."""
        if isinstance(qc, TermQuery):
            return SpanTermQuery(qc.term)
        if isinstance(qc, MatchNoDocsQuery):
            return SpanTermQuery(_NO_MATCH_TERM)
        if isinstance(qc, _MULTI_TERM):
            terms = self._expand_multiterm(qc)
            if not terms:
                return SpanTermQuery(_NO_MATCH_TERM)
            if len(terms) == 1:
                return SpanTermQuery(terms[0])
            return SpanOrQuery(tuple(SpanTermQuery(t) for t in terms))
        if isinstance(qc, (BooleanQuery, SynonymQuery)):
            span = self._group_span(qc)
            # a group with no positive members cannot match (java:300-309)
            return SpanTermQuery(_NO_MATCH_TERM) if span is None else span
        raise QueryParseError(
            f"unsupported clause {type(qc).__name__} inside a complex phrase"
        )

    def _group_span(self, qc: Query):
        """Compose a group's positive/negative members into one span
        alternative — SpanOr(ors) minus SpanOr(nots) — or None when the
        group has no positive members (java:413-423)."""
        ors, nots = [], []
        self._add_group(qc, ors, nots)
        if not ors:
            return None
        include = ors[0] if len(ors) == 1 else SpanOrQuery(tuple(ors))
        if not nots:
            return include
        exclude = nots[0] if len(nots) == 1 else SpanOrQuery(tuple(nots))
        return SpanNotQuery(include, exclude)

    def _add_group(self, qc: Query, ors: list, nots: list) -> None:
        """addComplexPhraseClause (java:373-424): split a group's members
        into positive/negative span alternatives."""
        if isinstance(qc, SynonymQuery):
            ors.extend(SpanTermQuery(t) for t in qc.terms)
            return
        for c in qc.clauses:
            child = c.query
            while isinstance(child, BoostQuery):
                child = child.query
            chosen = nots if c.occur == Occur.MUST_NOT else ors
            if isinstance(child, TermQuery):
                chosen.append(SpanTermQuery(child.term))
            elif isinstance(child, _MULTI_TERM):
                terms = self._expand_multiterm(child)
                if not terms:
                    chosen.append(SpanTermQuery(_NO_MATCH_TERM))
                else:
                    chosen.extend(SpanTermQuery(t) for t in terms)
            elif isinstance(child, (BooleanQuery, SynonymQuery)):
                # a nested group composes into ONE alternative in the
                # chosen list; its own negatives stay local to it
                sub = self._group_span(child)
                if sub is not None:
                    chosen.append(sub)
            elif isinstance(child, MatchNoDocsQuery):
                chosen.append(SpanTermQuery(_NO_MATCH_TERM))
            else:
                raise QueryParseError(
                    f"unsupported clause {type(child).__name__} "
                    "inside a complex phrase group"
                )

    # -- term-dictionary expansion ----------------------------------------
    def _expand_multiterm(self, q: Query) -> list:
        if self.searcher is None:
            raise QueryParseError(
                "a multi-term element inside a multi-slot phrase needs a "
                "searcher to expand against the term dictionary"
            )
        if isinstance(q, PrefixQuery):
            pred = F.col("term").startswith(q.prefix)
        elif isinstance(q, WildcardQuery):
            from lucene_spark.search.searcher import _wildcard_to_regex

            pred = F.col("term").rlike(_wildcard_to_regex(q.pattern))
        elif isinstance(q, RegexpQuery):
            pred = F.col("term").rlike(f"^(?:{q.pattern})$")
        elif isinstance(q, FuzzyQuery):
            # same cheap length pre-filter + exact levenshtein as the
            # engine's scored fuzzy path (searcher._scored_fuzzy)
            pred = (
                (F.abs(F.length(F.col("term")) - len(q.term)) <= q.max_edits)
                & (F.levenshtein(F.col("term"), F.lit(q.term)) <= q.max_edits)
            )
            if q.prefix_length:
                pred = pred & F.col("term").startswith(q.term[: q.prefix_length])
        elif isinstance(q, TermRangeQuery):
            pred = F.lit(True)
            if q.lower is not None:
                pred = pred & (
                    F.col("term") >= q.lower
                    if q.include_lower
                    else F.col("term") > q.lower
                )
            if q.upper is not None:
                pred = pred & (
                    F.col("term") <= q.upper
                    if q.include_upper
                    else F.col("term") < q.upper
                )
        else:  # pragma: no cover - guarded by callers
            raise QueryParseError(f"cannot expand {type(q).__name__}")
        rows = (
            self.searcher._expand_terms(pred)
            .select("term")
            .limit(self.max_expansions + 1)
            .collect()
        )
        if len(rows) > self.max_expansions:
            raise QueryParseError(
                f"phrase element expands past {self.max_expansions} terms"
            )
        return sorted(r.term for r in rows)
