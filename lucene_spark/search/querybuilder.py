"""Query-time synonym expansion: analyzed query construction.

≙ ``core/util/QueryBuilder.java`` (createBooleanQuery/createFieldQuery:
analyzed tokens become term clauses; tokens that the synonym graph expands
become SynonymQuery for single-token alternatives and phrase alternatives
for multi-token ones) + ``analysis/common/.../synonym/SynonymGraphFilter
.java`` (greedy longest-match rule application over the token stream —
SynonymGraphFilter.parse matches the LONGEST rule first and does not
re-match inside a replacement).

The reference wires synonyms as a TokenFilter inside the query analyzer;
here the rules are a small driver-side map applied to the analyzer's
output tokens — the same observable expansion, Spark-first (the resulting
Query tree lowers to the existing SynonymQuery / PhraseQuery scorers, so
everything stays declarative and oracle-checkable).

Rule sides are themselves run through the analyzer (the reference builds
SynonymMap entries through an Analyzer too — SynonymMap.Builder.join), so
stems/stopwords behave identically on both sides of a rule.
"""

from __future__ import annotations

from typing import Iterable

from lucene_spark.analysis.tokenizer import tokenize_text
from lucene_spark.search.query import (
    BooleanQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    Query,
    SynonymQuery,
    TermQuery,
)


class QueryTimeSynonyms:
    """Greedy longest-match synonym rules over analyzed token sequences.

    ``rules``: iterable of (src_phrase, dst_phrase) strings; both sides are
    analyzed with ``analyzer`` (tokenize-only when None).  Multiple rules
    with the same src accumulate alternatives.
    """

    def __init__(self, rules: Iterable[tuple[str, str]], analyzer=None):
        def toks(s: str) -> tuple[str, ...]:
            if analyzer is not None:
                return tuple(analyzer.analyze_query(s))
            return tuple(tokenize_text(s))

        self.map: dict[tuple[str, ...], list[tuple[str, ...]]] = {}
        self.max_src_len = 0
        for src, dst in rules:
            s, d = toks(src), toks(dst)
            if not s or not d:
                continue
            self.map.setdefault(s, [])
            if d not in self.map[s]:
                self.map[s].append(d)
            self.max_src_len = max(self.max_src_len, len(s))

    def elements(self, tokens: list[str]) -> list[tuple[tuple[str, ...], list[tuple[str, ...]]]]:
        """[(source_span, [alternative_seq, ...])] — greedy longest-match
        left-to-right scan (SynonymGraphFilter.parse); unmatched tokens
        yield ((tok,), [])."""
        out = []
        i = 0
        n = len(tokens)
        while i < n:
            matched = None
            for ln in range(min(self.max_src_len, n - i), 0, -1):
                span = tuple(tokens[i : i + ln])
                if span in self.map:
                    matched = (span, list(self.map[span]))
                    break
            if matched is None:
                out.append(((tokens[i],), []))
                i += 1
            else:
                out.append(matched)
                i += len(matched[0])
        return out


def _seq_query(seq: tuple[str, ...]) -> Query:
    return TermQuery(seq[0]) if len(seq) == 1 else PhraseQuery(seq)


def element_query(span: tuple[str, ...], alts: list[tuple[str, ...]]) -> Query:
    """One positions-worth of query (QueryBuilder.analyzeGraphBoolean):

    * no alternatives → TermQuery (or PhraseQuery for a multi-token span
      that only exists as a rule source — not produced by ``elements``)
    * single-token span + all-single-token alternatives → SynonymQuery
      (scored as ONE pseudo-term: summed freq, max df — SynonymQuery.java)
    * any multi-token side → SHOULD-group of the span and each alternative
      (phrase alternatives, QueryBuilder.analyzeGraphPhrase's boolean form)
    """
    if not alts:
        return _seq_query(span)
    if len(span) == 1 and all(len(a) == 1 for a in alts):
        members = list(dict.fromkeys(span + tuple(a[0] for a in alts)))
        return SynonymQuery(tuple(members))
    branches = [_seq_query(span)] + [_seq_query(a) for a in alts]
    return BooleanQuery.of(*[(b, Occur.SHOULD) for b in branches])




def split_delimited_boosts(text: str, delimiter: str):
    """[(chunk, boost)] — the DelimitedBoostTokenFilter split (first
    delimiter; float tail validated, Float.parseFloat semantics; no
    delimiter -> boost 1).  Single source of truth for the boolean path,
    the phrase path and the oracle twins."""
    out = []
    for r in (text.split() if text else []):
        i = r.find(delimiter)
        if i < 0:
            out.append((r, 1.0))
        else:
            out.append((r[:i], float(r[i + len(delimiter):])))
    return out


class QueryBuilder:
    """createBooleanQuery / createPhraseQuery over analyzed text with
    query-time synonym expansion (core/util/QueryBuilder.java:90-150).

    ``delimited_boost``: DelimitedBoostTokenFilter
    (analysis/common/.../boost/DelimitedBoostTokenFilter.java:33) in the
    query chain — "term|boost" splits at the FIRST delimiter, the float
    tail becomes the token's BoostAttribute, which createFieldQuery
    consumes (QueryBuilder.TermAndBoost): the resulting clause is the
    TermQuery wrapped in that boost.  A token without the delimiter keeps
    boost 1.  Applies to create_boolean_query only (the reference's
    boosted-synonym/expansion path); phrases take no per-term boosts."""

    def __init__(
        self,
        analyzer=None,
        synonyms: QueryTimeSynonyms | None = None,
        delimited_boost: str | None = None,
    ):
        if synonyms is not None and delimited_boost is not None:
            # boosted tokens bypass the synonym-element grouping; refuse
            # rather than silently dropping the rules
            raise ValueError(
                "delimited_boost and synonyms are mutually exclusive"
            )
        self.analyzer = analyzer
        self.synonyms = synonyms
        self.delimited_boost = delimited_boost

    def _tokens(self, text: str) -> list[str]:
        if self.analyzer is not None:
            return self.analyzer.analyze_query(text)
        return tokenize_text(text)

    def create_boolean_query(self, text: str, occur: Occur = Occur.SHOULD) -> Query:
        """SHOULD (or MUST, for an AND default operator) of one clause per
        synonym element."""
        boosts: list[float] = []
        if self.delimited_boost is not None:
            # split BEFORE analysis so the delimiter/number never reach
            # the tokenizer (the filter's right-after-tokenizer slot on a
            # whitespace stream; Float.parseFloat raises on a bad tail)
            toks = []
            for term_text, b in split_delimited_boosts(
                text, self.delimited_boost
            ):
                for t in self._tokens(term_text):
                    toks.append(t)
                    boosts.append(b)
        else:
            toks = self._tokens(text)
        if not toks:
            return MatchNoDocsQuery()
        if self.synonyms is not None and not boosts:
            elems = self.synonyms.elements(toks)
        else:
            elems = [((t,), []) for t in toks]
        clauses = [element_query(span, alts) for span, alts in elems]
        if boosts:
            from lucene_spark.search.query import BoostQuery

            clauses = [
                c if b == 1.0 else BoostQuery(c, b)
                for c, b in zip(clauses, boosts)
            ]
        if len(clauses) == 1:
            # single element: the clause itself (QueryBuilder.analyzeTerm)
            return clauses[0]
        return BooleanQuery.of(*[(c, occur) for c in clauses])

    def create_phrase_query(self, text: str, slop: int = 0) -> Query:
        """Exact-phrase build (no synonym expansion inside phrases — the
        classic parser's quoted-phrase behavior; graph phrases are the
        SHOULD-group form from create_boolean_query).  With
        ``delimited_boost`` configured, "term|b" markup is stripped first
        (phrase matching ignores per-term boosts, like the reference's
        PhraseQuery ignoring BoostAttribute; the boost tail is validated
        so a typo still raises)."""
        if self.delimited_boost is not None and text:
            text = " ".join(
                c for c, _ in split_delimited_boosts(text, self.delimited_boost)
            )
        if self.analyzer is not None:
            pairs = self.analyzer.analyze_query_positions(text)
        else:
            pairs = [(t, i) for i, t in enumerate(tokenize_text(text))]
        if not pairs:
            return MatchNoDocsQuery()
        if len(pairs) == 1:
            return TermQuery(pairs[0][0])
        ps = tuple(p for _, p in pairs)
        return PhraseQuery(
            tuple(t for t, _ in pairs),
            slop=slop,
            positions=None if ps == tuple(range(len(ps))) else ps,
        )
