"""Immutable query tree (≙ org.apache.lucene.search.Query hierarchy).

Each class documents the reference operator it reproduces (SURVEY.md §2.6).
The tree is *logical*; ``IndexSearcher`` lowers it to a DataFrame plan and
Catalyst picks the physical strategy.  A small ``rewrite`` normalization pass
mirrors the reference's fixpoint ``Query.rewrite`` loop
(core/search/IndexSearcher.java:737-746): single-clause unwrap, nested
flatten, duplicate-clause dedup (TestBooleanRewrites-style simplifications).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Optional, Sequence


class Occur(Enum):
    """core/search/BooleanClause.java:25-81."""

    MUST = "MUST"
    FILTER = "FILTER"
    SHOULD = "SHOULD"
    MUST_NOT = "MUST_NOT"


class Query:
    def rewrite(self) -> "Query":
        return self


@dataclass(frozen=True)
class TermQuery(Query):
    """core/search/TermQuery.java:36 — docs containing term, BM25-scored."""

    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class SynonymQuery(Query):
    """core/search/SynonymQuery.java:50 — several terms scored as one term:
    freq = sum of freqs, df = max df of members (blended)."""

    terms: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class CommonTermsQuery(Query):
    """queries/.../CommonTermsQuery.java:66 — terms split by document
    frequency: low-frequency terms drive matching (``low_freq_occur`` +
    ``low_freq_min_should_match``), high-frequency (common) terms only
    contribute score.  A term is "common" when doc_freq >
    ``max_term_frequency`` (a fraction of maxDoc when < 1, an absolute
    count otherwise — CommonTermsQuery.java:338-344).  The searcher
    rewrites against the live term dictionary (needs doc freqs)."""

    terms: tuple
    max_term_frequency: float = 0.01
    low_freq_occur: "Occur" = None  # defaults applied in searcher (SHOULD)
    high_freq_occur: "Occur" = None
    low_freq_min_should_match: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class BooleanClause:
    query: Query
    occur: Occur


@dataclass(frozen=True)
class BooleanQuery(Query):
    """core/search/BooleanQuery.java — MUST/FILTER/SHOULD/MUST_NOT +
    minimumNumberShouldMatch.  Pure-negation queries are illegal (same as the
    reference).  When MUST or FILTER clauses exist, SHOULD clauses are
    optional score contributors; otherwise at least max(1, minShouldMatch)
    SHOULD clauses must match (Boolean2ScorerSupplier.java:130-155)."""

    clauses: tuple
    min_should_match: int = 0

    @staticmethod
    def of(*pairs, min_should_match: int = 0) -> "BooleanQuery":
        return BooleanQuery(
            tuple(BooleanClause(q, o) for q, o in pairs), min_should_match
        )

    def rewrite(self) -> Query:
        clauses = []
        for c in self.clauses:
            q = c.query.rewrite()
            # flatten nested pure-SHOULD boolean into parent SHOULD
            if (
                isinstance(q, BooleanQuery)
                and c.occur == Occur.SHOULD
                and q.min_should_match <= 1
                and all(cc.occur == Occur.SHOULD for cc in q.clauses)
            ):
                clauses.extend(q.clauses)
            else:
                clauses.append(BooleanClause(q, c.occur))
        # dedup identical (query, occur) pairs for non-scoring occurs
        seen, out = set(), []
        for c in clauses:
            key = (c.query, c.occur)
            if c.occur in (Occur.FILTER, Occur.MUST_NOT) and key in seen:
                continue
            seen.add(key)
            out.append(c)
        # single SHOULD clause and nothing else -> unwrap
        if len(out) == 1 and out[0].occur in (Occur.SHOULD, Occur.MUST) and self.min_should_match <= 1:
            return out[0].query
        return BooleanQuery(tuple(out), self.min_should_match)


@dataclass(frozen=True)
class PhraseQuery(Query):
    """core/search/PhraseQuery.java:69-141 — terms at consecutive positions;
    slop>0 = sloppy phrase (SloppyPhraseMatcher.java:52).  ``positions``
    gives explicit query positions (PhraseQuery.Builder.add(term, position))
    — e.g. holes left by removed stopwords; None = consecutive 0..n-1."""

    terms: tuple
    slop: int = 0
    boost: float = 1.0
    positions: tuple | None = None


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """core/search/MultiPhraseQuery.java — phrase where each position
    admits alternative terms: terms_per_pos = ((t1a, t1b), (t2a,), ...).
    ``slop`` > 0 = sloppy matching over the slots' unioned position lists
    (MultiPhraseQuery.java:92 setSlop; SloppyPhraseMatcher's multi-term
    repeat groups handle slots sharing alternatives).  ``positions`` gives
    explicit query positions per slot (Builder.add(Term[], position) —
    stopword holes); None = consecutive 0..n-1."""

    terms_per_pos: tuple  # tuple of tuples of alternative terms
    slop: int = 0
    boost: float = 1.0
    positions: tuple | None = None


@dataclass(frozen=True)
class FeatureQuery(Query):
    """core/document/FeatureField.java — static per-document scoring
    signals (pagerank, recency, quality...).  The reference encodes the
    feature value into a term's frequency (with 9-bit-mantissa precision
    loss); here features are plain numeric doc columns (columnar storage
    keeps the exact value — SURVEY.md §1.1 'DocValues are free'), scored
    with the same functions: newLogQuery -> boost * ln(scaling + v);
    newSaturationQuery -> boost * v/(v + pivot); newSigmoidQuery ->
    boost * v^a/(v^a + pivot^a).  Docs with NULL or <= 0 values don't
    match (FeatureField skips non-positive values)."""

    field: str
    function: str = "saturation"  # log | saturation | sigmoid
    pivot: float = 1.0
    scaling: float = 1.0  # log function's scalingFactor
    exp: float = 1.0  # sigmoid's exponent
    boost: float = 1.0


@dataclass(frozen=True)
class FunctionScoreQuery(Query):
    """queries/function/FunctionScoreQuery.java:52 — score every match of
    the wrapped query with a per-document expression instead of the
    wrapped score.  ``source`` is a Spark SQL expression over the doc
    columns (conv_id, turn_idx, role, tool, ts, length, ...) plus the
    pseudo-column ``_score`` carrying the wrapped query's score — the
    expressions-module bindings surface (expressions/.../SimpleBindings:
    ``_score`` ≙ DoubleValuesSource.SCORES, a doc column ≙ fromField),
    evaluated JVM-side by Catalyst instead of a compiled expression.
    The match set is exactly the wrapped query's (the function never
    matches new docs); ``boost`` multiplies the function value (the
    reference's ``FunctionScoreQuery.boostByValue`` composition)."""

    query: Query
    source: str
    boost: float = 1.0


@dataclass(frozen=True)
class CoveringQuery(Query):
    """sandbox/search/CoveringQuery.java:51 — a disjunction whose required
    number of matching clauses is a PER-DOCUMENT long value instead of a
    constant minimumShouldMatch.  ``min_match_source`` is a Spark SQL
    expression over the doc columns (the LongValuesSource); values < 1
    are treated as 1 and docs where the expression is NULL never match
    (CoveringQuery.java:66-68).  The score is the sum of the matching
    sub-queries' scores (CoveringScorer.java:211-217)."""

    queries: tuple  # tuple[Query, ...]
    min_match_source: str


@dataclass(frozen=True)
class FunctionRangeQuery(Query):
    """queries/function/FunctionRangeQuery.java:44 — match docs whose
    function value (a ValueSource; here a Spark SQL expression over the
    doc columns) falls within [lower, upper], scoring each match with the
    function value itself (ValueSourceScorer.java:88 returns
    ``values.floatVal(doc)``).  NULL expression values never match
    (FunctionValues.getRangeScorer skips docs without a value)."""

    source: str
    lower: float | None = None
    upper: float | None = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class CombinedFieldQuery(Query):
    """BM25F over a pseudo-field merging the analyzed text with weighted
    keyword doc columns — sandbox/search/CombinedFieldQuery.java:78 (which
    scores "as if all terms had been indexed in a single combined field"
    with per-field weights).  Here the combined statistics are defined
    exactly (and the DuckDB twin reproduces them):

      freq'(d,t) = freq_text(d,t) + Σ_f w_f * [doccol_f(d) = t]
      dl'(d)     = length(d) + Σ_f w_f          (each keyword column
                                                 contributes one token)
      df'(t)     = #docs with freq'(d,t) > 0
      sttf'      = sumTotalTermFreq_text + Σ_f w_f * maxDoc
      score      = Σ_t BM25_f64(freq', df', dl', avgdl' = sttf'/docCount)

    ``fields`` pairs keyword column names with weights; multi-term queries
    sum per-term scores (SHOULD semantics, like the reference's rewrite).
    Norms for the pseudo-field are exact (no byte4 quantization): the
    columnar substrate stores plain values, so nothing forces the
    8-bit norm loss here."""

    terms: tuple
    fields: tuple = (("role", 1.0), ("tool", 1.0))
    boost: float = 1.0

    def __init__(self, terms, fields=(("role", 1.0), ("tool", 1.0)), boost=1.0):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(
            self, "fields", tuple((str(c), float(w)) for c, w in fields)
        )
        object.__setattr__(self, "boost", float(boost))


@dataclass(frozen=True)
class BlendedTermQuery(Query):
    """core/search/BlendedTermQuery.java:281-315 — several related terms
    scored as if they shared statistics: every term's docFreq is replaced
    by the MAX docFreq across members (so rarer variants aren't over-
    boosted), then combined with DisjunctionMax(tie_breaker=0.01)
    (DISJUNCTION_MAX_REWRITE, :154-189).  ``boosts`` pairs with ``terms``
    (default all 1.0)."""

    terms: tuple
    boosts: tuple | None = None
    tie_breaker: float = 0.01
    boost: float = 1.0


@dataclass(frozen=True)
class IntervalQuery(Query):
    """queries/.../intervals/IntervalQuery.java — match docs where an
    IntervalsSource (search.intervals: Term/Ordered/Unordered/MaxGaps/
    MaxWidth) produces at least one interval; score = saturation:
    boost * (1 - pivot/(pivot + freq)) with freq = Σ 1/max(len-minExtent+1,
    1) over the traversal's intervals (IntervalScorer.java:66-74,
    IntervalScoreFunction.java:56-75)."""

    source: object  # search.intervals.IntervalsSource
    pivot: float = 1.0
    boost: float = 1.0


@dataclass(frozen=True)
class SortField:
    """core/search/SortField.java:60-119 — sort by a doc-values field.

    ``field``: a docs-relation column name, or the specials ``"score"``
    (relevance — natural order is best-first, i.e. descending score) and
    ``"doc"`` (docID — natural order ascending).  ``reverse`` flips the
    natural order, exactly like the reference's ``SortField(f, type,
    reverse)``.  Missing (null) values sort last in natural order."""

    field: str
    reverse: bool = False


@dataclass(frozen=True)
class Sort:
    """core/search/Sort.java — an ordered chain of SortFields.  An implicit
    (doc asc) tie-break terminates every chain (TopFieldCollector
    semantics)."""

    fields: tuple  # tuple[SortField, ...]

    @classmethod
    def by(cls, *fields: SortField) -> "Sort":
        return cls(tuple(fields))

    @classmethod
    def relevance(cls) -> "Sort":
        return cls((SortField("score"),))

    @classmethod
    def index_order(cls) -> "Sort":
        return cls((SortField("doc"),))


@dataclass(frozen=True)
class TermInSetQuery(Query):
    """core/search/TermInSetQuery.java:72 — field IN (set), constant score."""

    terms: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class PrefixQuery(Query):
    """core/search/PrefixQuery.java — expands against the term dictionary,
    constant-score rewrite (MultiTermQuery.java:39-83)."""

    prefix: str
    boost: float = 1.0


@dataclass(frozen=True)
class WildcardQuery(Query):
    """core/search/WildcardQuery.java — ``*`` any, ``?`` single char."""

    pattern: str
    boost: float = 1.0


@dataclass(frozen=True)
class RegexpQuery(Query):
    """core/search/RegexpQuery.java — regex over the term dictionary."""

    pattern: str
    boost: float = 1.0


@dataclass(frozen=True)
class FuzzyQuery(Query):
    """core/search/FuzzyQuery.java:52-54 — edit distance <= max_edits
    (<=2), top maxExpansions terms by df kept (TopTermsRewrite).
    ``transpositions`` (the reference's default, FuzzyQuery.java:82 —
    ``defaultTranspositions = true``) counts an adjacent swap as ONE
    primitive edit: the Levenshtein-automaton-with-transpositions
    acceptance = optimal string alignment (OSA) distance.  False gives
    classic Levenshtein."""

    term: str
    max_edits: int = 2
    prefix_length: int = 0
    max_expansions: int = 50
    boost: float = 1.0
    transpositions: bool = True


@dataclass(frozen=True)
class TermRangeQuery(Query):
    """core/search/TermRangeQuery.java — lexicographic term range."""

    lower: Optional[str]
    upper: Optional[str]
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class FuzzyLikeThisQuery(Query):
    """sandbox/queries/FuzzyLikeThisQuery.java:65 — "fuzzifies" free text:
    each analyzed token of each (query_string, max_edits, prefix_length)
    entry expands to its dictionary variants within OSA distance
    (FuzzyTermsEnum with transpositions), each variant scored
    ``similarity² · ClassicSimilarity.idf(df, numDocs)`` where similarity
    = 1 - ed/min(|token|, |variant|) (the FuzzyTermsEnum boost) and df is
    the source token's docFreq — or the integer-mean of the variants'
    when the token itself is absent (addTerms:245-249).  The top
    ``max_num_terms`` variants overall become SHOULD clauses whose
    TermQueries carry ARTIFICIAL df=1 stats (newTermQuery:258-274), or
    constant-score clauses under ``ignore_tf``."""

    field_vals: tuple  # tuple[(query_string, max_edits, prefix_length)]
    max_num_terms: int = 50
    ignore_tf: bool = False
    max_variants_per_term: int = 50  # MAX_VARIANTS_PER_TERM (.java:74)


@dataclass(frozen=True)
class PhraseWildcardQuery(Query):
    """sandbox/search/PhraseWildcardQuery.java:63 — a generalized
    PhraseQuery where any slot may be a multi-term sub-query (prefix /
    wildcard / regexp / fuzzy / term-range); a document matches when the
    slots appear adjacent in order with ANY expansion of each multi-term
    slot.  ``max_multi_term_expansions`` is the reference's
    maxMultiTermExpansions budget shared across all multi-term slots
    (expansion truncates, keeping the highest-docFreq terms — the
    TopTermsRewrite order).  Scoring goes through the engine's uniform
    span/interval saturation surface, like complex phrases."""

    clauses: tuple  # tuple[Query, ...] — TermQuery or multi-term nodes
    max_multi_term_expansions: int = 128


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    """core/search/MatchAllDocsQuery.java — every doc, score = boost."""

    boost: float = 1.0


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    """core/search/MatchNoDocsQuery.java."""


@dataclass(frozen=True)
class FieldExistsQuery(Query):
    """core/search/FieldExistsQuery.java — docs where column IS NOT NULL."""

    column: str
    boost: float = 1.0


@dataclass(frozen=True)
class BoostQuery(Query):
    """core/search/BoostQuery.java — score(sub) * boost."""

    query: Query
    boost: float

    def rewrite(self) -> Query:
        q = self.query.rewrite()
        if isinstance(q, TermQuery):
            return TermQuery(q.term, q.boost * self.boost)
        if isinstance(q, BoostQuery):
            return BoostQuery(q.query, q.boost * self.boost)
        return BoostQuery(q, self.boost)


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    """core/search/ConstantScoreQuery.java — matches(sub), score ≡ boost."""

    query: Query
    boost: float = 1.0


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """core/search/DisjunctionMaxQuery.java — score = max(subs) +
    tie_breaker * (sum(subs) - max(subs))."""

    queries: tuple
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class RangePredicate(Query):
    """PointRangeQuery analog (core/search/PointRangeQuery.java:51) — a plain
    column predicate on the docs table (ts / turn_idx / role ...); Catalyst +
    Parquet min-max stats replace the BKD tree."""

    column: str
    lower: object = None
    upper: object = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class KnnVectorQuery(Query):
    """KnnFloatVectorQuery analog (core/search/KnnFloatVectorQuery.java:45):
    the k nearest vectors to ``query_vec`` among docs accepted by ``filter``
    (pre-filter semantics — the filter restricts the candidate set BEFORE
    top-k, so exactly k docs match when k candidates pass).  Score is
    Lucene's cosine similarity mapping (1 + cos) / 2
    (index/VectorSimilarityFunction.java COSINE), times ``boost``.

    Like the reference's rewrite to a DocAndScoreQuery, only the k nearest
    docs MATCH this query, so it composes under BooleanQuery as any occur:
    SHOULD adds its similarity score to BM25 clauses (hybrid retrieval),
    MUST/FILTER constrains to the k-doc set, MUST_NOT excludes it.

    Vectors come from ``IndexSearcher.with_vectors``; when an IVF index
    path was registered and there is no filter, candidates are read from
    the probed partitions only (partition-pruned scan), otherwise the scan
    is exact brute-force over the (filtered) vector relation."""

    query_vec: tuple
    k: int = 10
    filter: Query | None = None
    boost: float = 1.0

    def __init__(self, query_vec, k: int = 10, filter: Query | None = None,
                 boost: float = 1.0):
        object.__setattr__(self, "query_vec", tuple(float(x) for x in query_vec))
        object.__setattr__(self, "k", int(k))
        object.__setattr__(self, "filter", filter)
        object.__setattr__(self, "boost", float(boost))


@dataclass(frozen=True)
class PayloadScoreQuery(Query):
    """queries/payloads/PayloadScoreQuery.java:43 — score docs by a
    PayloadFunction folded over the payloads collected at the matched
    spans' leaf positions.

    Exact reference semantics (PayloadSpans.collectLeaf:219-232 + the
    function classes):

    * every leaf position of every matched span collects one payload
      factor; a NULL payload decodes to 1 (PayloadDecoder.java:29);
    * ``function``: 'min'/'max' seed on the first factor then fold
      (Min/MaxPayloadFunction.currentScore's numPayloadsSeen==0 guard),
      'sum' adds, 'avg' sums then divides by numPayloadsSeen;
    * docScore with zero payloads seen is 1 (every docScore impl);
    * ``include_span_score``: multiply by the wrapped span query's own
      score (PayloadSpanScorer.scoreCurrentDoc).  In this engine the span
      score is the interval scorer's saturation score (the documented
      span-scoring model, search/spans.py).

    ``wrapped`` must be a span query whose leaf payloads the engine can
    gather as JVM array algebra: SpanTermQuery, or an in-order
    SpanNearQuery of plain terms with slop 0 (the exact-phrase shape —
    the common reference usage).  Payloads must have been indexed with
    ``IndexBuilder(payload_delimiter=...)``."""

    wrapped: "Query"
    function: str = "max"
    include_span_score: bool = False

    def __post_init__(self):
        if self.function not in ("min", "max", "avg", "sum"):
            raise ValueError(
                "PayloadFunction must be min/max/avg/sum, got "
                f"{self.function!r}"
            )


@dataclass(frozen=True)
class SpanPayloadCheckQuery(Query):
    """queries/payloads/SpanPayloadCheckQuery.java:45 — only spans whose
    collected leaf payloads satisfy ``op`` against ``payloads``,
    position-by-position.

    A span matches iff it collects exactly ``len(payloads)`` leaf payloads
    and every one satisfies the comparison against its counterpart
    (PayloadCheckCollector + PayloadMatcherFactory; EQ additionally
    requires the count to match — upto == payloadToMatch.size()).  A NULL
    indexed payload never matches.  Payload type is numeric (FLOAT/INT
    payload columns — the engine's indexed payload representation); the
    raw-bytes STRING type is out of scope with the IdentityEncoder.

    Scoring: the engine scores a matching doc by its matching-span count
    (documented deviation — the reference scores filtered spans through
    the sloppyFreq similarity; this engine's one positional scoring model
    is the interval scorer, search/spans.py, and the check gate shape
    only needs a deterministic rank)."""

    match: "Query"
    payloads: tuple
    op: str = "eq"

    def __post_init__(self):
        if self.op not in ("eq", "gt", "gte", "lt", "lte"):
            raise ValueError(f"unknown payload match op {self.op!r}")
        object.__setattr__(
            self, "payloads", tuple(float(p) for p in self.payloads)
        )


@dataclass(frozen=True)
class DocValuesTermsQuery(Query):
    """queries/.../DocValuesTermsQuery.java:61 — docs whose doc-values
    column holds one of ``values`` (the dv-side TermInSetQuery twin used
    when the field is indexed as doc values only, or as the dv arm of
    IndexOrDocValuesQuery).  Constant score; the engine lowers it to a
    pushed-down IN predicate on the docs relation — the parquet scan
    filters on column stats exactly like the reference's sorted-set
    lookup avoids the terms index."""

    column: str
    values: tuple
    boost: float = 1.0

    def __init__(self, column: str, values, boost: float = 1.0):
        object.__setattr__(self, "column", column)
        object.__setattr__(self, "values", tuple(values))
        object.__setattr__(self, "boost", float(boost))
