"""Span queries: the classic positional-query surface, as thin adapters
over the intervals machinery.

≙ ``queries/.../spans/``: SpanTermQuery.java, SpanNearQuery.java (ordered/
unordered with slop), SpanOrQuery.java, SpanContainingQuery.java,
SpanWithinQuery.java, SpanFirstQuery.java.

Engine design: a span query REWRITES to an IntervalQuery over the
corresponding IntervalsSource (search.intervals) — the rewrite-fixpoint in
``IndexSearcher.search`` makes the whole span surface ride the existing
single-shuffle position-gather plan with zero new physical operators:

* SpanTermQuery(t)                → Term(t)
* SpanNearQuery(c…, slop, True)   → MaxGaps(slop, Ordered(c…))
  (SpanNearQuery slop = max allowed total gap between in-order clauses ≡
  the ordered interval's gaps() budget)
* SpanNearQuery(c…, slop, False)  → MaxGaps(slop, Unordered(c…))
* SpanOrQuery(c…)                 → Or(c…)   (minimal-interval union)
* SpanContainingQuery(big, little)→ Containing(big, little)
* SpanWithinQuery(little, big)    → ContainedBy(little, big)
* SpanFirstQuery(match, end)      → intervals with end < ``end``
  (span end is exclusive; interval end inclusive)

Matching parity with the reference's span stack holds for these
combinators (both emit minimal windows); SCORING follows the engine's
interval scorer (saturation over the minimal-interval freq,
IntervalScoreFunction.java) rather than the spans module's sloppyFreq
BM25 — one positional scoring model engine-wide, documented subset.
"""

from __future__ import annotations

from dataclasses import dataclass

from lucene_spark.search import intervals as iv
from lucene_spark.search.query import IntervalQuery, Query


class SpanQuery(Query):
    """Base: rewrites to IntervalQuery(source) — the searcher needs no
    span-specific lowering.  Wrap in BoostQuery to scale the score."""

    def to_source(self) -> iv.IntervalsSource:
        raise NotImplementedError

    def rewrite(self) -> Query:
        return IntervalQuery(self.to_source())


@dataclass(frozen=True)
class SpanTermQuery(SpanQuery):
    """spans/SpanTermQuery.java — one term's positions as unit spans."""

    term: str

    def to_source(self):
        return iv.Term(self.term)


def _sub_sources(clauses) -> tuple:
    out = []
    for c in clauses:
        if isinstance(c, SpanQuery):
            out.append(c.to_source())
        elif isinstance(c, str):
            out.append(iv.Term(c))
        else:
            raise TypeError(f"span clause must be SpanQuery or str, got {c!r}")
    return tuple(out)


@dataclass(frozen=True)
class SpanNearQuery(SpanQuery):
    """spans/SpanNearQuery.java:49 — clauses within ``slop`` total gap,
    ordered when ``in_order`` (NearSpansOrdered) else any order."""

    clauses: tuple
    slop: int = 0
    in_order: bool = True

    def to_source(self):
        subs = _sub_sources(self.clauses)
        inner = iv.Ordered(subs) if self.in_order else iv.Unordered(subs)
        return iv.MaxGaps(inner, self.slop)


@dataclass(frozen=True)
class SpanOrQuery(SpanQuery):
    """spans/SpanOrQuery.java — union of sub-spans."""

    clauses: tuple

    def to_source(self):
        return iv.Or(_sub_sources(self.clauses))


@dataclass(frozen=True)
class SpanContainingQuery(SpanQuery):
    """spans/SpanContainingQuery.java — big spans containing a little."""

    big: SpanQuery
    little: SpanQuery

    def to_source(self):
        return iv.Containing(self.big.to_source(), self.little.to_source())


@dataclass(frozen=True)
class SpanWithinQuery(SpanQuery):
    """spans/SpanWithinQuery.java — little spans inside a big span."""

    little: SpanQuery
    big: SpanQuery

    def to_source(self):
        return iv.ContainedBy(self.little.to_source(), self.big.to_source())


@dataclass(frozen=True)
class SpanFirstQuery(SpanQuery):
    """spans/SpanFirstQuery.java — spans ending before position ``end``
    (exclusive span end ≡ inclusive interval end < end)."""

    match: SpanQuery
    end: int

    def to_source(self):
        return iv.EndingBefore(self.match.to_source(), self.end)


@dataclass(frozen=True)
class SpanPositionRangeQuery(SpanQuery):
    """spans/SpanPositionRangeQuery.java:47-53 — spans fully inside the
    position window [start, end) (span end exclusive ≡ interval end <
    ``end``)."""

    match: SpanQuery
    start: int
    end: int

    def to_source(self):
        return iv.PositionRange(self.match.to_source(), self.start, self.end)


@dataclass(frozen=True)
class SpanNotQuery(SpanQuery):
    """spans/SpanNotQuery.java:47-71 — include spans with no exclude span
    overlapping them, the exclude side widened by ``pre`` tokens on the
    left and ``post`` on the right (pre=post=dist for the 3-arg form).

    Rewrite: NonOverlapping(include, Extended(exclude, pre, post)) — the
    same difference machinery as Intervals.notWithin; the exclude terms
    stay OPTIONAL in the doc approximation (docs without them match)."""

    include: SpanQuery
    exclude: SpanQuery
    pre: int = 0
    post: int = 0

    def to_source(self):
        sub = self.exclude.to_source()
        if self.pre or self.post:
            sub = iv.Extended(sub, self.pre, self.post)
        return iv.NonOverlapping(self.include.to_source(), sub)
