"""Interval queries: minimal-interval semantics over positions.

≙ the reference's intervals module (queries/.../intervals/):

* ``Term`` — one term's positions as unit intervals;
* ``Ordered`` — minimal intervals containing all sources IN ORDER
  (OrderedIntervalsSource.java:~60 nextInterval, transliterated below);
* ``Unordered`` — minimal windows containing all sources in any order
  (UnorderedIntervalsSource.java:112-199, PQ-minimization transliterated);
* ``MaxGaps`` / ``MaxWidth`` — FilteredIntervalsSource analogs accepting
  intervals by gaps()/width();
* scoring — IntervalScorer.java:66-74: freq += 1/max(length - minExtent
  + 1, 1) per emitted interval (float accumulation), score =
  saturation(weight=boost, pivot): weight * (1 - pivot/(pivot + freq))
  (IntervalScoreFunction.java:56-75), no length norm.

The per-document iterators run in an Arrow-batched UDF over gathered
position arrays (same single-shuffle gather as phrases); like the
reference, minimization is greedy — not every combinatorial interval is
enumerated, and that traversal IS the scoring contract.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

NO_MORE = 1 << 60
_INF = 1 << 62


# ---------------------------------------------------------------------------
# source tree (the public API — Intervals.* factory analog)


@dataclass(frozen=True)
class IntervalsSource:
    def terms(self) -> tuple:
        raise NotImplementedError

    def min_extent(self) -> int:
        raise NotImplementedError

    def required_terms(self) -> frozenset:
        """Terms the conjunctive doc-approximation may REQUIRE (the
        reference's IntervalsSource approximation): difference sources
        require only their minuend side, disjunctions require nothing.
        Default: every term (conjunction sources)."""
        return frozenset(self.terms())


@dataclass(frozen=True)
class Term(IntervalsSource):
    term: str

    def terms(self):
        return (self.term,)

    def min_extent(self):
        return 1


@dataclass(frozen=True)
class Ordered(IntervalsSource):
    sources: tuple

    def terms(self):
        return tuple(t for s in self.sources for t in s.terms())

    def min_extent(self):
        return sum(s.min_extent() for s in self.sources)

    def required_terms(self):
        return frozenset().union(*(s.required_terms() for s in self.sources))


@dataclass(frozen=True)
class Unordered(IntervalsSource):
    sources: tuple

    def terms(self):
        return tuple(t for s in self.sources for t in s.terms())

    def min_extent(self):
        return sum(s.min_extent() for s in self.sources)

    def required_terms(self):
        return frozenset().union(*(s.required_terms() for s in self.sources))


@dataclass(frozen=True)
class Or(IntervalsSource):
    """DisjunctionIntervalsSource — minimal intervals of the union."""

    sources: tuple

    def terms(self):
        return tuple(t for s in self.sources for t in s.terms())

    def min_extent(self):
        return min(s.min_extent() for s in self.sources)

    def required_terms(self):
        # disjunction approximation: a doc matches when ANY branch can —
        # nothing is individually required
        return frozenset()


@dataclass(frozen=True)
class AtLeast(IntervalsSource):
    """MinimumShouldMatchIntervalsSource — minimal intervals spanning at
    least ``min_should_match`` of the sub-sources ("a combination of
    unordered-AND and OR", MinimumShouldMatchIntervalsSource.java:146-156:
    an end-ordered background queue feeds a start-ordered proximity queue
    holding exactly n iterators)."""

    sources: tuple
    min_should_match: int

    def terms(self):
        return tuple(t for s in self.sources for t in s.terms())

    def min_extent(self):
        # MinimumShouldMatchIntervalsSource.minExtent:104-114 — the n
        # smallest sub-extents
        exts = sorted(s.min_extent() for s in self.sources)
        return sum(exts[: self.min_should_match])

    def required_terms(self):
        # nothing is individually required unless n == len(sources)
        # (that case rewrites to Unordered in the factory)
        return frozenset()


@dataclass(frozen=True)
class NoMatch(IntervalsSource):
    """NoMatchIntervalsSource — matches nothing (Intervals.atLeast with
    minShouldMatch > |sources|)."""

    reason: str = ""

    def terms(self):
        return ()

    def min_extent(self):
        return 0

    def required_terms(self):
        return frozenset()


@dataclass(frozen=True)
class Containing(IntervalsSource):
    """ContainingIntervalsSource — intervals of ``big`` containing an
    interval of ``small``."""

    big: IntervalsSource
    small: IntervalsSource

    def terms(self):
        return tuple(self.big.terms()) + tuple(self.small.terms())

    def min_extent(self):
        return self.big.min_extent()

    def required_terms(self):
        return self.big.required_terms() | self.small.required_terms()


@dataclass(frozen=True)
class ContainedBy(IntervalsSource):
    """ContainedByIntervalsSource — intervals of ``small`` contained in an
    interval of ``big``."""

    small: IntervalsSource
    big: IntervalsSource

    def terms(self):
        return tuple(self.small.terms()) + tuple(self.big.terms())

    def min_extent(self):
        return self.small.min_extent()

    def required_terms(self):
        return self.small.required_terms() | self.big.required_terms()


@dataclass(frozen=True)
class MaxGaps(IntervalsSource):
    source: IntervalsSource
    gaps: int

    def terms(self):
        return self.source.terms()

    def min_extent(self):
        return self.source.min_extent()

    def required_terms(self):
        return self.source.required_terms()


@dataclass(frozen=True)
class EndingBefore(IntervalsSource):
    """Spans' SpanFirstQuery filter: intervals with end < ``end``."""

    source: IntervalsSource
    end: int

    def terms(self):
        return self.source.terms()

    def min_extent(self):
        return self.source.min_extent()

    def required_terms(self):
        return self.source.required_terms()


@dataclass(frozen=True)
class PositionRange(IntervalsSource):
    """Spans' SpanPositionRangeQuery filter (queries/.../spans/
    SpanPositionRangeQuery.java:47-53): intervals with start >= ``start``
    and (exclusive span) end <= ``end`` ≡ inclusive interval end < end."""

    source: IntervalsSource
    start: int
    end: int

    def terms(self):
        return self.source.terms()

    def min_extent(self):
        return self.source.min_extent()

    def required_terms(self):
        return self.source.required_terms()


@dataclass(frozen=True)
class MaxWidth(IntervalsSource):
    source: IntervalsSource
    width: int

    def terms(self):
        return self.source.terms()

    def min_extent(self):
        return self.source.min_extent()

    def required_terms(self):
        return self.source.required_terms()


@dataclass(frozen=True)
class Extended(IntervalsSource):
    """ExtendedIntervalsSource — widen each interval by ``before``
    positions on the left (floored at 0) and ``after`` on the right
    (queries/.../intervals/ExtendedIntervalsSource.java,
    ExtendedIntervalIterator.java:50-77)."""

    source: IntervalsSource
    before: int
    after: int

    def terms(self):
        return self.source.terms()

    def min_extent(self):
        me = self.before + self.source.min_extent() + self.after
        # Java-int faithful: 32-bit overflow (negative) clamps to MAX_VALUE
        # (ExtendedIntervalsSource.java:126-132)
        return me if 0 <= me < (1 << 31) else (1 << 31) - 1

    def required_terms(self):
        return self.source.required_terms()


@dataclass(frozen=True)
class Offset(IntervalsSource):
    """OffsetIntervalsSource — the single position immediately before
    (``before=True``: max(0, start-1)) or after (end+1) each interval of
    the wrapped source (queries/.../intervals/OffsetIntervalsSource.java:
    39-67).  Used by ``before_``/``after_`` rewrites."""

    source: IntervalsSource
    before: bool

    def terms(self):
        return self.source.terms()

    def min_extent(self):
        return 1

    def required_terms(self):
        return self.source.required_terms()


@dataclass(frozen=True)
class NotContaining(IntervalsSource):
    """NotContainingIntervalsSource — intervals of ``minuend`` that do NOT
    contain an interval of ``subtrahend``.  Difference source: only the
    minuend side is required by the doc approximation
    (DifferenceIntervalsSource.java)."""

    minuend: IntervalsSource
    subtrahend: IntervalsSource

    def terms(self):
        return tuple(self.minuend.terms()) + tuple(self.subtrahend.terms())

    def min_extent(self):
        return self.minuend.min_extent()

    def required_terms(self):
        return self.minuend.required_terms()


@dataclass(frozen=True)
class NotContainedBy(IntervalsSource):
    """NotContainedByIntervalsSource — intervals of ``minuend`` (small)
    that are NOT contained by an interval of ``subtrahend`` (big)."""

    minuend: IntervalsSource
    subtrahend: IntervalsSource

    def terms(self):
        return tuple(self.minuend.terms()) + tuple(self.subtrahend.terms())

    def min_extent(self):
        return self.minuend.min_extent()

    def required_terms(self):
        return self.minuend.required_terms()


@dataclass(frozen=True)
class NonOverlapping(IntervalsSource):
    """NonOverlappingIntervalsSource — intervals of ``minuend`` that do
    not overlap an interval of ``subtrahend``.  ``not_within`` rewrites
    to this over an Extended subtrahend (Intervals.java:403-407)."""

    minuend: IntervalsSource
    subtrahend: IntervalsSource

    def terms(self):
        return tuple(self.minuend.terms()) + tuple(self.subtrahend.terms())

    def min_extent(self):
        return self.minuend.min_extent()

    def required_terms(self):
        return self.minuend.required_terms()


@dataclass(frozen=True)
class Overlapping(IntervalsSource):
    """OverlappingIntervalsSource — intervals of ``source`` that overlap
    an interval of ``reference`` (conjunction: both sides required)."""

    source: IntervalsSource
    reference: IntervalsSource

    def terms(self):
        return tuple(self.source.terms()) + tuple(self.reference.terms())

    def min_extent(self):
        return self.source.min_extent()

    def required_terms(self):
        return (
            self.source.required_terms() | self.reference.required_terms()
        )


def ordered(*sources):
    return Ordered(tuple(_as_source(s) for s in sources))


def unordered(*sources):
    return Unordered(tuple(_as_source(s) for s in sources))


def or_(*sources):
    return Or(tuple(_as_source(s) for s in sources))


def atleast(min_should_match: int, *sources):
    """Intervals.atLeast (Intervals.java:476-488): n == |sources| rewrites
    to unordered, n > |sources| can never match."""
    srcs = tuple(_as_source(s) for s in sources)
    n = int(min_should_match)
    if n == len(srcs):
        return Unordered(srcs)
    if n > len(srcs):
        return NoMatch(f"Too few sources to match minimum of [{n}]")
    return AtLeast(srcs, n)


def phrase(*sources):
    """Intervals.phrase (Intervals.java:93-112, BlockIntervalsSource):
    adjacent sub-intervals in order — expressed on the existing machinery
    as maxgaps(0, ordered(...)), which yields the same minimal intervals
    (a block is exactly an ordered match with zero internal gaps)."""
    srcs = tuple(_as_source(s) for s in sources)
    if len(srcs) == 1:
        return srcs[0]
    return MaxGaps(Ordered(srcs), 0)


def unordered_no_overlaps(a, b):
    """Intervals.unorderedNoOverlaps (Intervals.java:355-357): both
    sources appear and do not overlap — rewrites verbatim to
    or(ordered(a, b), ordered(b, a))."""
    sa, sb = _as_source(a), _as_source(b)
    return Or((Ordered((sa, sb)), Ordered((sb, sa))))


def containing(big, small):
    return Containing(_as_source(big), _as_source(small))


def contained_by(small, big):
    return ContainedBy(_as_source(small), _as_source(big))


def maxgaps(gaps: int, source):
    return MaxGaps(_as_source(source), gaps)


def maxwidth(width: int, source):
    return MaxWidth(_as_source(source), width)


_JAVA_MAX_INT = (1 << 31) - 1


def extend(source, before: int, after: int):
    """Intervals.extend (Intervals.java:321-323)."""
    return Extended(_as_source(source), int(before), int(after))


def not_containing(minuend, subtrahend):
    """Intervals.notContaining (Intervals.java:431-433)."""
    return NotContaining(_as_source(minuend), _as_source(subtrahend))


def not_contained_by(small, big):
    """Intervals.notContainedBy (Intervals.java:457-459)."""
    return NotContainedBy(_as_source(small), _as_source(big))


def non_overlapping(minuend, subtrahend):
    """Intervals.nonOverlapping (Intervals.java:377-380)."""
    return NonOverlapping(_as_source(minuend), _as_source(subtrahend))


def overlapping(source, reference):
    """Intervals.overlapping (Intervals.java:388-390)."""
    return Overlapping(_as_source(source), _as_source(reference))


def not_within(minuend, positions: int, subtrahend):
    """Intervals.notWithin (Intervals.java:403-407): minuend intervals at
    least ``positions`` away from any subtrahend interval — rewrites to
    nonOverlapping over an extended subtrahend."""
    return NonOverlapping(
        _as_source(minuend),
        Extended(_as_source(subtrahend), int(positions), int(positions)),
    )


def within(source, positions: int, reference):
    """Intervals.within (Intervals.java:418-421): source intervals within
    ``positions`` of a reference interval — containedBy over an extended
    reference."""
    return ContainedBy(
        _as_source(source),
        Extended(_as_source(reference), int(positions), int(positions)),
    )


def before_(source, reference):
    """Intervals.before (Intervals.java:491-494): source intervals ending
    before the start of a reference interval — containedBy over the
    reference's before-offset point extended unboundedly left."""
    return ContainedBy(
        _as_source(source),
        Extended(Offset(_as_source(reference), True), _JAVA_MAX_INT, 0),
    )


def after_(source, reference):
    """Intervals.after (Intervals.java:497-501): source intervals starting
    after the end of a reference interval."""
    return ContainedBy(
        _as_source(source),
        Extended(Offset(_as_source(reference), False), 0, _JAVA_MAX_INT),
    )


def _as_source(s):
    return Term(s) if isinstance(s, str) else s


# ---------------------------------------------------------------------------
# per-document iterators (transliterations)


class _TermIter:
    __slots__ = ("ps", "i", "start", "end")

    def __init__(self, positions):
        self.ps = positions
        self.i = -1
        self.start = self.end = -1

    def next_interval(self) -> int:
        self.i += 1
        if self.i < len(self.ps):
            self.start = self.end = self.ps[self.i]
            return self.start
        self.start = self.end = NO_MORE
        return NO_MORE

    def width(self) -> int:
        return self.end - self.start + 1

    def gaps(self) -> int:
        return 0


class _OrderedIter:
    """OrderedIntervalsSource.OrderedIntervalIterator.nextInterval."""

    __slots__ = ("subs", "i", "start", "end", "slop")

    def __init__(self, subs):
        self.subs = subs
        # reset()
        subs[0].next_interval()
        self.i = 1
        self.start = self.end = self.slop = -1

    def next_interval(self) -> int:
        subs = self.subs
        self.start = self.end = self.slop = NO_MORE
        last_start = _INF
        minimizing = False
        while True:
            while True:
                if subs[self.i - 1].end >= last_start:
                    return self.start
                if self.i == len(subs) or (
                    minimizing and subs[self.i].start > subs[self.i - 1].end
                ):
                    break
                while True:
                    if (
                        subs[self.i].end >= last_start
                        or subs[self.i].next_interval() == NO_MORE
                    ):
                        return self.start
                    if not (subs[self.i].start <= subs[self.i - 1].end):
                        break
                self.i += 1
            self.start = subs[0].start
            if self.start == NO_MORE:
                self.end = NO_MORE
                return self.end
            self.end = subs[-1].end
            self.slop = self.end - self.start + 1
            for it in subs:
                self.slop -= it.width()
            last_start = subs[-1].start
            self.i = 1
            if subs[0].next_interval() == NO_MORE:
                return self.start
            minimizing = True

    def width(self) -> int:
        return self.end - self.start + 1

    def gaps(self) -> int:
        return self.slop


class _UnorderedIter:
    """UnorderedIntervalsSource.UnorderedIntervalIterator (PQ ordered by
    start asc, then END DESC on ties — :124-128 lessThan)."""

    __slots__ = ("subs", "queue", "start", "end", "slop", "queue_end", "_n")

    def __init__(self, subs):
        import heapq

        self.subs = subs
        self.queue: list = []
        self.start = self.end = self.queue_end = -1
        self.slop = 0
        self._n = 0
        for it in subs:
            if it.next_interval() == NO_MORE:
                break
            self._add(it)
            self._update_right(it)

    def _add(self, it):
        import heapq

        self._n += 1
        heapq.heappush(self.queue, (it.start, -it.end, self._n, it))

    def _pop(self):
        import heapq

        return heapq.heappop(self.queue)[3]

    def _top(self):
        return self.queue[0][3]

    def _update_right(self, it):
        if it.end > self.queue_end:
            self.queue_end = it.end

    def next_interval(self) -> int:
        subs = self.subs
        while len(self.queue) == len(subs) and self._top().start == self.start:
            it = self._pop()
            if it is not None and it.next_interval() != NO_MORE:
                self._add(it)
                self._update_right(it)
        if len(self.queue) < len(subs):
            self.start = self.end = NO_MORE
            return NO_MORE
        while True:
            self.start = self._top().start
            self.end = self.queue_end
            self.slop = self.width()
            for it in subs:
                self.slop -= it.width()
            if self._top().end == self.end:
                return self.start
            it = self._pop()
            if it is not None and it.next_interval() != NO_MORE:
                self._add(it)
                self._update_right(it)
            if not (len(self.queue) == len(subs) and self.end == self.queue_end):
                return self.start

    def width(self) -> int:
        return self.end - self.start + 1

    def gaps(self) -> int:
        return self.slop


class _AtLeastIter:
    """MinimumShouldMatchIntervalsSource.MinimumShouldMatchIntervalIterator
    (.java:156-295), per-document form: ``reset()`` inlines into
    ``__init__``.  Two queues — an end-ordered *background* queue holding
    every sub-iterator with a live interval, and a start-ordered
    *proximity* queue holding exactly minShouldMatch of them; iteration
    proceeds like the unordered iterator over the proximity queue, except
    a popped iterator goes back to the background queue and is replaced
    by the background top (.java:146-156 comment)."""

    __slots__ = ("msm", "prox", "bg", "start", "end", "queue_end", "slop", "_n")

    def __init__(self, subs, msm: int):
        self.msm = msm
        self.prox: list = []  # lessThan: start asc, end DESC on ties
        self.bg: list = []  # lessThan: end asc, start DESC on ties
        self.start = self.end = -1
        self.queue_end = -1
        self.slop = 0
        self._n = 0
        for it in subs:
            if it.next_interval() != NO_MORE:
                self._bg_add(it)
        for _ in range(msm):
            it = self._bg_pop()
            if it is None:
                break
            self._prox_add(it)
            self._update_right(it)

    def _prox_add(self, it):
        import heapq

        self._n += 1
        heapq.heappush(self.prox, (it.start, -it.end, self._n, it))

    def _prox_pop(self):
        import heapq

        return heapq.heappop(self.prox)[3] if self.prox else None

    def _prox_top(self):
        return self.prox[0][3]

    def _bg_add(self, it):
        import heapq

        self._n += 1
        heapq.heappush(self.bg, (it.end, -it.start, self._n, it))

    def _bg_pop(self):
        import heapq

        return heapq.heappop(self.bg)[3] if self.bg else None

    def _update_right(self, it):
        if it.end > self.queue_end:
            self.queue_end = it.end

    def next_interval(self) -> int:
        # first, find a matching interval beyond the current start
        while len(self.prox) == self.msm and self._prox_top().start == self.start:
            it = self._prox_pop()
            if it is not None and it.next_interval() != NO_MORE:
                self._bg_add(it)
                nxt = self._bg_pop()  # just been added — never None
                self._prox_add(nxt)
                self._update_right(nxt)
        if len(self.prox) < self.msm:
            self.start = self.end = NO_MORE
            return NO_MORE
        # then, minimize it
        while True:
            self.start = self._prox_top().start
            self.end = self.queue_end
            self.slop = self.width()
            for entry in self.prox:
                self.slop -= entry[3].width()
            if self._prox_top().end == self.end:
                return self.start
            lead = self._prox_pop()
            if lead is not None:
                if lead.next_interval() != NO_MORE:
                    self._bg_add(lead)
                nxt = self._bg_pop()
                if nxt is not None:
                    self._prox_add(nxt)
                    self._update_right(nxt)
            if not (len(self.prox) == self.msm and self.end == self.queue_end):
                return self.start

    def width(self) -> int:
        return self.end - self.start + 1

    def gaps(self) -> int:
        return self.slop


class _OrIter:
    """DisjunctionIntervalsSource.DisjunctionIntervalIterator:202-245 —
    PQ ordered by (end asc, start desc); emitting an interval pops every
    queued interval CONTAINING the current one (minimal-interval union)."""

    __slots__ = ("queue", "current", "start", "end", "_n", "_exhausted")

    def __init__(self, subs):
        self.queue: list = []
        self._n = 0
        self.current = None  # EMPTY
        self._exhausted = False
        self.start = self.end = -1
        for it in subs:
            if it.next_interval() != NO_MORE:
                self._add(it)

    def _add(self, it):
        import heapq

        self._n += 1
        heapq.heappush(self.queue, (it.end, -it.start, self._n, it))

    def _sync(self):
        self.current = self.queue[0][3]
        self.start, self.end = self.current.start, self.current.end

    def next_interval(self) -> int:
        import heapq

        if self._exhausted:
            return NO_MORE
        if self.current is None:
            if not self.queue:
                self._exhausted = True
                self.start = self.end = NO_MORE
                return NO_MORE
            self._sync()
            return self.start
        start, end = self.current.start, self.current.end
        while self.queue and self._contains(self.queue[0][3], start, end):
            it = heapq.heappop(self.queue)[3]
            if it.next_interval() != NO_MORE:
                self._add(it)
        if not self.queue:
            self._exhausted = True
            self.start = self.end = NO_MORE
            return NO_MORE
        self._sync()
        return self.start

    @staticmethod
    def _contains(it, start, end):
        return it.start <= start <= it.end and it.start <= end <= it.end

    def width(self) -> int:
        return self.end - self.start + 1

    def gaps(self) -> int:
        return self.current.gaps()


class _ContainingIter:
    """ContainingIntervalsSource.combine:41-66 — emit ``a`` (big)
    intervals that contain the current ``b`` (small) interval."""

    __slots__ = ("a", "b", "bpos", "start", "end")

    def __init__(self, a, b):
        self.a, self.b = a, b
        self.bpos = b.next_interval() != NO_MORE  # FilteringIntervalIterator.reset
        self.start = self.end = -1

    def next_interval(self) -> int:
        if not self.bpos:
            self.start = self.end = NO_MORE
            return NO_MORE
        a, b = self.a, self.b
        while a.next_interval() != NO_MORE:
            while b.start < a.start and b.end < a.end:
                if b.next_interval() == NO_MORE:
                    self.bpos = False
                    self.start = self.end = NO_MORE
                    return NO_MORE
            if a.start <= b.start and a.end >= b.end:
                self.start, self.end = a.start, a.end
                return self.start
        self.start = self.end = NO_MORE
        return NO_MORE

    def width(self) -> int:
        return self.end - self.start + 1

    def gaps(self) -> int:
        return self.a.gaps()


class _ContainedByIter:
    """ContainedByIntervalsSource.combine:42-68 — emit ``a`` (small)
    intervals lying inside the current ``b`` (big) interval."""

    __slots__ = ("a", "b", "bpos", "start", "end")

    def __init__(self, a, b):
        self.a, self.b = a, b
        self.bpos = b.next_interval() != NO_MORE
        self.start = self.end = -1

    def next_interval(self) -> int:
        if not self.bpos:
            self.start = self.end = NO_MORE
            return NO_MORE
        a, b = self.a, self.b
        while a.next_interval() != NO_MORE:
            while b.end < a.end:
                if b.next_interval() == NO_MORE:
                    self.bpos = False
                    self.start = self.end = NO_MORE
                    return NO_MORE
            if b.start <= a.start:
                self.start, self.end = a.start, a.end
                return self.start
        self.bpos = False
        self.start = self.end = NO_MORE
        return NO_MORE

    def width(self) -> int:
        return self.end - self.start + 1

    def gaps(self) -> int:
        return self.a.gaps()


class _ExtendedIter:
    """ExtendedIntervalIterator.java:50-88 — widen the wrapped
    iterator's bounds by (before, after); unpositioned reads are -1."""

    __slots__ = ("sub", "before", "after", "positioned")

    def __init__(self, sub, before, after):
        self.sub = sub
        self.before = before
        self.after = after
        self.positioned = False

    @property
    def start(self):
        if not self.positioned:
            return -1
        s = self.sub.start
        return NO_MORE if s == NO_MORE else max(0, s - self.before)

    @property
    def end(self):
        if not self.positioned:
            return -1
        e = self.sub.end
        if e == NO_MORE:
            return NO_MORE
        e += self.after
        # Java-int faithful: end += after overflowing (or landing on the
        # NO_MORE sentinel, Integer.MAX_VALUE) clamps to MAX_VALUE - 1
        # (ExtendedIntervalIterator.java:66-76)
        return e if e < (1 << 31) - 1 else (1 << 31) - 2

    def next_interval(self):
        self.positioned = True
        self.sub.next_interval()
        return self.start

    def width(self):
        return self.end - self.start + 1

    def gaps(self):
        return self.sub.gaps()


class _OffsetIter:
    """OffsetIntervalsSource.OffsetIntervalIterator (.java:39-102) — the
    single position before (max(0, start-1)) or after (end+1) the wrapped
    interval; gaps() = 0."""

    __slots__ = ("sub", "before_mode")

    def __init__(self, sub, before_mode):
        self.sub = sub
        self.before_mode = before_mode

    @property
    def start(self):
        if self.before_mode:
            p = self.sub.start
            return p if p in (-1, NO_MORE) else max(0, p - 1)
        p = self.sub.end
        return p if p in (-1, NO_MORE) else p + 1

    @property
    def end(self):
        return self.start

    def next_interval(self):
        self.sub.next_interval()
        return self.start

    def width(self):
        return 1

    def gaps(self):
        return 0


class _RelativeIter:
    """RelativeIterator.java:21-78 base: iterate ``a`` (minuend), with
    ``b`` (subtrahend) possibly absent for this doc (bpos=False —
    reset() finds no b positions on the doc); start/end/gaps proxy a."""

    __slots__ = ("a", "b", "bpos")

    def __init__(self, a, b):
        self.a = a
        self.b = b
        self.bpos = b is not None

    @property
    def start(self):
        return self.a.start

    @property
    def end(self):
        return self.a.end

    def width(self):
        return self.a.width()

    def gaps(self):
        return self.a.gaps()


class _NotContainingIter(_RelativeIter):
    """NotContainingIntervalsSource.NotContainingIterator.nextInterval
    (.java:64-88) — exact traversal transliteration."""

    def next_interval(self):
        if not self.bpos:
            return self.a.next_interval()
        a, b = self.a, self.b
        while a.next_interval() != NO_MORE:
            while b.start < a.start and b.end < a.end:
                if b.next_interval() == NO_MORE:
                    self.bpos = False
                    return a.start
            if b.start > a.end:
                return a.start
        return NO_MORE


class _NotContainedByIter(_RelativeIter):
    """NotContainedByIntervalsSource.NotContainedByIterator.nextInterval
    (.java:64-87)."""

    def next_interval(self):
        if not self.bpos:
            return self.a.next_interval()
        a, b = self.a, self.b
        while a.next_interval() != NO_MORE:
            while b.end < a.end:
                if b.next_interval() == NO_MORE:
                    return a.start
            if a.start < b.start:
                return a.start
        return NO_MORE


class _NonOverlappingIter(_RelativeIter):
    """NonOverlappingIntervalsSource nextInterval (.java:65-81)."""

    def next_interval(self):
        if not self.bpos:
            return self.a.next_interval()
        a, b = self.a, self.b
        while a.next_interval() != NO_MORE:
            while b.end < a.start:
                if b.next_interval() == NO_MORE:
                    self.bpos = False
                    return a.start
            if b.start > a.end:
                return a.start
        return NO_MORE


class _OverlappingIter(_RelativeIter):
    """OverlappingIntervalsSource nextInterval (.java:44-61) — conjunction:
    absent reference means no match (handled in build_iter)."""

    def next_interval(self):
        if not self.bpos:
            return NO_MORE
        a, b = self.a, self.b
        while a.next_interval() != NO_MORE:
            while b.end < a.start:
                if b.next_interval() == NO_MORE:
                    self.bpos = False
                    return NO_MORE
            if b.start <= a.end:
                return a.start
        self.bpos = False
        return NO_MORE


class _FilteredIter:
    """FilteredIntervalsSource: emit sub intervals passing ``accept``."""

    __slots__ = ("sub", "accept", "start", "end")

    def __init__(self, sub, accept):
        self.sub = sub
        self.accept = accept
        self.start = self.end = -1

    def next_interval(self) -> int:
        while self.sub.next_interval() != NO_MORE:
            if self.accept(self.sub):
                self.start, self.end = self.sub.start, self.sub.end
                return self.start
        self.start = self.end = NO_MORE
        return NO_MORE

    def width(self) -> int:
        return self.end - self.start + 1

    def gaps(self) -> int:
        return self.sub.gaps()


def build_iter(source: IntervalsSource, pos_map: dict):
    """Iterator over one doc's intervals, or None when a required term is
    absent (the conjunction approximation can't match)."""
    if isinstance(source, Term):
        ps = pos_map.get(source.term)
        if not ps:
            return None
        return _TermIter(ps)
    if isinstance(source, (Ordered, Unordered)):
        subs = [build_iter(s, pos_map) for s in source.sources]
        if any(s is None for s in subs):
            return None
        return _OrderedIter(subs) if isinstance(source, Ordered) else _UnorderedIter(subs)
    if isinstance(source, Or):
        subs = [build_iter(s, pos_map) for s in source.sources]
        subs = [s for s in subs if s is not None]
        if not subs:
            return None
        return _OrIter(subs)
    if isinstance(source, AtLeast):
        # MinimumShouldMatchIntervalsSource.intervals:51-63 — null subs
        # (absent terms) are skipped; fewer than minShouldMatch live subs
        # can never match
        subs = [build_iter(s, pos_map) for s in source.sources]
        subs = [s for s in subs if s is not None]
        if len(subs) < source.min_should_match:
            return None
        return _AtLeastIter(subs, source.min_should_match)
    if isinstance(source, NoMatch):
        return None
    if isinstance(source, Containing):
        a = build_iter(source.big, pos_map)
        b = build_iter(source.small, pos_map)
        if a is None or b is None:
            return None
        return _ContainingIter(a, b)
    if isinstance(source, ContainedBy):
        a = build_iter(source.small, pos_map)
        b = build_iter(source.big, pos_map)
        if a is None or b is None:
            return None
        return _ContainedByIter(a, b)
    if isinstance(source, Extended):
        sub = build_iter(source.source, pos_map)
        return (
            None
            if sub is None
            else _ExtendedIter(sub, source.before, source.after)
        )
    if isinstance(source, Offset):
        sub = build_iter(source.source, pos_map)
        return None if sub is None else _OffsetIter(sub, source.before)
    if isinstance(source, (NotContaining, NotContainedBy, NonOverlapping)):
        a = build_iter(source.minuend, pos_map)
        if a is None:
            return None
        b = build_iter(source.subtrahend, pos_map)  # None => bpos False
        cls = {
            NotContaining: _NotContainingIter,
            NotContainedBy: _NotContainedByIter,
            NonOverlapping: _NonOverlappingIter,
        }[type(source)]
        return cls(a, b)
    if isinstance(source, Overlapping):
        a = build_iter(source.source, pos_map)
        b = build_iter(source.reference, pos_map)
        if a is None or b is None:
            return None
        return _OverlappingIter(a, b)
    if isinstance(source, MaxGaps):
        sub = build_iter(source.source, pos_map)
        g = source.gaps
        return None if sub is None else _FilteredIter(sub, lambda it: it.gaps() <= g)
    if isinstance(source, MaxWidth):
        sub = build_iter(source.source, pos_map)
        w = source.width
        return None if sub is None else _FilteredIter(sub, lambda it: it.width() <= w)
    if isinstance(source, EndingBefore):
        sub = build_iter(source.source, pos_map)
        e = source.end
        return None if sub is None else _FilteredIter(sub, lambda it: it.end < e)
    if isinstance(source, PositionRange):
        sub = build_iter(source.source, pos_map)
        s, e = source.start, source.end
        return (
            None
            if sub is None
            else _FilteredIter(sub, lambda it: it.start >= s and it.end < e)
        )
    raise TypeError(f"unknown source {source!r}")


def interval_freq(source: IntervalsSource, pos_map: dict, f32: bool = True) -> float:
    """One document's interval freq (IntervalScorer.ensureFreq):
    Σ 1/max(length - minExtent + 1, 1) over the traversal's intervals;
    0.0 = no match."""
    it = build_iter(source, pos_map)
    if it is None:
        return 0.0
    if it.next_interval() == NO_MORE:
        return 0.0
    me = source.min_extent()
    freq = np.float32(0.0) if f32 else 0.0
    while True:
        length = it.end - it.start + 1
        contrib = 1.0 / max(length - me + 1, 1)
        freq = np.float32(freq + contrib) if f32 else freq + contrib
        if it.next_interval() == NO_MORE:
            break
    return float(freq)
