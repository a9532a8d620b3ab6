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


@dataclass(frozen=True)
class Unordered(IntervalsSource):
    sources: tuple

    def terms(self):
        return tuple(t for s in self.sources for t in s.terms())

    def min_extent(self):
        return sum(s.min_extent() for s in self.sources)


@dataclass(frozen=True)
class Or(IntervalsSource):
    """DisjunctionIntervalsSource — minimal intervals of the union."""

    sources: tuple

    def terms(self):
        return tuple(t for s in self.sources for t in s.terms())

    def min_extent(self):
        return min(s.min_extent() for s in self.sources)


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


@dataclass(frozen=True)
class MaxGaps(IntervalsSource):
    source: IntervalsSource
    gaps: int

    def terms(self):
        return self.source.terms()

    def min_extent(self):
        return self.source.min_extent()


@dataclass(frozen=True)
class EndingBefore(IntervalsSource):
    """Spans' SpanFirstQuery filter: intervals with end < ``end``."""

    source: IntervalsSource
    end: int

    def terms(self):
        return self.source.terms()

    def min_extent(self):
        return self.source.min_extent()


@dataclass(frozen=True)
class MaxWidth(IntervalsSource):
    source: IntervalsSource
    width: int

    def terms(self):
        return self.source.terms()

    def min_extent(self):
        return self.source.min_extent()


def ordered(*sources):
    return Ordered(tuple(_as_source(s) for s in sources))


def unordered(*sources):
    return Unordered(tuple(_as_source(s) for s in sources))


def or_(*sources):
    return Or(tuple(_as_source(s) for s in sources))


def containing(big, small):
    return Containing(_as_source(big), _as_source(small))


def contained_by(small, big):
    return ContainedBy(_as_source(small), _as_source(big))


def maxgaps(gaps: int, source):
    return MaxGaps(_as_source(source), gaps)


def maxwidth(width: int, source):
    return MaxWidth(_as_source(source), width)


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
