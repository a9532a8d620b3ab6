"""Faithful SloppyPhraseMatcher simulation (reference semantics).

Transliterates the reference's greedy priority-queue matcher
(core/src/java/org/apache/lucene/search/SloppyPhraseMatcher.java:172-204
nextMatch, :269-277 advancePP, :284-321 advanceRpts, :362-464 init*;
PhraseQueue.java:27-39 ordering; PhrasePositions.java:42-58) plus the
PhraseScorer freq accumulation (PhraseScorer.java:76-84: float32
``freq += 1/(1+matchLength)`` per match).

Semantics notes (mirroring the reference's own Javadoc):

* each match contributes ``1/(1+matchLength)``; matchLength is the phrase-
  position window width of a greedily-minimized match.  Not every valid
  combination is counted — the traversal always advances the least
  phrase position, so e.g. doc "a b c b a" scores differently for
  "a b c"~4 and "c b a"~4.  This asymmetry is part of the contract.
* repetitions (same term at several query offsets, e.g. "ho my my"~2) are
  handled by repeat-groups: at init the j-th member of a group is advanced
  j times; collisions after an advance move the lesser of the colliding
  pair.
* multi-term repeats (MultiPhraseQuery slots with shared alternatives,
  e.g. "(a b) (a)"~6): pass ``terms_per_pp`` — repeat groups become the
  connected components of slots sharing a repeating term
  (SloppyPhraseMatcher.java initFirstTime/gatherRptGroups MTP branch:
  term bit-sets unioned until disjoint), and group init uses the
  collision-driven advance (advanceRepeatGroups hasMultiTermRpts branch)
  instead of the fixed j-step schedule.  Note the reference's OWN ignored
  test (TestMultiPhraseQuery.testMultiSloppyWithRepeats, LUCENE-3821)
  documents that this traversal misses some wished-for matches; we
  reproduce the shipped behavior, not the wish.

This module is pure Python over small per-document position lists.  The
engine uses it inside an Arrow-batched UDF for the generic n-term case;
for the common 2-distinct-term case the engine lowers to an equivalent
closed form in JVM column expressions (see
IndexSearcher._scored_sloppy_phrase), whose equivalence to this
simulation is covered by randomized parity tests.
"""

from __future__ import annotations

import heapq

import numpy as np


class _PP:
    """PhrasePositions.java — an iterator over one term's phrase positions
    (token position - query offset)."""

    __slots__ = ("positions", "offset", "ord", "i", "count", "position",
                 "rpt_group", "rpt_ind", "terms")

    def __init__(self, positions, offset: int, ord_: int, terms=()):
        self.positions = positions
        self.offset = offset
        self.ord = ord_
        self.i = 0
        self.count = 0
        self.position = 0
        self.rpt_group = -1
        self.rpt_ind = -1
        self.terms = tuple(terms)  # slot alternatives (repeat detection)

    def first_position(self) -> bool:
        self.count = len(self.positions)
        self.i = 0
        return self.next_position()

    def next_position(self) -> bool:
        if self.count > 0:
            self.count -= 1
            self.position = self.positions[self.i] - self.offset
            self.i += 1
            return True
        return False

    def key(self):
        # PhraseQueue.lessThan: (position, offset, ord)
        return (self.position, self.offset, self.ord)


class SloppyMatcher:
    """One-document matcher; ``matches()`` then iterate ``next_match()``."""

    def __init__(self, position_lists, offsets, slop: int, terms_per_pp=None):
        self.slop = slop
        if terms_per_pp is None:
            terms_per_pp = [()] * len(position_lists)
        self.pps = [
            _PP(pl, off, i, ts)
            for i, (pl, off, ts) in enumerate(
                zip(position_lists, offsets, terms_per_pp)
            )
        ]
        self.has_multi_term_rpts = False
        if any(pp.terms for pp in self.pps):
            self._gather_rpt_groups_by_terms()
        else:
            # no term identities supplied (plain PhraseQuery path): repeat
            # groups = same positions-list identity (same term) at several
            # offsets, sorted by offset (sortRptGroups).  Equivalent to the
            # reference's first-doc tpPos collision grouping for the
            # single-term-repeats case: two distinct terms can never share
            # an identical position set (one token position holds one term),
            # so content equality == term equality here
            by_term: dict[tuple, list[_PP]] = {}
            for pp in self.pps:
                by_term.setdefault(tuple(pp.positions), []).append(pp)
            self._finish_groups(
                [g for g in by_term.values() if len(g) >= 2]
            )
        self.pq: list[tuple] = []
        self.end = -(1 << 60)
        self.positioned = False
        self.match_length = 1 << 60

    def _gather_rpt_groups_by_terms(self):
        """repeatingTerms + gatherRptGroups (SloppyPhraseMatcher.java:
        586-600 repeatingTerms, :523-580 gatherRptGroups).  A repeating
        term appears in >= 2 slots; with multi-term slots the groups are
        the connected components of the slots' repeating-term sets
        (ppTermsBitSets + unionTermGroups: union intersecting bit-sets
        until disjoint)."""
        cnt: dict = {}
        for pp in self.pps:
            for t in pp.terms:
                cnt[t] = cnt.get(t, 0) + 1
        rpt = {t for t, c in cnt.items() if c >= 2}
        if not rpt:
            self._finish_groups([])
            return
        rpp = [pp for pp in self.pps if any(t in rpt for t in pp.terms)]
        self.has_multi_term_rpts = any(len(pp.terms) > 1 for pp in rpp)
        # union intersecting repeating-term sets until disjoint
        comp: list[set] = []
        for pp in rpp:
            s = {t for t in pp.terms if t in rpt}
            merged = s
            keep = []
            for c in comp:
                if c & merged:
                    merged = merged | c
                else:
                    keep.append(c)
            keep.append(merged)
            comp = keep
        groups: list[list[_PP]] = [[] for _ in comp]
        for pp in rpp:
            for gi, c in enumerate(comp):
                if any(t in c for t in pp.terms):
                    groups[gi].append(pp)
                    break
        self._finish_groups([g for g in groups if len(g) >= 2])

    def _finish_groups(self, groups):
        self.rpt_groups = []
        for group in groups:
            group.sort(key=lambda p: p.offset)
            g = len(self.rpt_groups)
            for j, pp in enumerate(group):
                pp.rpt_group = g
                pp.rpt_ind = j
            self.rpt_groups.append(group)
        self.has_rpts = bool(self.rpt_groups)

    # -- queue helpers --------------------------------------------------
    def _pq_add(self, pp: _PP):
        heapq.heappush(self.pq, (pp.key(), pp))

    def _pq_pop(self) -> _PP:
        return heapq.heappop(self.pq)[1]

    def _pq_top(self) -> _PP:
        return self.pq[0][1]

    # -- init (initPhrasePositions / initSimple / initComplex) ----------
    def reset(self) -> bool:
        self.end = -(1 << 60)
        self.pq = []
        for pp in self.pps:
            if not pp.first_position():
                return False
        if self.has_rpts and not self._advance_repeat_groups():
            self.positioned = False
            return False
        for pp in self.pps:
            if pp.position > self.end:
                self.end = pp.position
            self._pq_add(pp)
        self.positioned = True
        self.match_length = 1 << 60
        return True

    def _advance_repeat_groups(self) -> bool:
        # advanceRepeatGroups (SloppyPhraseMatcher.java:427-460)
        for rg in self.rpt_groups:
            if self.has_multi_term_rpts:
                # multi-term case: some members may not collide — advance
                # the lesser of each colliding pair until collision-free;
                # restart at the same index if an earlier member moved
                i = 0
                while i < len(rg):
                    incr = 1
                    pp = rg[i]
                    while True:
                        k = self._collide(pp)
                        if k < 0:
                            break
                        pp2 = self._lesser(pp, rg[k])
                        if not self._advance_pp(pp2):
                            return False
                        if pp2.rpt_ind < i:  # "should not happen?" (ref)
                            incr = 0
                            break
                    i += incr
            else:
                # single-term case: the j-th pp of each group advances j
                # times so the start state has no collisions
                for j in range(1, len(rg)):
                    for _ in range(j):
                        if not rg[j].next_position():
                            return False
        return True

    @staticmethod
    def _lesser(pp: _PP, pp2: _PP) -> _PP:
        # SloppyPhraseMatcher.lesser: by (position, offset) only
        return pp if (pp.position, pp.offset) < (pp2.position, pp2.offset) else pp2

    # -- advance --------------------------------------------------------
    def _advance_pp(self, pp: _PP) -> bool:
        if not pp.next_position():
            return False
        if pp.position > self.end:
            self.end = pp.position
        return True

    def _collide(self, pp: _PP) -> int:
        tp = pp.position + pp.offset
        for pp2 in self.rpt_groups[pp.rpt_group]:
            if pp2 is not pp and pp2.position + pp2.offset == tp:
                return pp2.rpt_ind
        return -1

    def _advance_rpts(self, pp: _PP) -> bool:
        if pp.rpt_group < 0:
            return True
        rg = self.rpt_groups[pp.rpt_group]
        bits: set[int] = set()
        k0 = pp.rpt_ind
        while True:
            k = self._collide(pp)
            if k < 0:
                break
            pp2 = rg[k]
            # advance the lesser of the two colliding pps
            adv = pp if (pp.position, pp.offset) < (pp2.position, pp2.offset) else pp2
            if not self._advance_pp(adv):
                return False
            if adv.rpt_ind != k0:
                bits.add(adv.rpt_ind)
            pp = adv
        # re-queue every advanced pp that sits in the queue with a stale key
        stack = []
        while bits:
            pp2 = self._pq_pop()
            stack.append(pp2)
            if pp2.rpt_group >= 0 and pp2.rpt_ind in bits:
                bits.discard(pp2.rpt_ind)
        for pp2 in reversed(stack):
            self._pq_add(pp2)
        return True

    # -- nextMatch (SloppyPhraseMatcher.java:172-204) -------------------
    def next_match(self) -> bool:
        if not self.positioned:
            return False
        pp = self._pq_pop()
        self.match_length = self.end - pp.position
        next_pos = self._pq_top().position
        while self._advance_pp(pp):
            if self.has_rpts and not self._advance_rpts(pp):
                break
            if pp.position > next_pos:
                self._pq_add(pp)
                if self.match_length <= self.slop:
                    return True
                pp = self._pq_pop()
                next_pos = self._pq_top().position
                self.match_length = self.end - pp.position
            else:
                ml2 = self.end - pp.position
                if ml2 < self.match_length:
                    self.match_length = ml2
        self.positioned = False
        return self.match_length <= self.slop


def sloppy_freq(
    position_lists, offsets, slop: int, f32: bool = True, terms_per_pp=None
) -> float:
    """Sloppy phrase freq of one document: Σ 1/(1+matchLength) over the
    matcher's matches (PhraseScorer.score accumulation; float32 when
    ``f32``).  0.0 = no match.  ``terms_per_pp`` carries each slot's
    alternative terms for MultiPhraseQuery repeat-group detection (slots
    sharing a term); without it repeats are detected by identical
    position-list content (single-term PhraseQuery semantics)."""
    if any(len(pl) == 0 for pl in position_lists):
        return 0.0
    m = SloppyMatcher(position_lists, offsets, slop, terms_per_pp=terms_per_pp)
    if not m.reset():
        return 0.0
    if not m.next_match():
        return 0.0
    if f32:
        one = np.float32(1.0)
        freq = one / (one + np.float32(m.match_length))
        while m.next_match():
            freq = np.float32(freq + one / (one + np.float32(m.match_length)))
        return float(freq)
    freq = 1.0 / (1.0 + m.match_length)
    while m.next_match():
        freq += 1.0 / (1.0 + m.match_length)
    return freq
