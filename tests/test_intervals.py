"""Interval queries: minimal-interval iterator semantics + Spark lowering."""

import numpy as np
import pytest

from lucene_spark.search import IndexSearcher
from lucene_spark.search.intervals import (
    NO_MORE,
    Term,
    after_,
    before_,
    build_iter,
    extend,
    interval_freq,
    maxgaps,
    maxwidth,
    non_overlapping,
    not_contained_by,
    not_containing,
    not_within,
    or_,
    ordered,
    overlapping,
    unordered,
    unordered_no_overlaps,
    within,
)
from lucene_spark.search.query import IntervalQuery


def _run(src, pos):
    it = build_iter(src, pos)
    if it is None:
        return []
    out = []
    while it.next_interval() != NO_MORE:
        out.append((it.start, it.end, it.gaps()))
    return out


# -- iterator semantics -----------------------------------------------------


def test_ordered_minimal_intervals():
    # "a x b a b": minimal ordered a..b intervals are (0,2) and (3,4)
    assert _run(ordered("a", "b"), {"a": [0, 3], "b": [2, 4]}) == [
        (0, 2, 1), (3, 4, 0)
    ]


def test_ordered_requires_order():
    assert _run(ordered("a", "b"), {"a": [5], "b": [2]}) == []


def test_unordered_any_order():
    assert _run(unordered("a", "b"), {"a": [1], "b": [0]}) == [(0, 1, 0)]


def test_unordered_three_sources_minimal_windows():
    got = _run(unordered("a", "b", "c"), {"a": [0, 9], "b": [4], "c": [5]})
    assert got == [(0, 5, 3), (4, 9, 3)]


def test_maxgaps_and_maxwidth_filter():
    pos = {"a": [0, 3], "b": [2, 4]}
    assert _run(maxgaps(0, ordered("a", "b")), pos) == [(3, 4, 0)]
    assert _run(maxwidth(2, ordered("a", "b")), pos) == [(3, 4, 0)]


def test_nested_ordered_of_unordered():
    got = _run(ordered(unordered("a", "b"), Term("c")), {"a": [0], "b": [1], "c": [3]})
    assert got == [(0, 3, 1)]


def test_missing_term_no_match():
    assert _run(ordered("a", "zz"), {"a": [0]}) == []
    assert interval_freq(ordered("a", "zz"), {"a": [0]}) == 0.0


def test_freq_accumulation():
    # intervals (0,2) len 3 -> 1/2; (3,4) len 2 -> 1/1; minExtent 2
    f = interval_freq(ordered("a", "b"), {"a": [0, 3], "b": [2, 4]})
    one = np.float32(1.0)
    assert f == float(np.float32(np.float32(0.5) + one))


# -- Spark lowering ---------------------------------------------------------


def _expected_scores(oracle, src, pivot=1.0):
    """Recompute per-doc freq from the oracle's positions + saturation."""
    terms = set(src.terms())
    out = {}
    req = src.required_terms()
    if req:
        docs = set.intersection(
            *[set(oracle.positions.get(t, {})) for t in req]
        )
    else:
        docs = set().union(*[set(oracle.positions.get(t, {})) for t in terms])
    for d in docs:
        pos_map = {t: oracle.positions.get(t, {}).get(d, []) for t in terms}
        fr = interval_freq(src, pos_map, f32=True)
        if fr > 0:
            p = np.float32(pivot)
            sat = np.float32(
                np.float32(1.0) - np.float32(p / np.float32(p + np.float32(fr)))
            )
            out[d] = np.float32(np.float32(1.0) * sat)
    return out


@pytest.mark.parametrize(
    "src",
    [
        ordered("the", "model"),
        unordered("model", "data"),
        maxgaps(1, ordered("the", "model")),
        ordered("the", unordered("model", "data")),
        not_containing(ordered("the", "model"), Term("data")),
        within(Term("model"), 3, Term("data")),
        before_(Term("model"), Term("data")),
        non_overlapping(Term("model"), Term("the")),
    ],
    ids=[
        "ordered", "unordered", "maxgaps", "nested",
        "not_containing", "within", "before", "non_overlapping",
    ],
)
def test_engine_intervals_match_recomputation(spark, tiny_index, tiny_oracle, src):
    s = IndexSearcher(tiny_index)
    got = s.search(IntervalQuery(src), 20).collect()
    want = _expected_scores(tiny_oracle, src)
    want_sorted = sorted(
        ((d, sc) for d, sc in want.items()), key=lambda kv: (-float(kv[1]), kv[0])
    )[:20]
    keys = {d.doc_id: (d.conv_id, d.turn_idx) for d in tiny_oracle.docs}
    assert [(r.conv_id, r.turn_idx) for r in got] == [keys[d] for d, _ in want_sorted]
    np.testing.assert_array_equal(
        np.array([r.score for r in got], dtype=np.float32),
        np.array([sc for _, sc in want_sorted], dtype=np.float32),
    )


# -- round-5 combinators: ported reference cases ------------------------------
# (queries/.../intervals/TestIntervals.java field1_docs / field2_docs; the
# expected int[][] arrays below are copied from the named test methods)

FIELD1 = [
    "Nothing of interest to anyone here",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot nine"
    " days old.  Some like it hot, some like it cold, some like it in the"
    " pot nine days old",
    "Pease porridge cold, pease porridge hot, pease porridge in the pot"
    " twelve days old.  Some like it cold, some like it hot, some like it in"
    " the fraggle",
    "Nor here, nowt hot going on in pease this one",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot nine"
    " years old.  Some like it hot, some like it twelve",
    "Porridge is great",
    "",
]
FIELD2 = [
    "In Xanadu did Kubla Khan a stately pleasure dome decree",
    "Where Alph the sacred river ran through caverns measureless to man",
    "a b a c b a b c",
    "So thrice five miles of fertile ground",
    "Pease hot porridge porridge",
    "w1 w2 w3 w4 w1 w6 w3 w8 w4 w7 w1 w6",
    "the quick brown fox jumps over the lazy dog",
]


def _pos_map(doc: str) -> dict:
    import re

    pm: dict = {}
    for i, tok in enumerate(re.findall(r"[a-z0-9]+", doc.lower())):
        pm.setdefault(tok, []).append(i)
    return pm


def _check_intervals(src, docs, expected):
    """checkIntervals analog: expected[doc] = flat (start, end) pairs."""
    for doc, exp in zip(docs, expected):
        got = [(s, e) for s, e, _ in _run(src, _pos_map(doc))]
        flat = [v for pair in got for v in pair]
        assert flat == exp, f"doc={doc!r}: got {flat}, want {exp}"


def test_extends_ported():
    # TestIntervals.testExtends
    src = extend(Term("fox"), 1, 2)
    _check_intervals(src, FIELD2, [[], [], [], [], [], [], [2, 5]])


def test_extends_overflow_clamp_ported():
    # TestIntervals.testDefinedGaps tail: extend(w1, 5, Integer.MAX_VALUE)
    maxi = (1 << 31) - 1
    src = extend(Term("w1"), 5, maxi)
    _check_intervals(
        src,
        FIELD2,
        [[], [], [], [], [], [0, maxi - 1, 0, maxi - 1, 5, maxi - 1], []],
    )
    assert src.min_extent() == maxi


def test_defined_gaps_ported():
    # TestIntervals.testDefinedGaps: phrase(pease, extend(cold,1,1), porridge)
    # -> block semantics == maxgaps(0, ordered(...))
    src = maxgaps(0, ordered(Term("pease"), extend(Term("cold"), 1, 1), Term("porridge")))
    _check_intervals(src, FIELD1, [[], [3, 7], [0, 4], [], [3, 7], [], []])
    assert ordered(Term("pease"), extend(Term("cold"), 1, 1), Term("porridge")).min_extent() == 5


def test_not_containing_ported():
    # TestIntervals.testNotContaining
    src = not_containing(ordered("porridge", "pease"), Term("hot"))
    _check_intervals(src, FIELD1, [[], [4, 6], [1, 3], [], [4, 6], [], []])
    assert src.min_extent() == 2


def test_after_ported():
    # TestIntervals.testAfter
    src = after_(Term("porridge"), ordered("pease", "cold"))
    _check_intervals(src, FIELD1, [[], [7, 7], [4, 4, 7, 7], [], [7, 7], [], []])
    assert src.min_extent() == 1


def test_unordered_no_overlaps_ported():
    # TestIntervals.testUnorderedDistinct (:608-638): unorderedNoOverlaps
    # rewrites to or(ordered(a,b), ordered(b,a))
    src = unordered_no_overlaps(Term("pease"), Term("pease"))
    _check_intervals(
        src, FIELD1,
        [[], [0, 3, 3, 6], [0, 3, 3, 6], [], [0, 3, 3, 6], [], []],
    )
    src = unordered_no_overlaps(
        unordered(Term("pease"), Term("porridge"), Term("hot")),
        Term("porridge"),
    )
    _check_intervals(
        src, FIELD1,
        [[], [1, 4, 2, 7, 4, 17], [1, 5, 4, 7], [], [1, 4, 2, 7, 4, 17],
         [], []],
    )
    _check_intervals(src, FIELD2, [[], [], [], [], [0, 3], [], []])
    src = unordered_no_overlaps(
        Term("porridge"), unordered(Term("pease"), Term("porridge"))
    )
    _check_intervals(
        src, FIELD1,
        [[], [1, 4, 4, 7], [1, 4, 4, 7], [], [1, 4, 4, 7], [], []],
    )


def test_before_ported():
    # TestIntervals.testBefore
    src = before_(Term("cold"), Term("twelve"))
    _check_intervals(src, FIELD1, [[], [], [2, 2], [], [5, 5], [], []])
    assert src.min_extent() == 1


def test_within_ported():
    # TestIntervals.testWithin
    src = within(Term("hot"), 6, or_(Term("porridge"), Term("fraggle")))
    _check_intervals(src, FIELD1, [[], [2, 2], [5, 5, 21, 21], [], [2, 2], [], []])
    assert src.min_extent() == 1


def test_overlapping_ported():
    # TestIntervals.testOverlapping (start/end pairs + the gaps assertion)
    src = overlapping(unordered("hot", "porridge"), unordered("cold", "pease"))
    _check_intervals(
        src, FIELD1, [[], [2, 4, 7, 17], [5, 7, 7, 21], [], [2, 4], [], []]
    )
    got = [g for _, _, g in _run(src, _pos_map(FIELD1[2]))]
    assert got == [1, 13]
    assert src.min_extent() == 2


def test_not_contained_by_semantics():
    # a at 0,5; big b..c spans (2,4): a@0 and a@5 escape, a@3 would not
    src = not_contained_by(Term("a"), unordered("b", "c"))
    assert [(s, e) for s, e, _ in _run(src, {"a": [0, 3, 5], "b": [2], "c": [4]})] == [
        (0, 0), (5, 5)
    ]
    # subtrahend absent: every minuend interval emits
    assert [(s, e) for s, e, _ in _run(src, {"a": [1, 2]})] == [(1, 1), (2, 2)]


def test_non_overlapping_and_not_within_semantics():
    pos = {"a": [0, 4, 9], "b": [4]}
    src = non_overlapping(Term("a"), Term("b"))
    assert [(s, e) for s, e, _ in _run(src, pos)] == [(0, 0), (9, 9)]
    # not_within(a, 3, b): a intervals >= 4 positions away from b@4
    srcw = not_within(Term("a"), 3, Term("b"))
    assert [(s, e) for s, e, _ in _run(srcw, pos)] == [(0, 0), (9, 9)]
    srcw2 = not_within(Term("a"), 5, Term("b"))
    assert [(s, e) for s, e, _ in _run(srcw2, pos)] == []
    # subtrahend absent: all emit
    assert [(s, e) for s, e, _ in _run(src, {"a": [1]})] == [(1, 1)]


def test_difference_sources_required_terms():
    src = not_containing(ordered("a", "b"), Term("z"))
    assert src.required_terms() == {"a", "b"}
    assert or_(Term("a"), Term("b")).required_terms() == set()
    assert within(Term("a"), 2, Term("b")).required_terms() == {"a", "b"}


def test_minimum_should_match_ported():
    # TestIntervals.testMinimumShouldMatch (:769-809)
    from lucene_spark.search.intervals import atleast

    src = atleast(3, "porridge", "hot", "twelve", "nine", "pease")
    _check_intervals(
        src, FIELD1,
        [[], [0, 2, 1, 3, 2, 4, 6, 11, 7, 17], [3, 5, 4, 6, 5, 7, 6, 11, 7, 21],
         [], [0, 2, 1, 3, 2, 4, 6, 11, 7, 17, 11, 21], [], []],
    )
    # assertGaps(source, 1, "field1", {0, 0, 0, 3, 8})
    gaps = [g for _, _, g in _run(src, _pos_map(FIELD1[1]))]
    assert gaps == [0, 0, 0, 3, 8]
    assert src.min_extent() == 3


def test_min_should_match2_ported():
    # TestIntervals.testMinShouldMatch2 (:812-834): doc 1 of field2
    from lucene_spark.search.intervals import atleast

    src = atleast(
        2, unordered(Term("alph"), Term("ran")), Term("where"), Term("river")
    )
    got = [(s, e) for s, e, _ in _run(src, _pos_map(FIELD2[1]))]
    assert got == [(0, 4), (1, 5)]


def test_degenerate_min_should_match_ported():
    # TestIntervals.testDegenerateMinShouldMatch (:836-851): atLeast(1, x)
    # == unordered(x) by the factory rewrite
    from lucene_spark.search.intervals import atleast

    src = ordered(atleast(1, Term("interest")), atleast(1, Term("anyone")))
    got = [(s, e) for s, e, _ in _run(src, _pos_map(FIELD1[0]))]
    assert got == [(2, 4)]


def test_no_match_min_should_match_ported():
    # TestIntervals.testNoMatchMinShouldMatch (:853-856)
    from lucene_spark.search.intervals import atleast

    src = atleast(4, Term("a"), Term("b"))
    for doc in FIELD1 + FIELD2:
        assert _run(src, _pos_map(doc)) == []
    assert src.min_extent() == 0


def test_phrase_factory_ported():
    # TestIntervals.testPhraseIntervals (:349-360)
    from lucene_spark.search.intervals import phrase

    src = phrase("pease", "porridge")
    _check_intervals(
        src, FIELD1,
        [[], [0, 1, 3, 4, 6, 7], [0, 1, 3, 4, 6, 7], [], [0, 1, 3, 4, 6, 7],
         [], []],
    )
    assert phrase("pease").terms() == ("pease",)
