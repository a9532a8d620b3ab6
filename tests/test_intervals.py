"""Interval queries: minimal-interval iterator semantics + Spark lowering."""

import numpy as np
import pytest

from lucene_spark.search import IndexSearcher
from lucene_spark.search.intervals import (
    NO_MORE,
    Term,
    build_iter,
    interval_freq,
    maxgaps,
    maxwidth,
    ordered,
    unordered,
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
    docs = set.intersection(*[set(oracle.positions.get(t, {})) for t in terms])
    for d in docs:
        pos_map = {t: oracle.positions[t][d] for t in terms}
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
    ],
    ids=["ordered", "unordered", "maxgaps", "nested"],
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
