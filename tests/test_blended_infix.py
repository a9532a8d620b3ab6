"""BlendedInfixSuggester (suggest/.../analyzing/BlendedInfixSuggester.java):
position-blended infix lookup, hand-computed vectors."""

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def suggester(spark):
    from lucene_spark.analysis import Analyzer
    from lucene_spark.search.suggest import build_analyzing_suggester

    entries = spark.createDataFrame(
        [
            ("data cube tool", 3),
            ("big data center", 5),
            ("data code", 20),
            ("the data cart", 7),
            ("cart data x", 12),
            ("zero data cx", 0),
        ],
        "surface string, weight long",
    )
    return build_analyzing_suggester(entries, Analyzer())


def _lookup(suggester, key, **kw):
    from lucene_spark.analysis import Analyzer
    from lucene_spark.search.suggest import blended_infix_lookup

    rows = blended_infix_lookup(suggester, Analyzer(), key, **kw).collect()
    return [(r.surface, r.score) for r in rows]


def test_blended_reciprocal(suggester):
    got = _lookup(suggester, "data c", k=10, blender="reciprocal")
    # data cube tool / data code startWith the key -> coef 1 (w 3->30, 20)
    # big data center: first match pos 1 -> 50/2 = 25
    # the data cart:   pos 1 -> 70/2 = 35
    # cart data x:     'cart' prefix-matches 'c' at pos 0 -> coef 1; w=12
    #                  is NOT scaled (|w| >= 1/LINEAR_COEF) -> 12
    # zero data cx:    weight 0 -> 1 -> 10; pos 1 -> 5
    assert got == [
        ("the data cart", 35),
        ("data cube tool", 30),
        ("big data center", 25),
        ("data code", 20),
        ("cart data x", 12),
        ("zero data cx", 5),
    ]


def test_blended_linear(suggester):
    got = dict(_lookup(suggester, "data c", k=10, blender="linear"))
    # non-prefix hits at pos 1: coef 0.9
    assert got["the data cart"] == 63   # 70 * 0.9
    assert got["big data center"] == 45  # 50 * 0.9
    assert got["data cube tool"] == 30   # startsWith -> coef 1
    assert got["cart data x"] == 12      # pos 0 -> coef 1, w unscaled


def test_blended_exponential(suggester):
    got = dict(
        _lookup(
            suggester, "data c", k=10,
            blender="exponential_reciprocal", exponent=2.0,
        )
    )
    assert got["the data cart"] == 17   # (long)(70 / 4) = 17
    assert got["big data center"] == 12  # (long)(50 / 4)


def test_blended_k_and_validation(suggester):
    got = _lookup(suggester, "data c", k=2, blender="reciprocal")
    assert got == [("the data cart", 35), ("data cube tool", 30)]
    from lucene_spark.analysis import Analyzer
    from lucene_spark.search.suggest import blended_infix_lookup

    with pytest.raises(ValueError):
        blended_infix_lookup(suggester, Analyzer(), "x", blender="nope")
