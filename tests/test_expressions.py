"""Expressions-module JS compiler parity.

Replays the reference's own test vectors, parsed straight out of
``expressions/src/test/.../js/TestJavascriptOperations.java`` (222
long-valued assertions) and ``TestJavascriptFunction.java`` (165
double-valued assertions, delta 1e-7), then cross-checks the SQL
emission: the Spark and DuckDB dialects must produce the SAME value
(they share every guarded formula), and both must match the
interpreter.
"""

from __future__ import annotations

import math
import re

import pytest

from lucene_spark.search.expressions import (
    JavascriptCompiler,
    JavascriptParseError,
)

_REF = (
    "/root/reference/lucene/expressions/src/test/org/apache/lucene/"
    "expressions/js/"
)

_ASSERT_RE = re.compile(r'assertEvaluatesTo\(\s*"((?:[^"\\]|\\.)*)"\s*,\s*(.*?)\);', re.S)


def _java_str(s: str) -> str:
    return s.encode().decode("unicode_escape")


def _load_vectors(fname: str):
    with open(_REF + fname) as f:
        text = f.read()
    # join string concatenations like "cos(" + Math.PI / 2 + ")" — the
    # spliced Java double renders the same digits as python repr
    def _splice(m):
        v = eval(  # noqa: S307 — reference constants
            m.group(1).replace("Math.PI", "math.pi").replace("Math.E", "math.e"),
            {"math": math},
        )
        return repr(float(v))

    text = re.sub(r'"\s*\+\s*([^"+]+?)\s*\+\s*"', _splice, text)
    out = []
    for m in _ASSERT_RE.finditer(text):
        expr = _java_str(m.group(1))
        expected = m.group(2).strip()
        out.append((expr, expected))
    return out


def _eval_expected(src: str) -> float:
    src = src.replace("Math.PI", "math.pi").replace("Math.E", "math.e")
    src = src.replace("Double.POSITIVE_INFINITY", "math.inf")
    src = src.replace("Double.NEGATIVE_INFINITY", "-math.inf")
    src = src.replace("Double.NaN", "math.nan")
    src = re.sub(r"(\d)L\b", r"\1", src)
    return float(eval(src, {"math": math}))  # noqa: S307 — reference constants


def test_operations_vectors_replay():
    vectors = _load_vectors("TestJavascriptOperations.java")
    assert len(vectors) >= 200
    for expr, expected_src in vectors:
        # the expected side may itself be a Java constant expression
        # (hex / octal literals, shifts): 1 << 0x1, 010 << 2, ...
        src = re.sub(r"L\b", "", expected_src)
        src = re.sub(r"\b0(?=[0-7]+\b)(?![xX])", "0o", src)
        expected = int(eval(src))  # noqa: S307 — reference constants
        got = JavascriptCompiler.compile(expr).evaluate({})
        # the reference test casts the double result to long
        from lucene_spark.search.expressions import _d2l

        assert _d2l(got) == expected, f"{expr!r}: {got} -> {_d2l(got)} != {expected}"


def test_function_vectors_replay():
    vectors = _load_vectors("TestJavascriptFunction.java")
    assert len(vectors) >= 150
    for expr, expected_src in vectors:
        expected = _eval_expected(expected_src)
        got = JavascriptCompiler.compile(expr).evaluate({})
        if math.isnan(expected):
            assert math.isnan(got), f"{expr!r}: {got} != NaN"
        elif math.isinf(expected):
            assert got == expected, f"{expr!r}: {got} != {expected}"
        else:
            assert got == pytest.approx(expected, abs=1e-7), f"{expr!r}"


def test_invalid_expressions_raise():
    # TestJavascriptCompiler.java invalid-syntax cases
    for bad in [
        "100 100",
        "7*/-8",
        "0x100x",
        "logn()",
        "logn(2)",
        "logn(2, 3, 4)",
        "tan()",
        "hi()",
        "sqrt(",
        "(1+2",
        "",
        "a.",
        ".invalid",
        "negative[-1]",
        "float[1.0]",
    ]:
        with pytest.raises(JavascriptParseError):
            JavascriptCompiler.compile(bad)


def test_variables_collected():
    e = JavascriptCompiler.compile("a + b * _score - abs(a)")
    assert e.variables == ("_score", "a", "b")
    assert e.evaluate({"a": 2.0, "b": 3.0, "_score": 4.0}) == 2 + 12 - 2


# ---------------------------------------------------------------------------
# SQL emission cross-check
# ---------------------------------------------------------------------------

_SQL_EXPRS = [
    "x + y * 2",
    "x / y",
    "x / 0",
    "0 / 0",
    "x % y",
    "x % 0",
    "-x + +y",
    "x > y ? ln(1 + abs(x)) : sqrt(abs(y))",
    "x == y",
    "x != y",
    "!x",
    "x && y",
    "x || y",
    "x < y && y <= 10",
    "min(x, y) + max(x, y)",
    "pow(abs(x), 0.5) + exp(min(x, 2))",
    "log10(abs(y) + 1) + logn(2, abs(x) + 1)",
    "ln(x)",  # negative x -> NaN, 0 -> -Inf
    "sqrt(x)",
    "asin(x / 10)",
    "acos(x / 10)",
    "atan2(y, x)",
    "sinh(x / 3) + cosh(y / 3) + tanh(x)",
    "asinh(x) + acosh(abs(x) + 1) + atanh(x / 11)",
    "ceil(x / 3) + floor(y / 3)",
    "x & 7",
    "x | 3",
    "x ^ 5",
    "~x",
    "(x > 0 ? 1 : 0) ? y : -y",
    "haversin(40.7143528, -74.0059731, x, y)",
    "abs(x) < 1e300 ? 1 : 2",
]

_GRID = [
    (0.0, 0.0),
    (1.0, 2.0),
    (-7.3, 3.1),
    (10.0, -2.5),
    (-0.5, 0.0),
    (2.5, 2.5),
    (-10.0, 7.0),
    (41.2, -73.5),
]


def test_sql_emission_duckdb_matches_interpreter():
    import duckdb

    con = duckdb.connect()
    for expr in _SQL_EXPRS:
        compiled = JavascriptCompiler.compile(expr)
        for x, y in _GRID:
            sql = compiled.to_sql("duckdb", {"x": f"({x!r})", "y": f"({y!r})"})
            got = con.execute(f"SELECT {sql}").fetchone()[0]
            want = compiled.evaluate({"x": x, "y": y})
            _assert_same(expr, x, y, got, want)


def test_sql_emission_spark_matches_duckdb_and_interpreter(spark):
    import duckdb

    con = duckdb.connect()
    for expr in _SQL_EXPRS:
        compiled = JavascriptCompiler.compile(expr)
        for x, y in _GRID[:4]:
            binds = {"x": f"(CAST({x!r} AS DOUBLE))", "y": f"(CAST({y!r} AS DOUBLE))"}
            s_sql = compiled.to_sql("spark", binds)
            d_sql = compiled.to_sql("duckdb", binds)
            got_s = spark.sql(f"SELECT {s_sql} AS v").collect()[0][0]
            got_d = con.execute(f"SELECT {d_sql}").fetchone()[0]
            want = compiled.evaluate({"x": x, "y": y})
            _assert_same(expr, x, y, got_s, want)
            # cross-engine: identical up to 1-ulp libm differences
            # (java.lang.Math vs libm transcendentals) — far inside the
            # driver's %.10g float canonicalization
            if math.isnan(got_s):
                assert math.isnan(got_d), f"{expr!r} @ ({x},{y}): {got_s} vs {got_d}"
            else:
                assert got_s == pytest.approx(got_d, rel=1e-14, abs=1e-300), (
                    f"{expr!r} @ ({x},{y}): {got_s} vs {got_d}"
                )


def test_shift_ops_spark_only(spark):
    compiled = JavascriptCompiler.compile("(x << 2) + (x >> 1) + (x >>> 1)")
    sql = compiled.to_sql("spark", {"x": "(CAST(-12.0 AS DOUBLE))"})
    got = spark.sql(f"SELECT {sql} AS v").collect()[0][0]
    assert got == compiled.evaluate({"x": -12.0})
    with pytest.raises(NotImplementedError):
        compiled.to_sql("duckdb", {"x": "1.0"})


def _assert_same(expr, x, y, got, want):
    assert got is not None, f"{expr!r} @ ({x},{y}): SQL returned NULL"
    got = float(got)
    if math.isnan(want):
        assert math.isnan(got), f"{expr!r} @ ({x},{y}): {got} != NaN"
    elif math.isinf(want):
        assert got == want, f"{expr!r} @ ({x},{y}): {got} != {want}"
    else:
        assert got == pytest.approx(want, rel=1e-12, abs=1e-12), (
            f"{expr!r} @ ({x},{y}): {got} != {want}"
        )
