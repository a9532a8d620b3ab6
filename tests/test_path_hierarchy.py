"""PathHierarchyTokenizer analog — reference vectors + three-way parity."""

import duckdb
import pytest

from lucene_spark.analysis.path import (
    path_hierarchy_expr,
    path_hierarchy_sql,
    path_hierarchy_tokens,
)

VECTORS = [
    ("/a/b/c", ["/a", "/a/b", "/a/b/c"]),
    ("/a/b/c/", ["/a", "/a/b", "/a/b/c", "/a/b/c/"]),
    ("a/b/c", ["a", "a/b", "a/b/c"]),
    ("a/b/c/", ["a", "a/b", "a/b/c", "a/b/c/"]),
    ("/", ["/"]),
    ("//", ["/", "//"]),
]


def test_reference_vectors():
    """TestPathHierarchyTokenizer.java: testBasic/EndOfDelimiter/
    StartOfChar/OnlyDelimiter(s)/Replace/BasicSkip/EndOfDelimiterSkip."""
    for p, want in VECTORS:
        assert path_hierarchy_tokens(p) == want, p
    assert path_hierarchy_tokens("/a/b/c", replacement="\\") == [
        "\\a", "\\a\\b", "\\a\\b\\c",
    ]
    assert path_hierarchy_tokens("/a/b/c", skip=1) == ["/b", "/b/c"]
    assert path_hierarchy_tokens("/a/b/c/", skip=1) == ["/b", "/b/c", "/b/c/"]
    assert path_hierarchy_tokens("a/b/c", skip=1) == ["/b", "/b/c"]
    assert path_hierarchy_tokens(None) == []
    assert path_hierarchy_tokens("") == []
    with pytest.raises(ValueError):
        path_hierarchy_tokens("/a", skip=-1)


@pytest.mark.parametrize("skip", [0, 1, 2])
def test_three_way_parity(spark, skip):
    from pyspark.sql import functions as F

    paths = [
        "/a/b/c", "/a/b/c/", "a/b/c", "/", "//", "abc", "", None,
        "/x", "x/", "/a//b", "a", "/deep/er/path/here",
    ]
    df = spark.createDataFrame([(p,) for p in paths], "p string")
    rows = df.select(
        path_hierarchy_expr(F.col("p"), skip=skip).alias("t")
    ).collect()
    con = duckdb.connect()
    for p, r in zip(paths, rows):
        want = path_hierarchy_tokens(p, skip=skip)
        assert list(r.t or []) == want, (p, skip, r.t, want)
        if p is not None:
            esc = p.replace("'", "''")
            duck = con.execute(
                "SELECT " + path_hierarchy_sql(f"'{esc}'", skip=skip)
            ).fetchone()[0]
            assert duck == want, (p, skip, duck, want)
