"""PathHierarchyTokenizer analog — hierarchy-prefix expansion.

Reference: analysis/common/src/java/org/apache/lucene/analysis/path/
PathHierarchyTokenizer.java:30 ("/a/b/c" -> "/a", "/a/b", "/a/b/c";
trailing delimiters kept; ``skip`` drops leading path levels; the
``replacement`` char substitutes the delimiter in emitted tokens).

Vectors (TestPathHierarchyTokenizer.java) pin the split-prefix
formulation used by all three lowerings: split on the delimiter, emit
``join(segments[:i])`` for i = 1..n, drop empty prefixes — identical to
the reference's scanner for every ported case including "//", trailing
delimiters and leading-char paths.

The Spark/DuckDB lowerings are the facet drill-down shape (taxonomy
facets over path-valued columns): expand each path to its ancestor
prefixes, then hash-aggregate — no UDF.
"""

from __future__ import annotations

import re


def path_hierarchy_tokens(
    path: str | None,
    delimiter: str = "/",
    replacement: str | None = None,
    skip: int = 0,
) -> list[str]:
    """Python reference (oracle path)."""
    if path is None or path == "":
        return []
    if skip < 0:
        raise ValueError("skip must be >= 0")
    segs = path.split(delimiter)
    if skip:
        lead = 1 if segs and segs[0] == "" else 0
        if len(segs) - lead <= skip:
            return []
        # remainder always starts at the delimiter preceding the first
        # kept segment (testBasicSkip / testStartOfCharSkip offsets)
        segs = [""] + segs[lead + skip :]
    rep = delimiter if replacement is None else replacement
    out = []
    for i in range(1, len(segs) + 1):
        tok = rep.join(segs[:i])
        if tok:
            out.append(tok)
    return out


def path_hierarchy_expr(
    col,
    delimiter: str = "/",
    replacement: str | None = None,
    skip: int = 0,
):
    """Column(string) -> Column(array<string>), pure JVM."""
    from pyspark.sql import functions as F

    if skip < 0:
        raise ValueError("skip must be >= 0")
    segs = F.split(col, re.escape(delimiter))
    if skip:
        lead = F.when(F.element_at(segs, 1) == "", F.lit(1)).otherwise(F.lit(0))
        segs = F.when(
            F.size(segs) - lead > skip,
            F.concat(
                F.array(F.lit("")),
                F.slice(segs, lead + F.lit(skip + 1), F.size(segs)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    rep = delimiter if replacement is None else replacement
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(segs)),
        lambda i: F.array_join(F.slice(segs, 1, i), rep),
    )
    out = F.filter(prefixes, lambda x: x != "")
    return F.when(col.isNull() | (F.size(segs) == 0), F.array().cast("array<string>")).otherwise(out)


def path_hierarchy_sql(
    expr: str,
    delimiter: str = "/",
    replacement: str | None = None,
    skip: int = 0,
) -> str:
    """DuckDB twin: a list expression over ``expr`` (a string column)."""
    d = delimiter.replace("'", "''")
    rep = d if replacement is None else replacement.replace("'", "''")
    segs = f"string_split({expr}, '{d}')"
    if skip:
        # no subqueries (DuckDB lambdas reject them) — spell the base
        # split out per branch
        s = segs
        segs = (
            f"(CASE WHEN {s}[1] = '' THEN"
            f" (CASE WHEN len({s}) - 1 > {skip} THEN"
            f" list_concat([''], {s}[{skip + 2}:]) ELSE [] END)"
            f" ELSE (CASE WHEN len({s}) > {skip} THEN"
            f" list_concat([''], {s}[{skip + 1}:]) ELSE [] END) END)"
        )
    return (
        f"list_filter(list_transform(range(1, len({segs}) + 1),"
        f" i -> array_to_string(list_slice({segs}, 1, i), '{rep}')),"
        f" x -> x <> '')"
    )
