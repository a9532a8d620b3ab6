"""Faceting over query matches (SURVEY.md §2.9).

≙ facet/src/java/org/apache/lucene/facet: FacetsCollector gathers matching
docs, then counts per dimension value / numeric range; DrillDownQuery adds
dimension filters; DrillSideways computes each dimension's counts as if its
own filter were removed.  All are hash aggregations / filtered aggregations
over the (matches x docs) join — one pass per request, GROUPING-SETS-style.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.search.query import Query


def _matches_with_docs(searcher, query: Query) -> DataFrame:
    m = searcher.scored(query).select("doc_id").distinct()
    return m.join(searcher.index.docs, "doc_id")


def facet_counts(searcher, query: Query, dim: str) -> DataFrame:
    """(value, n): match counts per dimension value (FacetsCollector +
    StringValueFacetCounts)."""
    return (
        _matches_with_docs(searcher, query)
        .groupBy(F.col(dim).alias("value"))
        .agg(F.count("*").alias("n"))
    )


def range_facet_counts(
    searcher, query: Query, col: str, boundaries: list
) -> DataFrame:
    """(bucket, n): counts per half-open numeric range
    [b0,b1), [b1,b2), ... (facet/range/LongRangeFacetCounts)."""
    c = F.col(col)
    bucket = F.lit(None).cast("int")
    for i in range(len(boundaries) - 1):
        lo, hi = boundaries[i], boundaries[i + 1]
        bucket = F.when((c >= lo) & (c < hi), F.lit(i)).otherwise(bucket)
    return (
        _matches_with_docs(searcher, query)
        .withColumn("bucket", bucket)
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def drill_down(searcher, query: Query, filters: dict) -> DataFrame:
    """DrillDownQuery: matches of ``query`` restricted to dimension values
    (dim -> value); returns the filtered (doc_id + doc columns) frame."""
    out = _matches_with_docs(searcher, query)
    for dim, value in filters.items():
        out = out.filter(F.col(dim) == value)
    return out


def drill_sideways(searcher, query: Query, filters: dict) -> dict[str, DataFrame]:
    """DrillSideways: for each drilled dimension, facet counts computed with
    every OTHER dimension's filter applied but its own removed — one
    filtered aggregation per dimension over a single matches frame."""
    base = _matches_with_docs(searcher, query)
    out = {}
    for dim in filters:
        sub = base
        for other, value in filters.items():
            if other != dim:
                sub = sub.filter(F.col(other) == value)
        out[dim] = sub.groupBy(F.col(dim).alias("value")).agg(
            F.count("*").alias("n")
        )
    return out
