"""Doc-values statistics over the matching doc set.

≙ the reference's misc module DocValuesStats / DocValuesStatsCollector
(misc/src/java/org/apache/lucene/misc/search/DocValuesStats.java:29,
DocValuesStatsCollector.java): a second-pass collector that, for every doc
matching a query, accumulates statistics of one doc-values field —
``count`` (docs with a value), ``missing`` (matching docs without one),
``min``/``max``, and for numeric fields ``sum``, ``mean``, population
``variance`` (DocValuesStats.java:130-133 divides by count) and ``stdev``.

Spark-first shape: the match set semi-joins the (column-pruned) docs
relation and ONE hash aggregate computes every statistic in a single pass
— partial aggregation runs map-side, only K=1 row crosses the exchange.
No collector state, no per-doc Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def numeric_doc_values_stats(searcher, query, col: str) -> DataFrame:
    """One row of LongDocValuesStats/DoubleDocValuesStats-shaped numeric
    statistics (DocValuesStats.java:102-209) for ``col`` over the docs
    matching ``query``.

    Columns: field, count, missing, vmin, vmax, vsum, mean, variance,
    stdev — mean/variance/stdev in double (population variance, the
    reference's ``variance / count``).  ``count`` counts matching docs
    WITH a value; min/max/sum/mean are undefined (NULL) when count = 0,
    matching the reference's "undefined when count() is zero" contract.
    """
    matched = searcher._matches(query)
    docs = searcher.index.docs.select("doc_id", F.col(col).cast("double").alias("_v"))
    joined = docs.join(matched, "doc_id", "left_semi")
    return joined.agg(
        F.lit(col).alias("field"),
        F.count("_v").cast("long").alias("count"),
        (F.count("*") - F.count("_v")).cast("long").alias("missing"),
        F.min("_v").alias("vmin"),
        F.max("_v").alias("vmax"),
        F.sum("_v").alias("vsum"),
        F.avg("_v").alias("mean"),
        F.var_pop("_v").alias("variance"),
        F.sqrt(F.var_pop("_v")).alias("stdev"),
    )


def sorted_doc_values_stats(searcher, query, col: str) -> DataFrame:
    """One row of SortedDocValuesStats-shaped statistics (DocValuesStats.java
    sorted variant): count/missing plus the ordinal min/max — for a string
    column the BytesRef order is plain string order."""
    matched = searcher._matches(query)
    docs = searcher.index.docs.select("doc_id", F.col(col).alias("_v"))
    joined = docs.join(matched, "doc_id", "left_semi")
    return joined.agg(
        F.lit(col).alias("field"),
        F.count("_v").cast("long").alias("count"),
        (F.count("*") - F.count("_v")).cast("long").alias("missing"),
        F.min("_v").alias("vmin"),
        F.max("_v").alias("vmax"),
    )
