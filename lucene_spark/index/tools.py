"""Index diagnostics tools (the reference's misc module CLI utilities)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.index.builder import InvertedIndex


def high_freq_terms(
    index: InvertedIndex, n: int = 100, order_by: str = "doc_freq"
) -> DataFrame:
    """(rank, term, doc_freq, total_term_freq): the top-``n`` dictionary
    terms by docFreq or totalTermFreq — misc/HighFreqTerms.java:33-39
    (DEFAULT_NUMTERMS=100; -t flag switches the comparator to
    totalTermFreq).  Ties break term-asc for determinism.  A pushed-down
    scan of the (tiny) term_stats relation + TakeOrderedAndProject."""
    if order_by not in ("doc_freq", "total_term_freq"):
        raise ValueError("order_by must be doc_freq or total_term_freq")
    from pyspark.sql import Window

    top = (
        index.term_stats.select(
            "term",
            F.col("doc_freq").cast("long").alias("doc_freq"),
            F.col("total_term_freq").cast("long").alias("total_term_freq"),
        )
        .orderBy(F.desc(order_by), F.asc("term"))
        .limit(n)
    )
    w = Window.orderBy(F.desc(order_by), F.asc("term"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "term",
        "doc_freq",
        "total_term_freq",
    ).orderBy("rank")
