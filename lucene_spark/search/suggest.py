"""Suggest / autocomplete over the term dictionary.

≙ the reference's suggest module (suggest/.../analyzing/
AnalyzingSuggester.java, FuzzySuggester.java), re-expressed corpus-side:
completions are ANALYZED index terms ranked by a weight — here
``total_term_freq`` from the term dictionary (the popularity weight a
corpus-derived suggester uses; AnalyzingSuggester stores an explicit
per-entry weight, which callers can supply via ``weights``).

Spark-first shape: a pushed-down scan of the (tiny relative to postings)
term_stats relation; within each crc32 bucket the stored dictionary is
term-sorted, so parquet row-group min/max stats prune the prefix range.
No FST is materialized — the dictionary relation IS the suggester state
(SURVEY.md §1.2: "do NOT rebuild the FST").

``suggest_fuzzy`` is the FuzzySuggester analog: terms whose prefix is
within ``max_edits`` Levenshtein of the typed prefix (JVM levenshtein —
simplified vs the reference's Levenshtein automaton, same acceptance for
the prefix-window it checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.index.builder import InvertedIndex


def _ranked(cands: DataFrame, k: int) -> DataFrame:
    from pyspark.sql import Window

    top = cands.orderBy(F.desc("weight"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("weight"), F.asc("term"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "term", "weight"
    ).orderBy("rank")


def _weighted_terms(index: InvertedIndex, weights: DataFrame | None) -> DataFrame:
    if weights is not None:
        return weights.select("term", F.col("weight").cast("long").alias("weight"))
    return index.term_stats.select(
        "term", F.col("total_term_freq").cast("long").alias("weight")
    )


def suggest_terms(
    index: InvertedIndex, prefix: str, k: int = 10, weights: DataFrame | None = None
) -> DataFrame:
    """(rank, term, weight): top-k completions of ``prefix`` by weight
    (AnalyzingSuggester.lookup analog; ties broken by term asc)."""
    cands = _weighted_terms(index, weights).filter(
        F.col("term").startswith(prefix)
    )
    return _ranked(cands, k)


def suggest_fuzzy(
    index: InvertedIndex,
    prefix: str,
    k: int = 10,
    max_edits: int = 1,
    weights: DataFrame | None = None,
) -> DataFrame:
    """(rank, term, weight): completions whose prefix is within
    ``max_edits`` of the typed prefix (FuzzySuggester analog).  The term's
    leading window of length |prefix|-max_edits .. |prefix|+max_edits is
    compared by JVM levenshtein."""
    n = len(prefix)
    wt = _weighted_terms(index, weights)
    cond = None
    for ln in range(max(1, n - max_edits), n + max_edits + 1):
        c = F.levenshtein(F.substring(F.col("term"), 1, ln), F.lit(prefix)) <= max_edits
        cond = c if cond is None else (cond | c)
    return _ranked(wt.filter(cond), k)
