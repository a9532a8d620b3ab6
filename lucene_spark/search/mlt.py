"""MoreLikeThis + query rescoring (derived-query operators).

≙ queries/src/java/org/apache/lucene/queries/mlt/MoreLikeThis.java and
core/search/QueryRescorer.java (SURVEY.md §2.6, §2.8).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from lucene_spark.search.query import BooleanQuery, Occur, Query, TermQuery


class MoreLikeThis:
    """Builds an OR-of-interesting-terms query from a source document.

    Term selection follows the reference defaults: candidate terms from the
    doc with tf >= min_term_freq and df in [min_doc_freq, max_doc_freq_pct
    of corpus], ranked by tf * idf, top max_query_terms kept
    (MoreLikeThis.java retrieveTerms/createQueue defaults:
    minTermFreq=2, minDocFreq=5, maxQueryTerms=25)."""

    def __init__(
        self,
        searcher,
        min_term_freq: int = 2,
        min_doc_freq: int = 5,
        max_doc_freq_pct: float = 0.5,
        max_query_terms: int = 25,
    ):
        self.searcher = searcher
        self.min_term_freq = min_term_freq
        self.min_doc_freq = min_doc_freq
        self.max_doc_freq_pct = max_doc_freq_pct
        self.max_query_terms = max_query_terms

    def like(self, doc_id: int) -> Query:
        idx = self.searcher.index
        # term-vectors path when attached: the doc-major relation prunes to
        # the doc's row group instead of scanning every term bucket
        # (MoreLikeThis.java retrieveTerms reads the doc's term vector when
        # stored, falling back to re-analysis otherwise)
        src = idx.term_vectors if idx.term_vectors is not None else idx.postings
        terms = (
            src.filter(F.col("doc_id") == doc_id)
            .filter(F.col("freq") >= self.min_term_freq)
            .select("term", "freq")
            .collect()
        )
        if not terms:
            return BooleanQuery.of()
        dfs = self.searcher.term_doc_freqs([r.term for r in terms])
        n = self.searcher.doc_count
        max_df = self.max_doc_freq_pct * n
        ranked = []
        for r in terms:
            df = dfs.get(r.term, 0)
            if df < self.min_doc_freq or df > max_df:
                continue
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            ranked.append((r.freq * idf, r.term))
        ranked.sort(key=lambda x: (-x[0], x[1]))
        chosen = ranked[: self.max_query_terms]
        if not chosen:
            return BooleanQuery.of()
        return BooleanQuery.of(
            *[(TermQuery(t), Occur.SHOULD) for _, t in chosen]
        )


def rescore(
    searcher,
    first_pass: DataFrame,
    rescore_query: Query,
    weight: float = 1.0,
    rescore_weight: float = 1.0,
    k: int | None = None,
) -> DataFrame:
    """QueryRescorer.rescore: combine first-pass scores with a second
    query's scores over ONLY the first-pass candidate set
    (score = weight * first + rescore_weight * second, missing second = 0).

    ``first_pass`` is a (doc_id, score) DataFrame (e.g. ``searcher.scored``
    output or a top-N slice of it)."""
    second = searcher.scored(rescore_query).withColumnRenamed("score", "_s2")
    out = (
        first_pass.join(second, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.col("score").cast("double") * F.lit(float(weight))
                + F.coalesce(F.col("_s2").cast("double"), F.lit(0.0))
                * F.lit(float(rescore_weight))
            )
            .cast(searcher.score_type)
            .alias("score"),
        )
    )
    if k is not None:
        out = out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return out
