"""Text classification over an indexed corpus — the reference's
``lucene/classification`` module re-expressed as relational algebra.

:func:`naive_bayes_classify` is SimpleNaiveBayesClassifier
(classification/SimpleNaiveBayesClassifier.java:140-258) with the same
statistics, computed for EVERY test document in one distributed pass
instead of per-document index probes:

* ``hits(w,c)``   = # train docs of class c containing w
  (``getWordFreqForClass`` — a *document* count, not a term-freq sum)
* ``den(c)``      = avgUniqueTermsPerDoc * docFreq(class=c) + docsWithClass
  (``getTextTermFreqForClass`` + add-|V| smoothing denominator)
* ``log P(d|c)``  = Σ_tokens ln((hits+1) / den(c))   (add-one smoothing,
  token REPEATS counted — ``calculateLogLikelihood``)
* ``log P(c)``    = ln(docFreq(c)) − ln(docsWithClass) (``calculateLogPrior``)
* assigned class  = argmax over classes (ties broken by class value asc)

The reference's ``normClassificationResults`` is a monotone per-doc
rescaling for display; it never changes the assigned class, so the raw
log score is returned instead (cross-engine comparable without exp()).

Scale shape: train-side stats are two hash aggregations over the exploded
(doc, term) relation; the per-class term table joins the test tokens on
``term`` after a small cross join with the class dimension (classes are a
broadcast-sized dim).  Everything is JVM column expressions — no UDF.

:func:`knn_classify` is KNearestNeighborClassifier.java:40 — more-like-
this retrieval + score-weighted vote — left to the MLT surface
(search/mlt.py) composed with a groupBy vote; see tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOKEN_PATTERN = "[a-z0-9]+"


def _tokens(text_col: str):
    return F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)")


def naive_bayes_classify(
    train_df: DataFrame,
    test_df: DataFrame,
    class_col: str = "role",
    text_col: str = "text",
    id_cols: tuple = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Assign each test doc the argmax-likelihood class learned from
    ``train_df``.  Returns (id_cols..., assigned, log_score)."""
    ids = list(id_cols)

    train_terms = (
        train_df.filter(F.col(class_col).isNotNull())
        .select(*ids, F.col(class_col).alias("_cls"), _tokens(text_col).alias("_t"))
        .select(*ids, "_cls", F.explode("_t").alias("term"))
        .distinct()  # document counts: each (doc, term) once
    )
    # per (term, class): # docs of the class containing the term
    wc = train_terms.groupBy("term", "_cls").agg(F.count("*").alias("hits"))
    # class dimension: docFreq(class=c); scalars: docsWithClass, avg unique
    cls = train_terms.select(*ids, "_cls").distinct().groupBy("_cls").agg(
        F.count("*").alias("cdf")
    )
    scalars = train_terms.agg(
        F.count("*").alias("sum_doc_freq"),  # distinct (doc, term) pairs
        F.countDistinct(*ids).alias("doc_count"),
    ).crossJoin(
        train_df.filter(F.col(class_col).isNotNull())
        .select(*ids)
        .distinct()
        .agg(F.count("*").alias("docs_with_class"))
    )

    # zero-token docs still classify: their likelihood sum is 0, so the
    # score is the prior alone (assignClass iterates an empty token array)
    # — explode_outer keeps them as a NULL-term row contributing 0.
    test_tokens = test_df.select(
        *ids, F.explode_outer(_tokens(text_col)).alias("term")
    )
    # token occurrences x class dim (broadcast), hits looked up per class
    per_tok = (
        test_tokens.crossJoin(F.broadcast(cls))
        .join(F.broadcast(scalars))
        .join(wc, ["term", "_cls"], "left")
        .withColumn("hits", F.coalesce(F.col("hits"), F.lit(0)))
        .withColumn(
            "_den",
            (F.col("sum_doc_freq") / F.col("doc_count")) * F.col("cdf")
            + F.col("docs_with_class"),
        )
        .withColumn(
            "_ll",
            F.when(F.col("term").isNull(), F.lit(0.0)).otherwise(
                F.log((F.col("hits") + 1.0) / F.col("_den"))
            ),
        )
    )
    scored = per_tok.groupBy(*ids, "_cls").agg(
        (
            F.sum("_ll")
            + F.log(F.first("cdf"))
            - F.log(F.first("docs_with_class"))
        ).alias("log_score")
    )
    w = Window.partitionBy(*ids).orderBy(F.desc("log_score"), F.asc("_cls"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(*ids, F.col("_cls").alias("assigned"), "log_score")
    )


def knn_classify(
    searcher,
    doc_id: int,
    class_col: str = "role",
    k: int = 10,
    min_term_freq: int = 1,
    min_doc_freq: int = 1,
) -> DataFrame:
    """KNearestNeighborClassifier.java:40 — retrieve the k most-like-this
    docs for the source doc and take the score-weighted class vote
    (``classifyFromTopDocs``: sum of hit scores per class, max wins).
    The source doc itself is excluded from the vote.  Returns
    (assigned, vote) rows ordered by vote desc, class asc."""
    from lucene_spark.search.mlt import MoreLikeThis

    q = MoreLikeThis(
        searcher, min_term_freq=min_term_freq, min_doc_freq=min_doc_freq
    ).like(doc_id)
    top = searcher.search(q, k + 1).filter(F.col("doc_id") != doc_id).limit(k)
    docs = searcher.index.docs.select("doc_id", class_col)
    return (
        top.join(docs, "doc_id")
        .groupBy(class_col)
        .agg(F.sum("score").alias("vote"))
        .select(F.col(class_col).alias("assigned"), "vote")
        .orderBy(F.desc("vote"), F.asc("assigned"))
    )
