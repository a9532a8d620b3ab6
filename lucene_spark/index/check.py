"""Index consistency checker — the CheckIndex analog.

≙ core/index/CheckIndex.java:40 (``java org.apache.lucene.index.CheckIndex``):
open a stored index and verify every cross-family invariant, reporting a
structured result instead of trusting the reader path to fail loudly.
Checks, each a distributed aggregation (nothing corpus-sized collects):

1. **doc ids unique** and the docs relation row count equals
   ``stats.max_doc``;
2. **collection stats** (doc_count, sum_total_term_freq) re-derivable
   from the docs relation;
3. **term_stats == postings**: doc_freq / total_term_freq / max_freq /
   min_norm recomputed from the decoded postings must match the stored
   dictionary row for row (the BlockTree-vs-postings cross-check);
4. **postings doc ids ⊆ docs** (no dangling postings — liveDocs
   consistency);
5. **norms**: every posting's norm byte equals byte4(doc length) of its
   document (the computeNorm invariant);
6. **positions**: freq == len(positions) and positions strictly
   ascending per (term, doc) — the ExactPhraseMatcher precondition.

Returns {"clean": bool, "checks": {name: {"ok": bool, "detail": ...}}}.
Like the reference, the checker only READS — repair is a rebuild
(CheckIndex -exorcise is deliberately not reproduced; at 100 TB you
re-run the builder over the affected shard lineage instead).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F


def check_index(spark: SparkSession, path: str, snapshot_id: int | None = None) -> dict:
    from lucene_spark.index.store import load_index

    idx = load_index(spark, path, snapshot_id=snapshot_id)
    checks: dict = {}

    n_docs = idx.docs.count()
    n_ids = idx.docs.select("doc_id").distinct().count()
    checks["doc_ids_unique"] = {
        "ok": n_docs == n_ids == idx.stats["max_doc"],
        "detail": {"rows": n_docs, "distinct": n_ids, "max_doc": idx.stats["max_doc"]},
    }

    srow = idx.docs.agg(
        F.sum(F.when(F.col("length") > 0, 1).otherwise(0)).alias("dc"),
        F.sum("length").alias("sttf"),
    ).collect()[0]
    checks["collection_stats"] = {
        "ok": int(srow.dc or 0) == idx.stats["doc_count"]
        and int(srow.sttf or 0) == idx.stats["sum_total_term_freq"],
        "detail": {"derived": [int(srow.dc or 0), int(srow.sttf or 0)],
                   "stored": [idx.stats["doc_count"], idx.stats["sum_total_term_freq"]]},
    }

    derived = idx.postings.groupBy("term").agg(
        F.count("*").alias("d_df"),
        F.sum("freq").alias("d_ttf"),
        F.max("freq").alias("d_mf"),
        F.min("norm").alias("d_mn"),
    )
    bad_terms = (
        idx.term_stats.join(derived, "term", "full")
        .filter(
            F.col("doc_freq").isNull()
            | F.col("d_df").isNull()
            | (F.col("doc_freq") != F.col("d_df"))
            | (F.col("total_term_freq") != F.col("d_ttf"))
            | (F.col("max_freq") != F.col("d_mf"))
            | (F.col("min_norm") != F.col("d_mn"))
        )
        .count()
    )
    checks["term_stats_match_postings"] = {"ok": bad_terms == 0,
                                           "detail": {"bad_terms": bad_terms}}

    dangling = (
        idx.postings.select("doc_id")
        .distinct()
        .join(idx.docs.select("doc_id"), "doc_id", "left_anti")
        .count()
    )
    checks["no_dangling_postings"] = {"ok": dangling == 0,
                                      "detail": {"dangling_doc_ids": dangling}}

    # every posting's norm must equal its document's norm byte (and the
    # docs norm itself is byte4(length) — pinned by the doc_norms gate)
    bad_norms = (
        idx.postings.select("doc_id", F.col("norm").alias("p_norm"))
        .distinct()
        .join(idx.docs.select("doc_id", F.col("norm").alias("d_norm")), "doc_id")
        .filter(F.col("p_norm") != F.col("d_norm"))
        .count()
    )
    checks["norms_consistent"] = {"ok": bad_norms == 0,
                                  "detail": {"bad_rows": bad_norms}}

    pos_ok = idx.postings.select(
        (
            (F.size("positions") == F.col("freq"))
            & (
                F.size("positions")
                == F.size(F.array_distinct(F.array_sort("positions")))
            )
            & (F.col("positions") == F.array_sort("positions"))
        ).alias("ok")
    )
    bad_pos = pos_ok.filter(~F.col("ok")).count()
    checks["positions_sorted_match_freq"] = {"ok": bad_pos == 0,
                                             "detail": {"bad_rows": bad_pos}}

    return {"clean": all(c["ok"] for c in checks.values()), "checks": checks}
