"""spark-submit entrypoint: end-to-end training-data curation pipeline.

    spark-submit --py-files lucene_spark.zip scripts/curate.py \
        --input  /path/to/documents_parquet \
        --output /path/to/curated_parquet \
        [--minhash] [--cap-tokens 2048] [--sample-en 0.5] [--seed 0]

Composes the pipeline operators in the order a pretraining corpus run
uses them, printing one JSON line of per-stage counts:

1. exact dedup         (normalized-text digest, first occurrence wins)
2. near-dup removal    (MinHash+LSH candidates -> connected components ->
                        keep cluster canonicals; optional, --minhash)
3. boilerplate removal (corpus-level line frequency, C4 rule)
4. PII redaction       (typed placeholders)
5. quality filter      (length/alpha/repetition heuristics)
6. stratified sampling (deterministic md5-hash selection per language)
7. sequence packing    (greedy token budgets; emits bin column)

Every stage is a DataFrame -> DataFrame transform; nothing collects to
the driver, so the same script runs at any scale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--minhash", action="store_true", help="near-dup removal pass")
    ap.add_argument("--cap-tokens", type=int, default=2048)
    ap.add_argument("--sample-en", type=float, default=1.0,
                    help="keep rate for lang='en' (downsample the head)")
    ap.add_argument("--min-tokens", type=int, default=3)
    ap.add_argument("--substr-k", type=int, default=0,
                    help="exact-substring dedup window (0 = off); docs with "
                         "removals are rebuilt from normalized tokens")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    builder = SparkSession.builder.appName("lucene_spark-curate")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()

    from lucene_spark.pipeline.dedup import exact_duplicates
    from lucene_spark.pipeline.pack import pack_sequences, with_token_counts
    from lucene_spark.pipeline.sample import stratified_sample
    from lucene_spark.pipeline.textstats import (
        redact_pii,
        remove_boilerplate_lines,
    )

    t0 = time.time()
    stages = {}
    docs = spark.read.parquet(args.input)
    stages["input"] = docs.count()

    # 1. exact dedup: keep the minimum doc_id per normalized-text digest
    dups = exact_duplicates(docs)
    losers = dups.filter(F.col("doc_id") != F.col("canonical_id")).select("doc_id")
    docs = docs.join(losers, "doc_id", "left_anti")
    stages["after_exact_dedup"] = docs.count()

    # 2. optional near-dup removal (cluster canonical = smallest member)
    if args.minhash:
        from lucene_spark.pipeline.cluster import connected_components
        from lucene_spark.pipeline.dedup import near_duplicates_minhash

        pairs = near_duplicates_minhash(docs)
        comp = connected_components(pairs)
        near_losers = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        docs = docs.join(near_losers, "doc_id", "left_anti")
        stages["after_near_dedup"] = docs.count()

    # 3. boilerplate-line removal rewrites text
    cleaned = remove_boilerplate_lines(docs.select("doc_id", "text"))
    docs = docs.drop("text").join(
        cleaned.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
    )

    # 4. PII redaction rewrites text again
    red = redact_pii(docs.select("doc_id", "text"), with_text=True)
    docs = docs.drop("text").join(
        red.select("doc_id", F.col("redacted_text").alias("text")), "doc_id"
    )

    # 4b. optional exact-substring removal (Lee et al. ExactSubstr):
    # duplicated >= k-token spans dropped everywhere but each gram's
    # canonical holder — one copy survives the corpus
    if args.substr_k:
        from lucene_spark.pipeline.textstats import remove_duplicated_ngrams

        sub = remove_duplicated_ngrams(
            docs.select("doc_id", "text"), k=args.substr_k
        )
        docs = docs.drop("text").join(sub, "doc_id")
        stages["after_substring_dedup"] = docs.count()

    # 5. quality floor: enough tokens to train on
    docs = with_token_counts(docs)
    docs = docs.filter(F.col("n_tokens") >= args.min_tokens)
    stages["after_quality"] = docs.count()

    # 6. deterministic language rebalancing
    docs = stratified_sample(
        docs, {"en": args.sample_en}, "lang", ["doc_id"], seed=args.seed
    )
    stages["after_sampling"] = docs.count()

    # 7. greedy packing into token budgets (pack_group, pack_bin columns)
    grouped = docs.withColumn(
        "_grp", (F.col("doc_id") / 1000).cast("long").cast("string")
    ).withColumn("_seq", (F.col("doc_id") % 1000).cast("int"))
    packed = pack_sequences(
        grouped, cap=args.cap_tokens, key_col="_grp", order_col="_seq"
    )
    out = grouped.join(
        packed.select("_grp", "_seq", F.col("bin").alias("pack_bin")),
        ["_grp", "_seq"],
    ).withColumnRenamed("_grp", "pack_group").drop("_seq")
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    stages["output"] = written.count()
    stages["pack_bins"] = written.select("pack_group", "pack_bin").distinct().count()

    print(json.dumps({
        "output": args.output,
        "wall_sec": round(time.time() - t0, 2),
        "stages": stages,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
