"""spark-submit entrypoint: checkpoint-resumable index build.

    spark-submit --py-files lucene_spark.zip scripts/build_index.py \
        --input  /path/to/transcripts_parquet_or_iceberg \
        --output /path/to/index_checkpoint_dir \
        [--shards 64] [--buckets 64] [--resume]

Reads a transcripts table (conv_id, turn_idx, role, text, tool, ts), builds
the packed inverted index under --output with per-shard lineage manifests,
and prints a JSON metrics summary.  Re-running with the same --output
resumes: completed shards are skipped (manifest-last commit markers).
"""

from __future__ import annotations

import os
import sys

# local-run bootstrap; under spark-submit --py-files the zip provides this
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--master", default=None, help="override master URL (local runs)")
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("lucene_spark-build")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()

    from lucene_spark.index.checkpoint import CheckpointedIndexBuilder

    t0 = time.time()
    transcripts = spark.read.parquet(args.input)
    ck = CheckpointedIndexBuilder(
        args.output,
        num_shards=args.shards,
        n_buckets=args.buckets,
        k1=args.k1,
        b=args.b,
    )
    idx = ck.build(transcripts)
    out = {
        "index": args.output,
        "wall_sec": round(time.time() - t0, 2),
        "stats": idx.stats,
        "completed_shards": len(ck.completed_shards()),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
