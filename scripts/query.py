"""spark-submit entrypoint: BM25 top-k search over a stored index.

    spark-submit --py-files lucene_spark.zip scripts/query.py \
        --index /path/to/index_checkpoint_dir/index \
        --query '+spark "big data"~1 -slow' [--k 10] [--prune] [--snapshot-id N | --tag NAME]

Query syntax: the classic-parser subset (lucene_spark.search.parser).
Prints one JSON line per hit: rank, conv_id, turn_idx, score.
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
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--prune", action="store_true", help="block-max pruned plan")
    ap.add_argument("--snapshot-id", type=int, default=None,
                    help="time-travel read of a retained commit generation")
    ap.add_argument("--tag", default=None,
                    help="time-travel read of a named snapshot ref")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("lucene_spark-query")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()

    from lucene_spark.index.store import load_index
    from lucene_spark.search import IndexSearcher, QueryParser

    idx = load_index(spark, args.index, snapshot_id=args.snapshot_id,
                     tag=args.tag)
    searcher = IndexSearcher(idx)
    q = QueryParser().parse(args.query)
    t0 = time.time()
    rows = searcher.search(q, args.k, prune=args.prune).collect()
    dt = time.time() - t0
    for r in rows:
        print(
            json.dumps(
                {
                    "rank": r.rank,
                    "conv_id": r.conv_id,
                    "turn_idx": r.turn_idx,
                    "score": float(r.score),
                }
            )
        )
    print(json.dumps({"k": args.k, "hits": len(rows), "latency_sec": round(dt, 4)}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
