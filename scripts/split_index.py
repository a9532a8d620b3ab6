"""spark-submit entrypoint: split a stored index into parts.

    spark-submit --py-files lucene_spark.zip scripts/split_index.py \
        --index /path/to/index --out /path/p0 /path/p1 [...] \
        [--mode roundrobin|sequential] [--predicate "turn_idx < 2"]

≙ the misc index-splitter CLIs (misc/index/MultiPassIndexSplitter.java
main(), misc/index/PKIndexSplitter — lucene_spark.index.store.split_index
docstring for semantics).  --predicate produces exactly two parts
(matching, rest).  Prints one JSON line with per-part doc counts.
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
    ap.add_argument("--index", required=True)
    ap.add_argument("--out", nargs="+", required=True)
    ap.add_argument("--mode", default="roundrobin",
                    choices=["roundrobin", "sequential"])
    ap.add_argument("--predicate", default=None,
                    help="PKIndexSplitter mode: SQL over docs columns; "
                    "exactly 2 --out paths")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("lucene_spark-split")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from lucene_spark.index.store import load_index, split_index

    t0 = time.time()
    split_index(
        spark,
        args.index,
        list(args.out),
        mode=args.mode,
        predicate=args.predicate,
        n_buckets=args.buckets,
    )
    parts = {}
    for p in args.out:
        idx = load_index(spark, p)
        parts[p] = idx.docs.count()
    print(json.dumps({
        "split_sec": round(time.time() - t0, 2),
        "mode": "predicate" if args.predicate else args.mode,
        "parts": parts,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
