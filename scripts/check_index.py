"""spark-submit entrypoint: index consistency check (CheckIndex analog).

    spark-submit --py-files lucene_spark.zip scripts/check_index.py \
        --index /path/to/store [--snapshot-id N]

Prints the structured report as one JSON line; exit code 1 when any
invariant fails (so operators can gate promotion on it).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--snapshot-id", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("lucene_spark-check")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()

    from lucene_spark.index.check import check_index

    rep = check_index(spark, args.index, snapshot_id=args.snapshot_id)
    print(json.dumps(rep))
    spark.stop()
    sys.exit(0 if rep["clean"] else 1)


if __name__ == "__main__":
    main()
