"""Executor-level scaling evidence: N vs 4N *separate-JVM* executors.

The single-JVM ``local[8]`` vs ``local[32]`` proxy conflates executor
scaling with SMP scaling — one JVM's GC/JIT/shuffle threads are shared, and
this sandbox's 32 vCPUs top out at ~20x one core even for perfectly
parallel hashing (SMT + host sharing).  A real cluster adds *executors*:
separate JVMs on separate (virtual) machines.

This harness simulates exactly that, inside the machine's verified-linear
core region: the corpus is pre-split into 4 equal conv_id-range shards (the
same sharding the checkpointed builder uses), and we compare

  N  executors: 1 JVM  (local[cores-per-exec]) building one shard
  4N executors: 4 JVMs (local[cores-per-exec] each) building all 4 shards
                CONCURRENTLY

throughput(4N) uses the wall time of the slowest JVM (a real job finishes
when its last executor does).  Session startup is excluded (clusters pay it
once, not per job).  Efficiency = (thr_4N / thr_N) / 4.

Usage:
  python scripts/scaling_executors.py [--turns-per-shard 125000]
      [--cores-per-exec 2] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS_DIR = os.environ.get("SPARK_GRAFT_CORPUS_DIR", "/tmp/lucene_spark_bench")


def prepare_shards(turns_per_shard: int, n_shards: int = 4,
                   min_words: int = 3, max_words: int = 40) -> list[str]:
    paths = [
        f"{CORPUS_DIR}/exec_shard_{turns_per_shard}_w{min_words}-{max_words}_{i}.parquet"
        for i in range(n_shards)
    ]
    if all(os.path.exists(p) for p in paths):
        return paths
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from lucene_spark.fixtures.synth import synth_transcripts

    for i, p in enumerate(paths):
        df = synth_transcripts(
            spark,
            turns_per_shard,
            seed=100 + i,  # different content per shard, same size/shape
            partitions=16,
            # driver-canonical corpus shape (bench.py's words_per_turn):
            # the scaling evidence measures the same workload the driver
            # benchmarks.  Longer documents (100-200 words) expose a
            # virtualized-host memory-fault ceiling under multi-JVM
            # concurrency that bare processes doing identical work do not
            # hit -- see BENCH.md "host ceiling" section.
            min_words=min_words,
            max_words=max_words,
        )
        df.write.mode("overwrite").parquet(p)
    spark.stop()
    return paths


WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
import os as _os
# container-faithful executor shape: the JVM sizes its GC/JIT/netty pools
# for its OWN core budget (a real executor sees its cgroup quota, not the
# host's 32 vCPUs), and shuffle/spill goes to tmpfs like a ramdisk-backed
# local dir -- without the cap, 4 concurrent JVMs each spawn 32-core-sized
# thread pools and the measurement collapses in kernel time.
_ld = "/dev/shm/spark_exec_" + str(_os.getpid())
spark = (SparkSession.builder.master("local[{cores}]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.local.dir", _ld)
         .config("spark.driver.extraJavaOptions",
                 "-XX:ActiveProcessorCount={cores}")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
corpus = spark.read.parquet({path!r})
from lucene_spark.index import IndexBuilder
t0 = time.time()
idx = IndexBuilder(num_segments=16).build(corpus)
n = idx.docs.count(); _ = idx.postings_slim.count(); _ = idx.term_stats.count()
print(json.dumps({{"build_sec": round(time.time() - t0, 3), "docs": n}}))
spark.stop()
import shutil; shutil.rmtree(_ld, ignore_errors=True)
"""


def run_jvms(paths: list[str], cores: int) -> tuple[float, int]:
    """Launch one JVM per shard concurrently; return (slowest build_sec,
    total docs)."""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER.format(repo=REPO, cores=cores, path=p)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for p in paths
    ]
    worst, docs = 0.0, 0
    for pr in procs:
        out, _ = pr.communicate()
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        worst = max(worst, r["build_sec"])
        docs += r["docs"]
    return worst, docs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns-per-shard", type=int, default=125_000)
    ap.add_argument("--cores-per-exec", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--words", default="3-40",
                    help="words-per-turn range LO-HI (default: the driver-"
                         "canonical bench shape; 100-200 reproduces the "
                         "long-document host-ceiling analysis)")
    args = ap.parse_args()

    lo, hi = (int(x) for x in args.words.split("-"))
    paths = prepare_shards(args.turns_per_shard, min_words=lo, max_words=hi)
    one, four = [], []
    for rep in range(args.repeats):
        t1, d1 = run_jvms(paths[:1], args.cores_per_exec)
        print(f"[rep {rep}] 1 executor: {t1:.1f}s ({d1/t1:.0f} turns/s)", flush=True)
        one.append((t1, d1))
        t4, d4 = run_jvms(paths, args.cores_per_exec)
        print(f"[rep {rep}] 4 executors: {t4:.1f}s ({d4/t4:.0f} turns/s)", flush=True)
        four.append((t4, d4))
    t1, d1 = min(one)
    t4, d4 = min(four)
    thr1, thr4 = d1 / t1, d4 / t4
    eff = (thr4 / thr1) / 4
    result = {
        "cores_per_exec": args.cores_per_exec,
        "turns_per_shard": args.turns_per_shard,
        "one_exec_sec": round(t1, 2),
        "one_exec_turns_per_sec": round(thr1, 1),
        "four_exec_sec": round(t4, 2),
        "four_exec_turns_per_sec": round(thr4, 1),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_executors.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
