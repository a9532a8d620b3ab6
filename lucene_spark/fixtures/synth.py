"""Distributed deterministic transcript generator (bench-scale corpora).

Generates the FIXTURES.md transcripts shape entirely with JVM expressions
(spark.range + xxhash64-derived choices): no driver-side row lists, no
Python in the generation path, deterministic for a given (n_turns, seed).
Used by bench.py for index-build throughput and scaling runs — the corpus
size scales to millions of turns without touching the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# same vocabulary spirit as fixtures.transcripts: head + body + rare terms
_VOCAB = (
    ["the", "and", "to", "of", "a", "in", "model", "data", "spark", "query"]
    + [
        "index", "token", "merge", "segment", "score", "rank", "shuffle",
        "partition", "vector", "stream", "batch", "commit", "snapshot",
        "lineage", "executor", "driver", "postings", "norm", "field", "term",
        "document", "conversation", "agent", "tool", "result", "error",
        "retry", "timeout", "cache", "broadcast", "join", "filter",
        "aggregate", "window", "watermark", "checkpoint", "parquet",
        "iceberg", "arrow", "pandas", "numpy", "bitpack", "varint", "delta",
        "skip", "impact", "wand", "maxscore", "heap", "tie", "breaker",
    ]
    + [f"rareterm{i:03d}" for i in range(200)]
)

TURNS_PER_CONV = 20
ROLES = ["user", "assistant", "tool"]


def synth_transcripts(
    spark: SparkSession,
    n_turns: int,
    seed: int = 42,
    partitions: int | None = None,
    min_words: int = 3,
    max_words: int = 40,
) -> DataFrame:
    """DataFrame(conv_id, turn_idx, role, text, tool, ts) with Zipf-ish vocab.

    Word choice: idx = floor((u^2) * V) with u = uniform hash fraction —
    quadratic skew puts most mass on head terms (Zipf-like head/tail).
    ``min_words``/``max_words`` size the turns (agent transcripts run long —
    ~100+ tokens — which is also what makes indexing CPU-bound at scale).
    """
    v = len(_VOCAB)
    vocab_lit = F.array(*[F.lit(w) for w in _VOCAB])
    df = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)
    h = lambda *cols: F.xxhash64(F.lit(seed), *cols)  # noqa: E731
    n_words = (
        F.pmod(h(F.col("id")), F.lit(max_words - min_words + 1)) + F.lit(min_words)
    ).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab_lit,
            (
                F.floor(
                    F.pow(
                        F.pmod(F.xxhash64(F.lit(seed), F.col("id"), i), F.lit(100000))
                        / F.lit(100000.0),
                        F.lit(2.0),
                    )
                    * v
                )
                + F.lit(1)
            ).cast("int"),
        ),
    )
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]),
        (F.pmod(h(F.col("id"), F.lit(7)), F.lit(3)) + F.lit(1)).cast("int"),
    )
    return df.select(
        F.concat(
            F.lit("conv"),
            F.lpad((F.col("id") / TURNS_PER_CONV).cast("long").cast("string"), 9, "0"),
        ).alias("conv_id"),
        (F.col("id") % TURNS_PER_CONV).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.array_join(words, " ").alias("text"),
        F.when(role == "tool", F.lit("search")).alias("tool"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("id").cast("double"))
        ).alias("ts"),
    )
