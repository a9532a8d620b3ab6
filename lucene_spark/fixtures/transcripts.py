"""Deterministic synthetic transcript corpus + reference query set.

Implements FIXTURES.md §1-§3: multi-turn transcripts
(conv_id, turn_idx, role, text, tool, ts) with Zipf conversation lengths and a
Zipf vocabulary (head terms + rare terms), repeated-term turns, empty and
1-token turns, >255-char token edge, mixed case, punctuation, digits.  The
text stays inside the tokenizer-parity subset (ASCII, no apostrophes in
generated words).  Fixed seed, no wall-clock — same corpus everywhere.

Mirrors the reference's randomized-corpus test strategy
(``test-framework/.../RandomIndexWriter.java``) with a fixed seed.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "python", "browser", "calculator"]

# vocabulary: a few head terms (Zipf s~1.1), a body, and rare terms
_HEAD = ["the", "and", "to", "of", "a", "in", "model", "data", "spark", "query"]
_BODY = [
    "index", "token", "merge", "segment", "score", "rank", "shuffle", "partition",
    "vector", "stream", "batch", "commit", "snapshot", "lineage", "executor",
    "driver", "postings", "norm", "field", "term", "document", "conversation",
    "agent", "tool", "result", "error", "retry", "timeout", "cache", "broadcast",
    "join", "filter", "aggregate", "window", "watermark", "checkpoint", "parquet",
    "iceberg", "arrow", "pandas", "numpy", "bitpack", "varint", "delta", "skip",
    "impact", "wand", "maxscore", "heap", "tie", "breaker",
]
_RARE = [f"rareterm{i:03d}" for i in range(60)]
_CASED = ["Spark", "QUERY", "Model", "DaTa", "INDEX"]  # lowercase-folding checks
_NUMS = ["42", "2024", "3.14", "1,000", "7"]


def _vocab_sampler(rng: random.Random):
    vocab = _HEAD + _BODY + _RARE + _CASED + _NUMS
    # Zipf-ish weights by rank
    weights = [1.0 / ((i + 1) ** 1.1) for i in range(len(vocab))]
    tot = sum(weights)
    weights = [w / tot for w in weights]

    def sample(n: int) -> list[str]:
        return rng.choices(vocab, weights=weights, k=n)

    return sample


def generate_transcripts(n_convs: int = 20, seed: int = 1337) -> list[dict]:
    """Deterministic corpus; n_convs=20 → ~300 turns (tiny), 1000 → ~15k."""
    rng = random.Random(seed)
    sample = _vocab_sampler(rng)
    rows: list[dict] = []
    punct = [".", ",", "!", "?", ";", ":", ""]
    for c in range(n_convs):
        # Zipf-distributed conversation length 3..40
        n_turns = min(40, max(3, int(3 / (rng.random() ** 0.7))))
        conv_id = f"conv{c:06d}"
        for t in range(n_turns):
            role = ROLES[(c + t) % 3] if rng.random() < 0.8 else rng.choice(ROLES)
            n_words = rng.choice([0, 1, 3, 5, 8, 12, 20, 30, 45])
            words = sample(n_words)
            # repeated terms within a turn (freq>1 cases)
            if n_words >= 5 and rng.random() < 0.4:
                w = rng.choice(words)
                words.extend([w] * rng.randint(1, 3))
            # occasional very long token (maxTokenLength edge)
            if rng.random() < 0.02:
                words.append("x" * 300)
            text = ""
            for i, w in enumerate(words):
                text += w
                text += rng.choice(punct) + " " if i < len(words) - 1 else rng.choice(punct)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": role,
                    "text": text,
                    "tool": rng.choice(TOOLS) if role == "tool" else None,
                    "ts": BASE_TS + timedelta(hours=c, seconds=t),
                }
            )
    return rows


def transcripts_df(spark, rows=None, n_convs: int = 20, seed: int = 1337):
    """Spark DataFrame with the authoritative input_hint schema."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("role", StringType()),
            StructField("text", StringType()),
            StructField("tool", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    rows = rows if rows is not None else generate_transcripts(n_convs, seed)
    data = [
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"])
        for r in rows
    ]
    return spark.createDataFrame(data, schema)


def reference_queries() -> list[dict]:
    """FIXTURES.md §2: the reference query set (head/mid/rare/absent terms,
    OR with ties, AND, NOT, phrase, k>hits)."""
    qs = [
        ("q001", "the", "term", 10),
        ("q002", "model", "term", 10),
        ("q003", "rareterm001", "term", 10),
        ("q004", "zzzabsent", "term", 10),
        ("q005", "spark query", "or", 10),
        ("q006", "index merge segment", "or", 100),
        ("q007", "data model", "and", 10),
        ("q008", "the rareterm002", "and", 10),
        ("q009", "spark -query", "not", 10),
        ("q010", '"data model"', "phrase", 10),
        ("q011", "rareterm050", "term", 100),
        ("q012", "token score rank", "or", 10),
        ("q013", "42", "term", 10),
        ("q014", "x" * 300, "term", 10),
    ]
    return [
        {"query_id": qid, "query": q, "kind": kind, "k": k} for qid, q, kind, k in qs
    ]
