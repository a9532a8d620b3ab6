"""Engine-portable deterministic hashing (md5 -> 60-bit int).

xxhash64/murmur are Spark-specific; md5 is universal.  Taking the first 15
hex digits (60 bits) keeps the value positive in a signed 64-bit int in any
engine.  ``H60_SQL`` is the ANSI/DuckDB equivalent used by oracle queries —
both sides are bit-identical, so dedup/LSH outputs can be cross-verified
row by row.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F


def h60(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative long (JVM expression)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """The same hash in DuckDB SQL."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def h60_py(s: str) -> int:
    """The same hash driver-side."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def seeded(col: Column, seed: int) -> Column:
    """Seeded variant: h60(seed || '|' || value)."""
    return h60(F.concat(F.lit(f"{seed}|"), col))


def seeded_sql(expr: str, seed: int) -> str:
    return h60_sql(f"'{seed}|' || {expr}")
