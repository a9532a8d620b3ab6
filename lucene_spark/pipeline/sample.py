"""Deterministic, engine-portable sampling for corpus curation.

Training-data pipelines downsample over-represented strata (languages,
sources, domains) and need the selection to be REPRODUCIBLE — the same
document set on every run, every engine, every partition layout.  Spark's
``df.sample``/``sampleBy`` draw from per-partition RNG streams, so the
selection changes with partitioning; these operators instead hash the
document KEY (md5-based, ``pipeline.hashes``), which is stable by
construction and cross-checkable in any engine.

* :func:`deterministic_sample` — keep a fraction of rows by key hash.
* :func:`stratified_sample` — per-stratum fractions (dict), one pass,
  no join: the fraction lookup lowers to a CASE over the (tiny) strata
  map, the hash test is a pure column predicate — filter pushes to the
  scan, nothing shuffles.
* :func:`cap_per_stratum` — EXACT per-stratum row caps via a hash-ordered
  window rank (one shuffle on the stratum key).  Use when a hard budget
  matters more than an unbiased rate.

Scale note: the fraction operators are shuffle-free; at 100 TB they run
as a scan-side filter.  ``cap_per_stratum`` shuffles once on the stratum
column — salt first if one stratum holds most of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from lucene_spark.pipeline.hashes import seeded

# hash space partitioned by a fixed modulus: keep iff h % M < fraction * M
SPACE = 1_000_000_000


def _key(key_cols, seed: int) -> Column:
    return seeded(F.concat_ws("|", *[F.col(c) for c in key_cols]), seed)


def deterministic_sample(
    df: DataFrame, fraction: float, key_cols, seed: int = 0
) -> DataFrame:
    """Keep ~``fraction`` of rows, selected by key hash (reproducible
    regardless of partitioning; selection is a superset/subset across
    fractions, so raising the rate only ADDS documents)."""
    thr = int(fraction * SPACE)
    return df.filter((_key(key_cols, seed) % SPACE) < thr)


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    strata_col: str,
    key_cols,
    seed: int = 0,
    default: float = 1.0,
) -> DataFrame:
    """Per-stratum keep rates, e.g. ``{"en": 0.1, "de": 1.0}`` — the
    language-rebalancing sample.  Strata absent from the dict keep
    ``default``."""
    thr = F.lit(int(default * SPACE))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(int(frac * SPACE))
        ).otherwise(thr)
    return df.filter((_key(key_cols, seed) % SPACE) < thr)


def cap_per_stratum(
    df: DataFrame, cap: int, strata_col: str, key_cols, seed: int = 0
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum, chosen in key-hash order
    (deterministic, unbiased within the stratum)."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        (_key(key_cols, seed) % SPACE).asc(),
        *[F.col(c).asc() for c in key_cols],
    )
    return (
        df.withColumn("_sr", F.row_number().over(w))
        .filter(F.col("_sr") <= cap)
        .drop("_sr")
    )
