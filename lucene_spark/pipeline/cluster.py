"""Duplicate-cluster resolution: connected components over candidate pairs.

Pair generators (``near_duplicates_minhash`` / ``_simhash`` /
``_embedding``) emit an *edge list*; a real dedup pipeline must resolve it
into clusters and pick one canonical document per cluster.  This module
closes that gap with the alternating **large-star / small-star** algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14),
the standard O(log n)-round formulation used at web scale:

* ``large_star``: every node connects its strictly-larger neighbors to the
  smallest node in its neighborhood (including itself).
* ``small_star``: with edges oriented (larger -> smaller), every node
  connects its smaller-or-equal neighbors (and itself) to that minimum.

Alternating the two converges to star graphs whose centers are the
component minima — in O(log n) rounds even on pathological long-path
graphs, unlike plain min-label propagation which needs O(diameter) rounds.

Scale design (100 TB posture):

* every round is two key-partitioned shuffles (a window-min over the
  grouping key + a distinct); no broadcast, no collect, no driver state
  beyond the O(1) convergence counters;
* each round's edge set is persisted and the previous round unpersisted,
  and lineage is truncated via ``localCheckpoint`` so the plan does not
  grow with the iteration count (on a real cluster use a reliable
  ``sparkContext.setCheckpointDir`` + ``checkpoint()`` instead);
* convergence is detected from two O(1) aggregates (edge count + a
  commutative xxhash64 checksum), not a full anti-join.

The DuckDB oracle twin is a recursive min-label closure (exact but
O(n * d) — fine at test scale, which is the point of the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v > u, where m = min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    return (
        sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient (larger -> smaller); connect all small neighbors + self to the
    minimum neighbor."""
    oriented = (
        edges.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        .distinct()
    )
    w = Window.partitionBy("u")
    withm = oriented.withColumn("m", F.min("v").over(w))
    out = withm.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        withm.select(F.col("u"), F.col("m").alias("v"))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def _signature(edges: DataFrame):
    """O(1) convergence fingerprint: (row count, commutative hash sum)."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor: commutative, order-independent, cannot overflow (vs sum,
        # which trips ANSI long-overflow on many hashed terms)
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def _driver_union_find(spark, rows):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    out = sorted((x, find(x)) for x in parent)
    return spark.createDataFrame(out, "node long, component long")


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component =
    the smallest node id in its connected component.

    Alternates large-star / small-star until the edge set reaches a fixed
    point (star graphs centered on component minima), bounded by
    ``max_iter`` rounds — the algorithm converges in O(log n) rounds, so
    25 covers any graph this side of 2^25 nodes-deep adversarial chains.

    Small-graph fast path: when the distinct edge count is at most
    ``driver_threshold`` (known from the convergence fingerprint that runs
    anyway), the edges collect to the driver and a union-find resolves them
    in O(E α) — iterative Spark rounds are all fixed job overhead at that
    size.  Dedup candidate-pair relations are usually a tiny fraction of
    the corpus, so in practice the distributed rounds only engage at the
    scale that actually needs them; pass ``driver_threshold=0`` to force
    the distributed path.
    """
    edges = (
        pairs.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    sig = _signature(edges)
    if sig[0] == 0:
        empty = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
        edges.unpersist()
        return empty
    if sig[0] <= driver_threshold:
        rows = [(r["u"], r["v"]) for r in edges.collect()]
        spark = pairs.sparkSession
        edges.unpersist()
        return _driver_union_find(spark, rows)

    for _ in range(max_iter):
        # localCheckpoint truncates lineage so the iterated plan stays flat;
        # on a multi-executor cluster swap for reliable checkpoint()
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        nsig = _signature(nxt)
        edges.unpersist()
        edges = nxt
        if nsig == sig:
            break
        sig = nsig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    # at the fixed point every edge is (node, component-min); nodes that ARE
    # a component minimum appear only on the right side — union them back.
    labels = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    return labels.union(roots).groupBy("node").agg(F.min("component").alias("component"))


def dedup_clusters(
    docs: DataFrame, text_col: str = "text", threshold: float | None = None
) -> DataFrame:
    """(doc_id, cluster_id, is_canonical) for every doc in a MinHash
    near-duplicate cluster of size >= 2; cluster_id = smallest doc_id in the
    cluster, canonical = that doc (keep it, drop the rest)."""
    from lucene_spark.pipeline.dedup import JACCARD_THRESHOLD, near_duplicates_minhash

    thr = JACCARD_THRESHOLD if threshold is None else threshold
    pairs = near_duplicates_minhash(docs, text_col=text_col, threshold=thr)
    cc = connected_components(pairs)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


def connected_components_sql(pairs_rel: str) -> str:
    """DuckDB recursive min-label closure over an edge relation with
    columns (doc_a, doc_b) — exact fixpoint twin of connected_components."""
    return f"""
WITH RECURSIVE e AS (
  SELECT doc_a AS u, doc_b AS v FROM {pairs_rel} WHERE doc_a <> doc_b
  UNION
  SELECT doc_b, doc_a FROM {pairs_rel} WHERE doc_a <> doc_b
), reach(u, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e)
  UNION
  SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.u
)
SELECT u AS node, min(r) AS component FROM reach GROUP BY u"""


def dedup_clusters_sql(doc_rel: str, threshold: float | None = None) -> str:
    from lucene_spark.pipeline.dedup import (
        JACCARD_THRESHOLD,
        near_duplicates_minhash_sql,
    )

    thr = JACCARD_THRESHOLD if threshold is None else threshold
    pairs = near_duplicates_minhash_sql(doc_rel, thr)
    return f"""
WITH RECURSIVE pairs AS ({pairs}
), e AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs WHERE doc_a <> doc_b
  UNION
  SELECT doc_b, doc_a FROM pairs WHERE doc_a <> doc_b
), reach(u, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e)
  UNION
  SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.u
)
SELECT u AS doc_id, min(r) AS cluster_id, u = min(r) AS is_canonical
FROM reach GROUP BY u"""
