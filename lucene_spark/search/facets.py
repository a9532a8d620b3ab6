"""Faceting over query matches (SURVEY.md §2.9).

≙ facet/src/java/org/apache/lucene/facet: FacetsCollector gathers matching
docs, then counts per dimension value / numeric range; DrillDownQuery adds
dimension filters; DrillSideways computes each dimension's counts as if its
own filter were removed.  All are hash aggregations / filtered aggregations
over the (matches x docs) join — one pass per request, GROUPING-SETS-style.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.search.query import Query


def _matches_with_docs(searcher, query: Query) -> DataFrame:
    m = searcher.scored(query).select("doc_id").distinct()
    return m.join(searcher.index.docs, "doc_id")


def facet_counts(searcher, query: Query, dim: str) -> DataFrame:
    """(value, n): match counts per dimension value (FacetsCollector +
    StringValueFacetCounts)."""
    return (
        _matches_with_docs(searcher, query)
        .groupBy(F.col(dim).alias("value"))
        .agg(F.count("*").alias("n"))
    )


def range_facet_counts(
    searcher, query: Query, col: str, boundaries: list
) -> DataFrame:
    """(bucket, n): counts per half-open numeric range
    [b0,b1), [b1,b2), ... (facet/range/LongRangeFacetCounts)."""
    c = F.col(col)
    bucket = F.lit(None).cast("int")
    for i in range(len(boundaries) - 1):
        lo, hi = boundaries[i], boundaries[i + 1]
        bucket = F.when((c >= lo) & (c < hi), F.lit(i)).otherwise(bucket)
    return (
        _matches_with_docs(searcher, query)
        .withColumn("bucket", bucket)
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def drill_down(searcher, query: Query, filters: dict) -> DataFrame:
    """DrillDownQuery: matches of ``query`` restricted to dimension values
    (dim -> value); returns the filtered (doc_id + doc columns) frame."""
    out = _matches_with_docs(searcher, query)
    for dim, value in filters.items():
        out = out.filter(F.col(dim) == value)
    return out


def drill_sideways(searcher, query: Query, filters: dict) -> dict[str, DataFrame]:
    """DrillSideways: for each drilled dimension, facet counts computed with
    every OTHER dimension's filter applied but its own removed — one
    filtered aggregation per dimension over a single matches frame."""
    base = _matches_with_docs(searcher, query)
    out = {}
    for dim in filters:
        sub = base
        for other, value in filters.items():
            if other != dim:
                sub = sub.filter(F.col(other) == value)
        out[dim] = sub.groupBy(F.col(dim).alias("value")).agg(
            F.count("*").alias("n")
        )
    return out


def sampled_facet_counts(
    searcher, query: Query, dim: str, sample_fraction: float, seed: int = 7,
    key_cols=("conv_id", "turn_idx"),
) -> DataFrame:
    """(value, n_est): facet counts over a ``sample_fraction`` subset of the
    matches, scaled back by 1/fraction (RandomSamplingFacetsCollector +
    amortized-correction analog).  One sampled aggregation — the 100 TB
    facet path when exact counts aren't needed.

    The subset is selected by deterministic document-key hash
    (pipeline.hashes, same scheme as pipeline.sample), NOT ``df.sample`` —
    Spark's Bernoulli sampler draws from per-partition RNG streams, so its
    selection changes with partition layout; the key hash makes the sampled
    counts reproducible across runs, cluster layouts, and engines (the
    reference's random sampler is seeded per-segment and has the same
    layout sensitivity; determinism-by-key is the distributed-correct
    reading of its repeatable-seed contract)."""
    from lucene_spark.pipeline.hashes import seeded
    from lucene_spark.pipeline.sample import SPACE

    thr = int(sample_fraction * SPACE)
    key = seeded(F.concat_ws("|", *[F.col(c) for c in key_cols]), seed)
    sampled = _matches_with_docs(searcher, query).filter((key % SPACE) < thr)
    return sampled.groupBy(F.col(dim).alias("value")).agg(
        F.round(F.count("*") / F.lit(sample_fraction)).cast("long").alias("n_est")
    )


def all_groups(searcher, query: Query, group_col: str = "conv_id") -> DataFrame:
    """(group,) — every distinct group with >=1 matching doc
    (grouping/AllGroupsCollector)."""
    return _matches_with_docs(searcher, query).select(
        F.col(group_col).alias("group")
    ).distinct()


def all_group_heads(
    searcher,
    query: Query,
    group_col: str = "conv_id",
    sort=None,
) -> DataFrame:
    """One row per group: that group's HEAD — its most competitive
    matching doc (grouping/AllGroupHeadsCollector.java:38: the collector
    keeps, per group, the doc winning the within-group sort; the result
    is the set of group-head docs).

    ``sort``: a ``Sort`` of SortField specs for the within-group order;
    None = relevance (score desc, doc_id asc — the collector's default
    Sort.RELEVANCE with the docID tie-break).  Returns
    (group, doc_id, conv_id, turn_idx, score).

    Plan shape: ONE group-key window (row_number over partitionBy group)
    — no global window, no second shuffle."""
    from pyspark.sql import Window

    scored = searcher.scored(query)
    docs = searcher.index.docs
    joined = scored.join(docs, "doc_id")
    if sort is None:
        order = [F.desc("score"), F.asc("doc_id")]
    else:
        # the searcher's sort lowering: 'score'/'doc' specials, per-field
        # direction, nulls-last (the SortField missing-value contract),
        # implicit doc tie-break (searcher._sort_specs)
        order = [
            (F.desc_nulls_last(c) if d else F.asc_nulls_last(c))
            for c, d, _ in searcher._sort_specs(sort)
        ]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(group_col).alias("group"),
            "doc_id",
            "conv_id",
            "turn_idx",
            "score",
        )
    )


def distinct_values(
    searcher, query: Query, group_col: str, value_col: str
) -> DataFrame:
    """(group, n_values) — count of distinct ``value_col`` values inside
    each group's matches (grouping/DistinctValuesCollector)."""
    return (
        _matches_with_docs(searcher, query)
        .groupBy(F.col(group_col).alias("group"))
        .agg(F.count_distinct(F.col(value_col)).alias("n_values"))
    )


def join_util(
    from_matches: DataFrame,
    to_docs: DataFrame,
    from_key: str,
    to_key: str,
    score_mode: str = "max",
) -> DataFrame:
    """join/JoinUtil.createJoinQuery analog: docs on the *to* side whose
    join key appears among the *from* side's matches; score = Max/Total/Avg
    of the from-side scores per key (ScoreMode).  ``from_matches`` is a
    (key..., score) frame (e.g. scored matches joined to their keys).  The
    key aggregation is a map-side-combining hash agg; the to-side join lets
    AQE pick broadcast when the key set is small."""
    agg = {
        "max": F.max("score"),
        "total": F.sum("score"),
        "avg": F.avg("score"),
        "none": F.lit(1.0),
    }[score_mode]
    keys = (
        from_matches.groupBy(F.col(from_key).alias("_jk"))
        .agg(agg.alias("score"))
    )
    return to_docs.join(
        keys, to_docs[to_key] == keys["_jk"]
    ).drop("_jk")


def taxonomy_counts(searcher, query: Query, dims: list[str]) -> DataFrame:
    """(level, path, n): hierarchical facet counts over the matches.

    ≙ facet/taxonomy: ``FacetField("dim", c1, c2)`` paths +
    ``TaxonomyFacetCounts`` rollup (FacetField.java, TaxonomyFacets
    getTopChildren/getAllDims) — here a dimension is an ordered list of doc
    columns (e.g. ``["tool", "role"]`` ⇒ paths ``tool`` and ``tool/role``),
    and every prefix level's counts come from ONE ``ROLLUP`` aggregation
    (single pass, map-side partial agg — the taxonomy tree is never
    materialized, which is the 100 TB-friendly restatement of Lucene's
    ordinal rollup).  Docs with a NULL path component are excluded, like
    FacetField's null-component rejection.
    """
    m = _matches_with_docs(searcher, query).na.drop(subset=list(dims))
    agg = m.rollup(*dims).agg(
        F.count("*").alias("n"), F.grouping_id().alias("gid")
    )
    level = (F.lit(len(dims)) - F.bit_count(F.col("gid"))).cast("int")
    # rolled-up components are NULL and concat_ws skips them -> the prefix
    return (
        agg.select(
            level.alias("level"),
            F.concat_ws("/", *[F.col(d) for d in dims]).alias("path"),
            "n",
        )
        .filter(F.col("level") >= 1)  # drop the grand-total row
    )


def taxonomy_top_children(
    searcher, query: Query, dims: list[str], prefix: tuple = (), top_n: int = 10
) -> DataFrame:
    """(child, n): the top-N immediate children under ``prefix``
    (TaxonomyFacets.getTopChildren).  Ties break lexicographically like the
    reference's ordinal order for equal counts."""
    if len(prefix) >= len(dims):
        raise ValueError("prefix must be shorter than dims")
    m = _matches_with_docs(searcher, query).na.drop(subset=list(dims))
    for d, v in zip(dims, prefix):
        m = m.filter(F.col(d) == v)
    child = dims[len(prefix)]
    return (
        m.groupBy(F.col(child).alias("child"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("child"))
        .limit(top_n)
    )


def to_child_block_join(
    parents: DataFrame, children: DataFrame, key: str = "conv_id"
) -> DataFrame:
    """join/.../ToChildBlockJoinQuery.java:40 — the inverse of the parent
    rollup: every CHILD doc of a matching parent emits, carrying the
    PARENT's score (ToChildBlockJoinScorer.score() returns the parent's
    score for each child it iterates).

    ``parents``: (key, <score cols>) matching-parent relation — usually
    k-bounded (a parent top-k), so it is broadcast and the child side
    never shuffles; at scale the child scan prunes on the key via the
    join predicate."""
    return children.join(F.broadcast(parents), key)


def facet_sum(searcher, query: Query, dim: str, value_expr: str) -> DataFrame:
    """(value, total): per-category SUM of a per-document expression over
    the match set — association / value-source facets
    (facet/taxonomy/TaxonomyFacetFloatAssociations.java aggregating
    FloatAssociationFacetField values, and TaxonomyFacetSumValueSource's
    DoubleValuesSource aggregation).  ``value_expr`` is any Catalyst SQL
    expression over the doc columns (the DoubleValuesSource binding);
    association values stored per doc are just doc columns here (columnar
    substrate — SURVEY.md §1.1), so both reference shapes collapse to one
    hash aggregation after the match join."""
    return (
        _matches_with_docs(searcher, query)
        .groupBy(F.col(dim).alias("value"))
        .agg(F.sum(F.expr(value_expr)).alias("total"))
    )


def dynamic_range_facets(
    searcher, query: Query, col: str, n_buckets: int
) -> DataFrame:
    """(bucket, n, lo, hi): split the match set's ``col`` values into
    ``n_buckets`` buckets of (near-)equal document count — dynamic range
    facets (facet/dynamic/DynamicRangeUtil.java computeDynamicRanges,
    which targets equal accumulated weight per range; with unit weights
    that is equal counts, here exact via ntile).  Deterministic: values
    tie-broken by (value, conv_id, turn_idx).  One shuffle: the global
    sort that ntile needs — at 100 TB swap in approx percentiles
    (approxQuantile) as cut points and keep the same output shape."""
    from pyspark.sql import Window

    m = _matches_with_docs(searcher, query).select(
        "conv_id", "turn_idx", F.col(col).alias("v")
    )
    w = Window.orderBy(F.asc("v"), F.asc("conv_id"), F.asc("turn_idx"))
    return (
        m.withColumn("bucket", (F.ntile(n_buckets).over(w) - 1).cast("int"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .orderBy("bucket")
    )


def group_facet_counts(
    searcher,
    query: Query,
    group_col: str,
    facet_col: str,
    prefix: str | None = None,
) -> DataFrame:
    """(value, n_groups): facet counts BY DISTINCT GROUP — each group
    contributes at most once per facet value, however many of its docs
    match (grouping/GroupFacetCollector.java:37 /
    TermGroupFacetCollector.java: per-segment (group ord, facet ord)
    pair dedup before counting).  ``prefix`` keeps only facet values
    with that prefix (the facetPrefix constructor arg).

    Plan: match join -> ONE hash agg of count_distinct(group) per facet
    value (Spark rewrites count_distinct as a two-level expand+agg, i.e.
    exactly the reference's pair-dedup-then-count, distributed); ordered
    count desc / value asc like the reference's merged top-N queue."""
    m = _matches_with_docs(searcher, query).select(
        F.col(facet_col).alias("value"), F.col(group_col).alias("_g")
    )
    if prefix is not None:
        m = m.filter(F.col("value").startswith(prefix))
    return (
        m.filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count_distinct("_g").cast("long").alias("n_groups"))
        .orderBy(F.desc("n_groups"), F.asc("value"))
    )


def parent_children(
    searcher, child_query: Query, parent_key, key: str = "conv_id"
) -> DataFrame:
    """(doc_id, <keys>, score): all child docs OF ONE SPECIFIC PARENT
    matching the child query, scored by the child query —
    join/ParentChildrenBlockJoinQuery.java:39 ("all the matching child
    documents for a specific parent document"; the child query determines
    both match and score).  Used to expand one hit of a ToParent join
    into its matching children.

    Plan: the child-query scored relation joins the parent's (tiny,
    broadcast) child-doc set — the block is one key partition, so no
    shuffle of the scored side."""
    block = searcher.index.docs.filter(F.col(key) == parent_key).select(
        "doc_id", key, "turn_idx"
    )
    scored = searcher.scored(child_query)
    return scored.join(F.broadcast(block), "doc_id").select(
        "doc_id", key, "turn_idx", "score"
    )


def range_facet_counts_ranges(
    searcher, query: Query, col: str, ranges: list
) -> DataFrame:
    """(label, n): counts per ARBITRARY (possibly overlapping) numeric
    range — the reference's actual LongRangeFacetCounts surface
    (facet/range/LongRange.java: each range is independent with its own
    min/max and inclusivity, and a doc counts in EVERY range containing
    it; the boundaries-based variant above is the common non-overlapping
    special case).  ``ranges`` = (label, lo, hi, min_incl, max_incl).

    One pass: a single aggregate of one conditional count per range —
    no explode, no per-range scan."""
    c = F.col(col)
    m = _matches_with_docs(searcher, query)
    aggs = []
    for label, lo, hi, min_incl, max_incl in ranges:
        pred = (c >= lo) if min_incl else (c > lo)
        pred = pred & ((c <= hi) if max_incl else (c < hi))
        aggs.append(
            F.count(F.when(pred, 1)).cast("long").alias(str(label))
        )
    wide = m.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(str(label)).alias("label"), F.col(str(label)).alias("n")
            )
            for label, *_ in ranges
        ]
    )
    return (
        wide.select(F.explode(pairs).alias("p"))
        .select("p.label", "p.n")
    )
