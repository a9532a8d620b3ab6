"""Deduplication for training corpora: exact, MinHash+LSH, SimHash.

All three are expressed as pure JVM column expressions + joins (no Python
in the hot path) with md5-based portable hashing (pipeline.hashes), so an
independent SQL engine reproduces the outputs bit-for-bit.

Scale design (the part that matters at 100 TB):

* exact: one hash-shuffle on a 60-bit text digest; canonical = min doc_id
  per group (one hash agg + broadcast-join back).
* MinHash+LSH: shingle -> H seeded min-hashes in ONE aggregation pass ->
  band keys (r rows/band) -> self-join per band bucket -> candidate pairs
  -> exact Jaccard verification via a shingle-set join.  Every stage is a
  key-partitioned shuffle; buckets are md5-distributed so no hot keys; the
  candidate join degree is bounded by bucket size, not corpus size.
* SimHash: 60-bit signature from 60 conditional sums in ONE hash agg over
  exploded tokens; banding on 4x15-bit sub-signatures for candidate
  generation; Hamming<=N verification with bit_count(xor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.pipeline.hashes import h60, h60_sql, seeded, seeded_sql
from lucene_spark.pipeline.textstats import TOKEN_RX, tokens

# ---------------------------------------------------------------------------
# exact dedup


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id, text_hash) for every doc in a duplicate group
    of size >= 2; canonical = smallest doc_id with identical normalized text
    (lowercased, whitespace-collapsed)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), "\\s+", " ")
    h = docs.select("doc_id", h60(norm).alias("text_hash"))
    groups = (
        h.groupBy("text_hash")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )
    # plain shuffle join on text_hash: `groups` is unbounded (one row per
    # duplicate group), so it must NOT be broadcast; AQE will still pick a
    # broadcast join at runtime when the group relation happens to be small.
    return (
        h.join(groups, "text_hash")
        .select("doc_id", "canonical_id", "text_hash")
    )


def exact_duplicates_sql(doc_rel: str) -> str:
    h = h60_sql("regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')")
    return f"""
WITH h AS (SELECT doc_id, {h} AS text_hash FROM {doc_rel}),
g AS (SELECT text_hash, min(doc_id) AS canonical_id, count(*) AS n
      FROM h GROUP BY 1 HAVING count(*) >= 2)
SELECT h.doc_id, g.canonical_id, h.text_hash FROM h JOIN g USING (text_hash)"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup

SHINGLE_K = 3  # word shingle width
NUM_HASHES = 16  # signature length
BAND_R = 2  # rows per band -> 8 bands
JACCARD_THRESHOLD = 0.5
# Cap on LSH bucket size: a boilerplate cluster of c near-identical docs
# would otherwise emit O(c^2) candidate pairs from one bucket.  Buckets
# larger than the cap are dropped from candidate generation — members of
# such degenerate clusters are overwhelmingly exact/near-exact boilerplate
# and are handled by exact_duplicates; cap bounds the worst-case join
# output per bucket at MAX_BUCKET^2 regardless of corpus size.
MAX_BUCKET = 1000


def _shingles_expr(text_col):
    toks = tokens(F.col(text_col))
    return F.when(
        F.size(toks) >= SHINGLE_K,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - F.lit(SHINGLE_K - 1)),
                lambda i: F.array_join(F.slice(toks, i, SHINGLE_K), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_sets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) distinct word-3-gram rows."""
    return docs.select(
        "doc_id", F.explode(_shingles_expr(text_col)).alias("shingle")
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, mh0..mh{H-1}): H seeded min-hashes in one aggregation pass
    over exploded shingles (docs with < SHINGLE_K tokens get no signature)."""
    sh = shingle_sets(docs, text_col)
    aggs = [
        F.min(seeded(F.col("shingle"), j)).alias(f"mh{j}") for j in range(NUM_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(sig: DataFrame, max_bucket: int = MAX_BUCKET) -> DataFrame:
    """(doc_a, doc_b) distinct pairs sharing >= 1 LSH band bucket.

    Buckets with more than ``max_bucket`` members are excluded (see
    MAX_BUCKET).  The size filter is a window count over the same bkey
    partitioning the self-join shuffles on, so it adds no extra shuffle.
    """
    from pyspark.sql import Window

    bands = []
    for b in range(NUM_HASHES // BAND_R):
        cols = [F.col(f"mh{b * BAND_R + r}") for r in range(BAND_R)]
        key = F.md5(F.concat_ws(",", F.lit(str(b)), *[c.cast("string") for c in cols]))
        bands.append(sig.select(F.col("doc_id"), key.alias("bkey")))
    u = bands[0]
    for df in bands[1:]:
        u = u.unionByName(df)
    u = u.withColumn("bn", F.count("*").over(Window.partitionBy("bkey"))).filter(
        F.col("bn") <= max_bucket
    ).drop("bn")
    a = u.alias("a")
    b_ = u.alias("b")
    return (
        a.join(b_, (F.col("a.bkey") == F.col("b.bkey")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _verify_jaccard(cands: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """EXACT shingle-Jaccard verification of candidate pairs: (doc_a, doc_b,
    jaccard_i) with jaccard_i = round(10000 * |A∩B| / |A∪B|) >= threshold.
    The intersection is a key-partitioned join on (doc, shingle) whose degree
    is bounded by the candidate count, never the corpus size."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        cands.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .withColumn(
            "jaccard_i",
            F.round(
                F.lit(10000.0)
                * F.col("i").cast("double")
                / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
            ).cast("long"),
        )
        .filter(F.col("jaccard_i") >= round(threshold * 10000))
        .select("doc_a", "doc_b", "jaccard_i")
    )


def near_duplicates_minhash(
    docs: DataFrame, text_col: str = "text", threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """(doc_a, doc_b, jaccard_i): LSH candidates verified by EXACT shingle
    Jaccard >= threshold; jaccard_i = round(10000 * j) for portable compare."""
    sh = shingle_sets(docs, text_col).persist()
    cands = lsh_candidate_pairs(minhash_signatures(docs, text_col))
    return _verify_jaccard(cands, sh, threshold)


def near_duplicates_minhash_sql(
    doc_rel: str, threshold: float = JACCARD_THRESHOLD
) -> str:
    mh = ",\n         ".join(
        f"min({seeded_sql('sh', j)}) AS mh{j}" for j in range(NUM_HASHES)
    )
    band_rows = []
    for b in range(NUM_HASHES // BAND_R):
        cols = " || ',' || ".join(
            f"CAST(mh{b * BAND_R + r} AS VARCHAR)" for r in range(BAND_R)
        )
        band_rows.append(f"SELECT doc_id, md5('{b}' || ',' || {cols}) AS bkey FROM sig")
    bands = "\nUNION ALL\n".join(band_rows)
    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RX}') AS toks FROM {doc_rel}
), sh0 AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - {SHINGLE_K - 2}, 1)),
           i -> array_to_string(list_slice(toks, i, i + {SHINGLE_K - 1}), ' ')))) AS sh
  FROM t
), sig AS (
  SELECT doc_id, {mh}
  FROM sh0 GROUP BY doc_id
), bands0 AS (
{bands}
), bands AS (
  SELECT doc_id, bkey FROM (
    SELECT doc_id, bkey, count(*) OVER (PARTITION BY bkey) AS bn FROM bands0)
  WHERE bn <= {MAX_BUCKET}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh0 GROUP BY 1
), inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN sh0 sa ON sa.doc_id = c.doc_a
  JOIN sh0 sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(round(10000.0 * i / (za.n + zb.n - i)) AS BIGINT) AS jaccard_i
FROM inter JOIN sizes za ON za.doc_id = doc_a JOIN sizes zb ON zb.doc_id = doc_b
WHERE CAST(round(10000.0 * i / (za.n + zb.n - i)) AS BIGINT) >= {round(threshold * 10000)}"""


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (prefix-filtered set-similarity self-join)


def near_duplicates_ngram(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
    max_doc_freq: int = MAX_BUCKET,
) -> DataFrame:
    """(doc_a, doc_b, jaccard_i): ALL pairs with exact word-3-gram Jaccard >=
    threshold — no hashing approximation anywhere (contrast
    :func:`near_duplicates_minhash`, which can miss pairs the LSH bands skip).

    Scale design — AllPairs/PPJoin prefix filtering (Bayardo et al., WWW'07;
    Xiao et al., WWW'08): order each doc's shingles by ascending corpus
    document-frequency (rarest first, ties by shingle text), and index only
    the first ``n - ceil(t*n) + 1`` of them.  Two sets with Jaccard >= t MUST
    share at least one prefix shingle under any common total order, so the
    candidate join touches only prefix rows — the join fan-out per shingle is
    its document frequency among prefixes, concentrated on the RAREST
    shingles by construction.  A ``min >= ceil(t * max)`` length filter
    prunes size-incompatible pairs before verification, and
    :func:`_verify_jaccard` computes the exact intersection on survivors.

    ``max_doc_freq`` drops shingles whose corpus frequency exceeds the cap
    from candidate generation (same rationale and default as MAX_BUCKET: a
    boilerplate shingle shared by c docs would emit O(c^2) candidates; docs
    whose whole prefix is such boilerplate are near-exact duplicates handled
    by :func:`exact_duplicates`).  Every stage is a key-partitioned shuffle
    (shingle freq agg, per-doc rank window, prefix self-join, verify join);
    nothing is collected or broadcast, so the plan is corpus-size-free.
    """
    from pyspark.sql import Window

    sh = shingle_sets(docs, text_col).persist()
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = sh.join(freq, "shingle").select(
        "doc_id",
        "shingle",
        "df",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy("df", "shingle"))
        .alias("r"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("n"),
    )
    prefix = ranked.filter(
        (F.col("r") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
        & (F.col("df") <= max_doc_freq)
    ).select("doc_id", "shingle", "n")
    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(
            F.least(F.col("a.n"), F.col("b.n"))
            >= F.ceil(F.lit(threshold) * F.greatest(F.col("a.n"), F.col("b.n")))
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return _verify_jaccard(cands, sh, threshold)


def near_duplicates_ngram_sql(
    doc_rel: str,
    threshold: float = JACCARD_THRESHOLD,
    max_doc_freq: int = MAX_BUCKET,
) -> str:
    """DuckDB twin of :func:`near_duplicates_ngram`: the identical prefix
    pipeline (not a brute-force all-pairs), so borderline rounding behaves
    the same in both engines."""
    t10k = round(threshold * 10000)
    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RX}') AS toks FROM {doc_rel}
), sh0 AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - {SHINGLE_K - 2}, 1)),
           i -> array_to_string(list_slice(toks, i, i + {SHINGLE_K - 1}), ' ')))) AS sh
  FROM t
), freq AS (
  SELECT sh, count(*) AS df FROM sh0 GROUP BY 1
), ranked AS (
  SELECT s.doc_id, s.sh, f.df,
         row_number() OVER (PARTITION BY s.doc_id ORDER BY f.df, s.sh) AS r,
         count(*) OVER (PARTITION BY s.doc_id) AS n
  FROM sh0 s JOIN freq f USING (sh)
), prefix AS (
  SELECT doc_id, sh, n FROM ranked
  WHERE r <= n - CAST(ceil({threshold} * n) AS BIGINT) + 1 AND df <= {max_doc_freq}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM prefix a JOIN prefix b ON a.sh = b.sh AND a.doc_id < b.doc_id
  WHERE least(a.n, b.n) >= CAST(ceil({threshold} * greatest(a.n, b.n)) AS BIGINT)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh0 GROUP BY 1
), inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN sh0 sa ON sa.doc_id = c.doc_a
  JOIN sh0 sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(round(10000.0 * i / (za.n + zb.n - i)) AS BIGINT) AS jaccard_i
FROM inter JOIN sizes za ON za.doc_id = doc_a JOIN sizes zb ON zb.doc_id = doc_b
WHERE CAST(round(10000.0 * i / (za.n + zb.n - i)) AS BIGINT) >= {t10k}"""


# ---------------------------------------------------------------------------
# SimHash near-dedup

SIMHASH_BITS = 60
SIMHASH_BANDS = 4  # 4 x 15-bit bands
HAMMING_MAX = 3


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 60-bit tf-weighted SimHash — one explode + one
    hash agg with 60 conditional sums (all JVM)."""
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("term")
    ).withColumn("h", h60(F.col("term")))
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{bit}")
        for bit in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(*sums)
    sim = None
    for bit in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{bit}") > 0, F.lit(1 << bit).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.alias("simhash"))


def near_duplicates_simhash(
    docs: DataFrame, text_col: str = "text", max_hamming: int = HAMMING_MAX,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """(doc_a, doc_b, hamming): pairs sharing a 15-bit band whose full
    signatures are within max_hamming bits.  Band buckets larger than
    ``max_bucket`` are excluded (see MAX_BUCKET)."""
    from pyspark.sql import Window

    sig = simhash_signatures(docs, text_col)
    bands = []
    for b in range(SIMHASH_BANDS):
        key = F.shiftright(F.col("simhash"), b * 15).bitwiseAND(F.lit((1 << 15) - 1))
        bands.append(
            sig.select("doc_id", "simhash", F.concat(F.lit(f"{b}:"), key.cast("string")).alias("bkey"))
        )
    u = bands[0]
    for df in bands[1:]:
        u = u.unionByName(df)
    u = u.withColumn("bn", F.count("*").over(Window.partitionBy("bkey"))).filter(
        F.col("bn") <= max_bucket
    ).drop("bn")
    a, b_ = u.alias("a"), u.alias("b")
    pairs = (
        a.join(b_, (F.col("a.bkey") == F.col("b.bkey")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def near_duplicates_simhash_sql(doc_rel: str, max_hamming: int = HAMMING_MAX) -> str:
    h = h60_sql("term")
    sums = ",\n         ".join(
        f"sum(CASE WHEN (h >> {bit}) & 1 = 1 THEN 1 ELSE -1 END) AS s{bit}"
        for bit in range(SIMHASH_BITS)
    )
    sim = " + ".join(
        f"CASE WHEN s{bit} > 0 THEN CAST({1 << bit} AS BIGINT) ELSE 0 END"
        for bit in range(SIMHASH_BITS)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, '{b}:' || CAST((simhash >> {b * 15}) & 32767 AS VARCHAR) AS bkey FROM sig"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, {h} AS h
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RX}')) AS term
        FROM {doc_rel})
), agg AS (
  SELECT doc_id, {sums}
  FROM tok GROUP BY doc_id
), sig AS (
  SELECT doc_id, {sim} AS simhash FROM agg
), bands0 AS (
{bands}
), bands AS (
  SELECT doc_id, simhash, bkey FROM (
    SELECT doc_id, simhash, bkey, count(*) OVER (PARTITION BY bkey) AS bn FROM bands0)
  WHERE bn <= {MAX_BUCKET}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""


# ---------------------------------------------------------------------------
# streaming exact dedup (stateful dropDuplicates)


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    watermark: tuple | None = None,
):
    """First-occurrence-wins exact dedup over a STREAM of documents.

    Structured Streaming's stateful ``dropDuplicates`` keyed on the same
    normalized 60-bit text digest as :func:`exact_duplicates` — the state
    store holds one key per unique document, so a continuously ingesting
    pipeline emits each distinct text exactly once across micro-batches.

    ``watermark=(ts_col, "10 minutes")`` switches to
    ``dropDuplicatesWithinWatermark``: duplicates are only suppressed within
    the watermark horizon and state is EVICTED past it — the bounded-state
    mode for unbounded streams (exact global dedup keeps O(#unique) state;
    at 100 TB that is a compacted RocksDB state store, or run the batch
    :func:`exact_duplicates` downstream for the global pass).
    """
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), "\\s+", " ")
    h = stream_df.withColumn("_text_hash", h60(norm))
    if watermark is not None:
        ts_col, delay = watermark
        return (
            h.withWatermark(ts_col, delay)
            .dropDuplicatesWithinWatermark(["_text_hash"])
            .drop("_text_hash")
        )
    return h.dropDuplicates(["_text_hash"]).drop("_text_hash")


def minhash_filter_fingerprints(
    docs_df,
    text_col: str = "text",
    id_cols: tuple = ("conv_id", "turn_idx"),
    shingle_size: int = 5,
    hash_count: int = 1,
    bucket_count: int = 512,
    hash_set_size: int = 1,
    with_rotation: bool | None = None,
):
    """(id_cols..., minhash: array<string>) — the reference MinHashFilter
    fingerprint per document (analysis/minhash/MinHashFilter.java via
    lucene_spark.analysis.minhash): standard tokenize → ``shingle_size``
    word shingles → murmur128 min-hash tokens (hex-unit strings).

    This is the exact Lucene/Solr fingerprint layout (vectors pinned in
    tests/test_minhash_filter.py against TestMinHashFilter.java); the
    LSH-banded dedup pipeline above uses its own cheaper signature — this
    operator exists for parity with indexes fingerprinted by the
    reference filter.  Scale shape: per-doc pure function in one Arrow
    mapInPandas pass, no shuffle."""
    import pandas as pd

    from lucene_spark.analysis.minhash import min_hash_tokens
    from lucene_spark.analysis.tokenizer import tokenize_text

    ids = list(id_cols)
    schema = ", ".join(
        [f"{c} {t}" for c, t in zip(
            ids,
            [dict(docs_df.dtypes)[c] for c in ids],
        )]
    ) + ", minhash array<string>"

    def part(batches):
        for pdf in batches:
            fps = []
            for t in pdf[text_col]:
                toks = tokenize_text(t)
                sh = [
                    " ".join(toks[i:i + shingle_size])
                    for i in range(len(toks) - shingle_size + 1)
                ]
                fps.append(
                    min_hash_tokens(
                        sh, hash_count, bucket_count, hash_set_size,
                        with_rotation,
                    )
                )
            out = pdf[ids].copy()
            out["minhash"] = pd.Series(fps, index=pdf.index, dtype=object)
            yield out

    return docs_df.select(*ids, text_col).mapInPandas(part, schema)
