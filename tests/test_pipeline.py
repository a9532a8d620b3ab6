"""Training-data pipeline operators vs exact DuckDB oracles.

Every operator's Spark plan and its ANSI-SQL formulation must agree row-
for-row (the md5-based portable hashing + integer quantization make this
exact, not approximate).
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
DOCS_REL = f"read_parquet('{SF}/documents.parquet')"
EMB_REL = f"read_parquet('{SF}/embeddings.parquet')"


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def assert_match(sdf, con, sql, ordered=False):
    a = [tuple(r) for r in sdf.collect()]
    b = [tuple(r) for r in con.execute(sql).fetchall()]
    if not ordered:
        a, b = sorted(a), sorted(b)
    assert a == b, f"spark={a[:3]}... duck={b[:3]}... ({len(a)} vs {len(b)} rows)"
    return len(a)


# -- textstats ----------------------------------------------------------
def test_token_counts(docs, con):
    from lucene_spark.pipeline import textstats as ts

    assert assert_match(ts.token_counts(docs), con, ts.token_counts_sql(DOCS_REL)) > 0


def test_quality_scores(docs, con):
    from lucene_spark.pipeline import textstats as ts

    assert_match(ts.quality_scores(docs), con, ts.quality_scores_sql(DOCS_REL))


def test_lang_id(docs, con):
    from lucene_spark.pipeline import textstats as ts

    assert_match(ts.lang_id(docs), con, ts.lang_id_sql(DOCS_REL))


def test_fingerprints(docs, con):
    from lucene_spark.pipeline import textstats as ts

    n = assert_match(ts.fingerprints(docs), con, ts.fingerprints_sql(DOCS_REL))
    assert n > 100


# -- dedup --------------------------------------------------------------
def _dup_corpus(docs):
    dup = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    return docs.unionByName(dup)


_DUP_REL = (
    f"(SELECT * FROM {DOCS_REL} UNION ALL "
    f"SELECT doc_id + 1000000, text, lang, source, n_chars FROM {DOCS_REL} "
    f"WHERE doc_id % 20 = 0)"
)


def test_exact_duplicates(docs, con):
    from lucene_spark.pipeline import dedup as dd

    n = assert_match(
        dd.exact_duplicates(_dup_corpus(docs)), con, dd.exact_duplicates_sql(_DUP_REL)
    )
    assert n > 0, "injected duplicates must be found"


def test_minhash_near_duplicates(docs, con):
    from lucene_spark.pipeline import dedup as dd

    n = assert_match(
        dd.near_duplicates_minhash(docs), con, dd.near_duplicates_minhash_sql(DOCS_REL)
    )
    assert n > 0, "the corpus contains planted near-duplicates"


def test_minhash_finds_high_jaccard_pairs(docs, con):
    """LSH recall sanity: every pair with TRUE Jaccard >= 0.9 must be found
    (16 hashes / 8 bands: P[miss at j=0.9] = (1-0.81)^8 ~ 2e-6)."""
    from lucene_spark.pipeline import dedup as dd

    truth = con.execute(
        f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM {DOCS_REL}),
s AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks)-1,1)),
       i -> array_to_string(list_slice(toks, i, i+2), ' ')))) AS sh FROM t),
sizes AS (SELECT doc_id, count(*) n FROM s GROUP BY 1),
i AS (SELECT a.doc_id da, b.doc_id db, count(*) i FROM s a JOIN s b ON a.sh=b.sh AND a.doc_id<b.doc_id GROUP BY 1,2)
SELECT da, db FROM i JOIN sizes za ON za.doc_id=da JOIN sizes zb ON zb.doc_id=db
WHERE i*1.0/(za.n+zb.n-i) >= 0.9"""
    ).fetchall()
    got = {
        (r.doc_a, r.doc_b) for r in dd.near_duplicates_minhash(docs).collect()
    }
    for pair in truth:
        assert tuple(pair) in got


def test_simhash_near_duplicates(docs, con):
    from lucene_spark.pipeline import dedup as dd

    assert_match(
        dd.near_duplicates_simhash(docs), con, dd.near_duplicates_simhash_sql(DOCS_REL)
    )


def test_ngram_jaccard_near_duplicates(docs, con):
    from lucene_spark.pipeline import dedup as dd

    n = assert_match(
        dd.near_duplicates_ngram(docs), con, dd.near_duplicates_ngram_sql(DOCS_REL)
    )
    assert n > 0, "the corpus contains planted near-duplicates"


def test_ngram_jaccard_is_exact(docs, con):
    """Prefix filtering must be LOSSLESS above the threshold: the output is
    exactly the brute-force all-pairs 3-gram Jaccard >= 0.5 set (per the
    AllPairs theorem — two sets with J >= t share a prefix shingle under any
    common total order), modulo the documented max_doc_freq boilerplate cap
    (disabled here by raising the cap beyond the corpus size)."""
    from lucene_spark.pipeline import dedup as dd

    truth = sorted(
        tuple(r)
        for r in con.execute(
            f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM {DOCS_REL}),
s AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks)-1,1)),
       i -> array_to_string(list_slice(toks, i, i+2), ' ')))) AS sh FROM t),
sizes AS (SELECT doc_id, count(*) n FROM s GROUP BY 1),
i AS (SELECT a.doc_id da, b.doc_id db, count(*) i FROM s a JOIN s b ON a.sh=b.sh AND a.doc_id<b.doc_id GROUP BY 1,2)
SELECT da, db, CAST(round(10000.0 * i / (za.n + zb.n - i)) AS BIGINT) AS j
FROM i JOIN sizes za ON za.doc_id=da JOIN sizes zb ON zb.doc_id=db
WHERE CAST(round(10000.0 * i / (za.n + zb.n - i)) AS BIGINT) >= 5000"""
        ).fetchall()
    )
    got = sorted(
        tuple(r)
        for r in dd.near_duplicates_ngram(docs, max_doc_freq=10**9).collect()
    )
    assert got == truth


# -- similarity ---------------------------------------------------------
@pytest.fixture(scope="module")
def qvec(con):
    return [float(x) for x in con.execute(f"SELECT embedding FROM {EMB_REL} WHERE vec_id = 0").fetchone()[0]]


def test_cosine_topk(emb, con, qvec):
    from lucene_spark.pipeline import similarity as sim

    assert_match(
        sim.cosine_topk(emb, qvec, 10), con, sim.cosine_topk_sql(EMB_REL, qvec, 10), ordered=True
    )


def test_lsh_topk(emb, con, qvec):
    from lucene_spark.pipeline import similarity as sim

    assert_match(
        sim.lsh_topk(emb, qvec, 10), con, sim.lsh_topk_sql(EMB_REL, qvec, 10), ordered=True
    )


def test_ann_topk_routes_to_ivf(emb, qvec):
    # the generic ANN entry point is the recall-1.0 IVF path
    from lucene_spark.pipeline import similarity as sim

    a = [tuple(r) for r in sim.ann_topk(emb, qvec, 10).collect()]
    b = [tuple(r) for r in sim.ivf_topk(emb, qvec, 10).collect()]
    assert a == b


def test_ivf_indexed_matches_unindexed(spark, emb, qvec, tmp_path_factory):
    """ivf_build + ivf_topk_indexed must be result-identical to the
    zero-setup ivf_topk (same centroids/assignment arithmetic), and the
    indexed scan must prune at the FileScan (PartitionFilters on cid)."""
    from lucene_spark.pipeline import similarity as sim

    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    sim.ivf_build(emb, path)
    a = [tuple(r) for r in sim.ivf_topk(emb, qvec, 10).collect()]
    b = [tuple(r) for r in sim.ivf_topk_indexed(spark, path, qvec, 10).collect()]
    assert a == b and len(a) == 10
    probed = spark.read.parquet(f"{path}/vectors").filter(F.col("cid").isin([0, 1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cid" in plan


def test_ivf_centroid_cap_guard(emb, qvec):
    from lucene_spark.pipeline import similarity as sim

    with pytest.raises(ValueError, match="n_centroids"):
        sim.ivf_topk(emb, qvec, 10, n_centroids=2000)


def test_assignment_matmul_parity(emb):
    """The Arrow-batched matmul assignment (the K > IVF_EXPR_MAX_K scale
    path) must agree cell-for-cell with the single-expression path, ties
    included (max cos_i, smallest cid)."""
    from lucene_spark.pipeline import similarity as sim

    cents = sim._centroids(emb, 16)
    a = sim.assign_centroids(emb, cents, strategy="expr")
    b = sim.assign_centroids(emb, cents, strategy="matmul")
    ra = sorted((int(r.vec_id), int(r.cid)) for r in a.select("vec_id", "cid").collect())
    rb = sorted((int(r.vec_id), int(r.cid)) for r in b.select("vec_id", "cid").collect())
    assert ra == rb


def test_assignment_autoswitch_plan(emb):
    """K above the threshold must route to mapInPandas (no K-branch
    greatest() chain in the plan); K below keeps the expr path."""
    from lucene_spark.pipeline import similarity as sim

    cents = sim._centroids(emb, 16)
    big = cents * 5  # 80 synthetic centroid entries > IVF_EXPR_MAX_K
    big = [(i, c[1], c[2]) for i, c in enumerate(big)]
    plan_big = sim.assign_centroids(emb, big)._jdf.queryExecution().toString()
    assert "MapInPandas" in plan_big or "mapInPandas" in plan_big
    plan_small = sim.assign_centroids(emb, cents)._jdf.queryExecution().toString()
    assert "MapInPandas" not in plan_small and "mapInPandas" not in plan_small


def test_batch_topk_equals_declarative(emb, qvec):
    from lucene_spark.pipeline import similarity as sim

    a = [(r.rank, r.vec_id, r.cos_i) for r in sim.cosine_topk(emb, qvec, 10).collect()]
    b = [
        (r.rank, r.vec_id, r.cos_i)
        for r in sim.cosine_topk_batch(emb, np.array([qvec]), 10).orderBy("rank").collect()
    ]
    assert a == b
    # multi-query batch: each query's self-match ranks first
    two = sim.cosine_topk_batch(
        emb, np.stack([qvec, np.roll(qvec, 1)]), 5
    ).collect()
    assert {r.query_idx for r in two} == {0, 1}


# -- multimodal ---------------------------------------------------------
def test_binary_plumbing(docs, con):
    from lucene_spark.pipeline import multimodal as mm

    media = mm.media_from_documents(docs)
    assert_match(
        mm.binary_stats(media),
        con,
        mm.binary_stats_sql(
            f"(SELECT doc_id AS media_id, encode(text) AS payload FROM {DOCS_REL})"
        ),
    )


def test_byte_features_shapes(docs):
    from lucene_spark.pipeline import multimodal as mm

    media = mm.media_from_documents(docs)
    rows = mm.byte_features(media).collect()
    assert len(rows) == docs.count()
    for r in rows[:10]:
        assert len(r.features) == mm.N_BYTE_FEATURES
        assert abs(sum(r.features) - 1.0) < 1e-9


def test_decode_stubs_raise():
    from lucene_spark.pipeline import multimodal as mm

    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\xff\xd8\xff")
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"RIFF")
    assert mm.sniff_mime(b"\x89PNG\r\n") == "image/png"
    assert mm.sniff_mime(b"plain") == "application/octet-stream"


def test_near_duplicates_embedding(spark, emb, con):
    """Planted exact copies must be found as cosine near-dups; DuckDB twin
    row-identical."""
    from lucene_spark.pipeline import similarity as sim

    dup = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 500000).alias("vec_id"), "embedding", "label"
    )
    view = emb.unionByName(dup)
    rel = (f"(SELECT vec_id, embedding, label FROM {EMB_REL} UNION ALL "
           f"SELECT vec_id + 500000, embedding, label FROM {EMB_REL} "
           "WHERE vec_id % 10 = 0)")
    got = sim.near_duplicates_embedding(view, threshold=0.95).collect()
    planted = {(int(r.vec_id), int(r.vec_id) + 500000)
               for r in emb.filter(F.col("vec_id") % 10 == 0).collect()}
    found = {(r.vec_a, r.vec_b) for r in got}
    assert planted <= found
    for r in got:
        if (r.vec_a, r.vec_b) in planted:
            assert r.cos_i == 1_000_000
    want = con.execute(sim.near_duplicates_embedding_sql(rel, 0.95)).fetchall()
    assert sorted((r.vec_a, r.vec_b, r.cos_i) for r in got) == sorted(want)


# -- curation: boilerplate removal + repetition signals ---------------------


def test_remove_boilerplate_lines(spark):
    from lucene_spark.pipeline.textstats import remove_boilerplate_lines

    footer = "subscribe now"
    rows = [
        (1, "unique one\nSubscribe Now\nbody a"),
        (2, "unique two\n subscribe now \nbody b"),
        (3, "unique three\nsubscribe now"),
        (4, "no footer here\n\nblank line kept"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_boilerplate_lines(df, min_doc_freq=3).collect()}
    # normalized footer appears in 3 docs -> removed everywhere, any casing
    assert out[1]["clean_text"] == "unique one\nbody a"
    assert out[2]["clean_text"] == "unique two\nbody b"
    assert out[3]["clean_text"] == "unique three"
    assert out[1]["n_removed"] == 1 and out[3]["n_removed"] == 1
    # blank lines survive; unique lines survive
    assert out[4]["clean_text"] == "no footer here\n\nblank line kept"
    assert out[4]["n_removed"] == 0
    assert footer not in out[1]["clean_text"].lower()


def test_repetition_scores(spark):
    from lucene_spark.pipeline.textstats import repetition_scores

    rows = [
        (1, "a b a b a b"),          # top 2gram 'a b' 3/5, 3gram 'a b a' 2/4
        (2, "x\nx\ny"),              # dup lines 1/3
        (3, "all unique words here"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_scores(df).collect()}
    assert out[1]["top_2gram_frac_i"] == round(10000 * 3 / 5)
    assert out[1]["top_3gram_frac_i"] == round(10000 * 2 / 4)
    assert out[2]["dup_line_frac_i"] == round(10000 * 1 / 3)
    assert out[3]["dup_line_frac_i"] == 0
    assert out[3]["top_2gram_frac_i"] == round(10000 * 1 / 3)
    assert out[4]["dup_line_frac_i"] == 0 and out[4]["top_2gram_frac_i"] == 0


def test_pii_redaction(docs, con):
    from lucene_spark.pipeline import textstats as ts

    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(" mail a@b.com or x.y@sub.example.org"),
            )
            .when(
                F.col("doc_id") % 3 == 1,
                F.lit(" call 555-123-4567, +44 2079460000, (212) 555-0101"),
            )
            .otherwise(F.lit(" ip 10.0.0.1 card 4111-1111-1111-1111")),
        ).alias("text"),
    )
    rel = (
        f"(SELECT doc_id, text || CASE doc_id % 3 "
        f"WHEN 0 THEN ' mail a@b.com or x.y@sub.example.org' "
        f"WHEN 1 THEN ' call 555-123-4567, +44 2079460000, (212) 555-0101' "
        f"ELSE ' ip 10.0.0.1 card 4111-1111-1111-1111' END AS text "
        f"FROM {DOCS_REL})"
    )
    n = assert_match(ts.redact_pii(planted), con, ts.redact_pii_sql(rel))
    assert n > 0
    # spot semantics: ordered application means the card never counts as
    # a phone number, and counts are per-category
    row = (
        ts.redact_pii(
            planted.sparkSession.createDataFrame(
                [(1, "a@b.com 4111-1111-1111-1111 10.0.0.1 555-123-4567")],
                "doc_id long, text string",
            )
        )
        .collect()[0]
    )
    assert (row.n_email, row.n_cc, row.n_ip, row.n_phone) == (1, 1, 1, 1)


def test_decontamination(docs, con):
    from lucene_spark.pipeline import textstats as ts

    train = docs.filter(F.col("doc_id") % 7 != 0)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    rel_t = f"(SELECT doc_id, text FROM {DOCS_REL} WHERE doc_id % 7 <> 0)"
    rel_b = f"(SELECT doc_id, text FROM {DOCS_REL} WHERE doc_id % 7 = 0)"
    n = assert_match(
        ts.decontaminate(train, bench), con, ts.decontaminate_sql(rel_t, rel_b)
    )
    assert n > 0


def test_decontamination_flags_planted_overlap(spark, con):
    from lucene_spark.pipeline import textstats as ts

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame(
        [
            (1, "prefix " + words + " suffix"),     # shares a full 8-gram
            (2, "completely unrelated text that is long enough to have grams"),
            (3, "short"),                            # < n tokens: never flagged
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, words)], "doc_id long, text string")
    got = {r.doc_id: (r.n_hits, r.contaminated)
           for r in ts.decontaminate(train, bench).collect()}
    assert got[1][1] == 1 and got[1][0] >= 1
    assert got[2] == (0, 0)
    assert got[3] == (0, 0)


# -- classification -----------------------------------------------------
def test_naive_bayes_formula(spark):
    """naive_bayes_classify reproduces SimpleNaiveBayesClassifier's exact
    statistics — verified against a brute-force python simulation of the
    reference formula on a tiny two-class corpus."""
    import math

    from lucene_spark.pipeline.classify import naive_bayes_classify

    train = [
        ("t1", 0, "en", "the model trains on data"),
        ("t2", 0, "en", "data and model and training"),
        ("t3", 0, "fr", "le modele et les donnees"),
        ("t4", 0, "fr", "les donnees du modele"),
    ]
    test = [("x1", 0, None, "model data training"), ("x2", 0, None, "les donnees")]
    schema = "conv_id string, turn_idx int, role string, text string"
    tr = spark.createDataFrame(train, schema)
    te = spark.createDataFrame(test, schema)
    got = {
        r.conv_id: (r.assigned, r.log_score)
        for r in naive_bayes_classify(tr, te).collect()
    }

    # brute force, following SimpleNaiveBayesClassifier.java exactly
    import re

    toks = {c: set(re.findall("[a-z0-9]+", t.lower())) for c, _, _, t in train}
    cls_of = {c: cl for c, _, cl, _ in train}
    classes = sorted(set(cls_of.values()))
    docs_with_class = len(train)
    sum_doc_freq = sum(len(s) for s in toks.values())
    avg_unique = sum_doc_freq / len(train)

    def brute(text):
        words = re.findall("[a-z0-9]+", text.lower())
        best = None
        for c in classes:
            cdf = sum(1 for d in toks if cls_of[d] == c)
            den = avg_unique * cdf + docs_with_class
            ll = sum(
                math.log(
                    (sum(1 for d in toks if cls_of[d] == c and w in toks[d]) + 1)
                    / den
                )
                for w in words
            )
            score = ll + math.log(cdf) - math.log(docs_with_class)
            if best is None or score > best[1]:
                best = (c, score)
        return best

    for cid, _, _, text in test:
        want_cls, want_score = brute(text)
        assert got[cid][0] == want_cls
        assert got[cid][1] == pytest.approx(want_score, rel=1e-9)


def test_knn_classifier_vote(spark, tiny_index):
    """knn_classify: MLT top-k neighbors, score-weighted vote equals the
    manual vote over the same hits (KNearestNeighborClassifier.java:40)."""
    from lucene_spark.pipeline.classify import knn_classify
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.mlt import MoreLikeThis

    searcher = IndexSearcher(tiny_index)
    doc = tiny_index.docs.first()
    out = knn_classify(searcher, doc.doc_id, class_col="role", k=5)
    rows = out.collect()
    assert rows, "no neighbors voted"
    q = MoreLikeThis(searcher, min_term_freq=1, min_doc_freq=1).like(doc.doc_id)
    hits = (
        searcher.search(q, 6)
        .filter(F.col("doc_id") != doc.doc_id)
        .limit(5)
        .join(tiny_index.docs.select("doc_id", "role"), "doc_id")
        .collect()
    )
    manual = {}
    for h in hits:
        manual[h.role] = manual.get(h.role, 0.0) + h.score
    best = max(sorted(manual), key=lambda c: manual[c])
    assert rows[0].assigned == best
    assert rows[0].vote == pytest.approx(manual[best], rel=1e-6)


# -- sampling -----------------------------------------------------------
def test_deterministic_sampling(spark, docs, con):
    """Hash-keyed sampling: partition-layout independent, monotone in the
    fraction, exact per-stratum caps; matches the DuckDB twin row-for-row."""
    from lucene_spark.pipeline.hashes import seeded_sql
    from lucene_spark.pipeline.sample import (
        cap_per_stratum,
        deterministic_sample,
        stratified_sample,
    )

    d = docs.select("doc_id", "lang", "text")
    a = {r.doc_id for r in deterministic_sample(d, 0.3, ["doc_id"], seed=7).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(
            d.repartition(13), 0.3, ["doc_id"], seed=7
        ).collect()
    }
    assert a == b and 0 < len(a) < d.count()
    small = {
        r.doc_id for r in deterministic_sample(d, 0.1, ["doc_id"], seed=7).collect()
    }
    assert small <= a  # monotone: raising the rate only adds rows

    key = seeded_sql("CAST(doc_id AS VARCHAR)", 7)
    dd = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM {DOCS_REL} WHERE ({key}) % 1000000000 < 300000000"
        ).fetchall()
    }
    assert a == dd

    frs = {"en": 0.15, "de": 1.0}
    s = stratified_sample(d, frs, "lang", ["doc_id"], seed=7)
    per = {r.lang: r.cnt for r in s.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    tot = {r.lang: r.cnt for r in d.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert per["de"] == tot["de"]           # fraction 1.0 keeps everything
    assert per["en"] < tot["en"] * 0.3      # ~0.15 actually downsamples
    for lang in tot:
        if lang not in frs:
            assert per.get(lang, 0) == tot[lang]  # default 1.0

    capped = cap_per_stratum(d, 5, "lang", ["doc_id"], seed=7)
    pc = {r.lang: r.cnt for r in capped.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert all(pc[lang] == min(5, tot[lang]) for lang in tot)
    # cap selection is deterministic across layouts too
    pc2 = {
        (r.lang, r.doc_id)
        for r in cap_per_stratum(d.repartition(17), 5, "lang", ["doc_id"], seed=7)
        .select("lang", "doc_id").collect()
    }
    assert pc2 == {(r.lang, r.doc_id) for r in capped.select("lang", "doc_id").collect()}


# -- sequence packing ---------------------------------------------------
def test_pack_sequences(spark):
    """Greedy first-fit packing: exact reset semantics incl. oversized rows
    and the utilization stats — vs a python reference scan."""
    from lucene_spark.pipeline.pack import pack_sequences, pack_stats

    rows = [
        ("c1", 0, 40), ("c1", 1, 50),   # bin 0 (90)
        ("c1", 2, 20),                  # bin 1 (20+..)
        ("c1", 3, 70),                  # bin 1 would be 90
        ("c1", 4, 130),                 # oversized -> bin 2 alone
        ("c1", 5, 10),                  # bin 3 (130+10 > cap)
        ("c2", 0, 100),                 # bin 0 exactly cap
        ("c2", 1, 1),                   # bin 1
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, n_tokens int")
    got = {
        (r.conv_id, r.turn_idx): r.bin
        for r in pack_sequences(df, cap=100).collect()
    }

    def ref(lens, cap):
        out, running, b = [], 0, 0
        for L in lens:
            if running > 0 and running + L > cap:
                b, running = b + 1, L
            else:
                running += L
            out.append(b)
        return out

    for cid in ("c1", "c2"):
        lens = [n for c, _, n in rows if c == cid]
        want = ref(lens, 100)
        for i, b in enumerate(want):
            assert got[(cid, i)] == b, (cid, i)

    stats = {
        (r.conv_id, r.bin): (r.n_turns, r.tokens)
        for r in pack_stats(df, cap=100).collect()
    }
    assert stats[("c1", 0)] == (2, 90)
    assert stats[("c1", 2)] == (1, 130)
    assert stats[("c2", 0)] == (1, 100)
    # every non-oversized bin respects the budget
    for (cid, b), (_, tokens) in stats.items():
        assert tokens <= 130


def test_unigram_lm_scores(docs, con):
    """Corpus-unigram cross-entropy (CCNet-style perplexity signal):
    Spark == DuckDB row-for-row, rarer vocabulary -> higher lm_i."""
    import math

    from lucene_spark.pipeline import textstats as ts

    n = assert_match(
        ts.unigram_lm_scores(docs), con, ts.unigram_lm_sql(DOCS_REL)
    )
    assert n > 0

    # brute-force pin on a handful of docs
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    toks = {d: __import__("re").findall("[a-z0-9]+", (t or "").lower()) for d, t in rows}
    cnt: dict = {}
    for ts_ in toks.values():
        for t in ts_:
            cnt[t] = cnt.get(t, 0) + 1
    tot = sum(cnt.values())
    got = {
        r.doc_id: (r.n_tok, r.lm_i)
        for r in ts.unigram_lm_scores(docs).collect()
    }
    import itertools

    for d, t in itertools.islice(((d, t) for d, t in toks.items() if t), 20):
        nll = sum(-math.log(cnt[x] / tot) for x in t) / len(t)
        assert got[d][0] == len(t)
        assert got[d][1] == round(nll * 10000)
    assert all(not t for d, t in toks.items() if d not in got)


def test_token_fingerprint_twin(spark, docs, con):
    """FingerprintFilter summary token: Spark == DuckDB row-for-row,
    empty token stream -> NULL on both."""
    from lucene_spark.pipeline import textstats as ts

    got = {
        r.doc_id: r.fp
        for r in ts.token_fingerprint(docs).collect()
    }
    want = dict(con.execute(ts.token_fingerprint_sql(DOCS_REL)).fetchall())
    assert got == want
    # dedup-key contract: token order and duplicates don't matter
    one = spark.createDataFrame(
        [(1, "b a b c a"), (2, "c a b"), (3, "?!")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fp for r in ts.token_fingerprint(one).collect()}
    assert fp[1] == "a b c" == fp[2]
    assert fp[3] is None
