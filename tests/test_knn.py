"""KnnVectorQuery in the search tree (KnnFloatVectorQuery.java:45 +
TestKnnFloatVectorQuery semantics): k nearest passing the pre-filter,
score = (1 + cos) / 2, composable under BooleanQuery as any occur."""

import pytest
from pyspark.sql import functions as F

DIM = 8


def _vec(doc_id: int) -> list:
    # deterministic per-doc embedding, engine-portable arithmetic
    return [((doc_id * 31 + j * 17) % 101 - 50) / 50.0 for j in range(DIM)]


@pytest.fixture(scope="module")
def knn_searcher(spark, tiny_index):
    from lucene_spark.search import IndexSearcher

    ids = [int(r.doc_id) for r in tiny_index.docs.select("doc_id").collect()]
    vecs = spark.createDataFrame(
        [(d, _vec(d)) for d in ids], "doc_id long, embedding array<double>"
    )
    s = IndexSearcher(tiny_index, scoring="plain_f64").with_vectors(vecs)
    return s, vecs


QV = _vec(10_000)  # a query vector not equal to any doc vector


def _brute(vecs, qv, k, allowed=None):
    """Expected top-k via the already-certified pipeline brute-force."""
    from lucene_spark.pipeline.similarity import cosine_topk

    emb = vecs.select(F.col("doc_id").alias("vec_id"), "embedding")
    if allowed is not None:
        emb = emb.join(
            allowed.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
        )
    return [(int(r.vec_id), int(r.cos_i)) for r in cosine_topk(emb, qv, k).collect()]


def test_knn_unfiltered_matches_brute(knn_searcher):
    from lucene_spark.search import KnnVectorQuery

    s, vecs = knn_searcher
    got = s.search(KnnVectorQuery(QV, 5), 5).collect()
    exp = _brute(vecs, QV, 5)
    assert [int(r.doc_id) for r in got] == [d for d, _ in exp]
    # score = (1 + cos_i/Q)/2
    from lucene_spark.pipeline.similarity import QUANT

    for r, (_, cos_i) in zip(got, exp):
        assert r.score == pytest.approx((1.0 + cos_i / QUANT) / 2.0, abs=1e-12)


def test_knn_prefilter_restricts_before_topk(knn_searcher):
    from lucene_spark.search import KnnVectorQuery, TermQuery

    s, vecs = knn_searcher
    f = TermQuery("model")
    got = s.search(KnnVectorQuery(QV, 5, filter=f), 5).collect()
    allowed = s._matches(f)
    exp = _brute(vecs, QV, 5, allowed=allowed)
    assert [int(r.doc_id) for r in got] == [d for d, _ in exp]
    # every result doc passes the filter (k nearest AMONG passing docs)
    allowed_ids = {int(r.doc_id) for r in allowed.collect()}
    assert all(int(r.doc_id) in allowed_ids for r in got)


def test_knn_only_k_docs_match(knn_searcher):
    """Rewrite semantics: only the k nearest docs MATCH the query."""
    from lucene_spark.search import KnnVectorQuery

    s, vecs = knn_searcher
    q = KnnVectorQuery(QV, 3)
    assert s.count(q) == 3


def test_knn_as_must_constrains_and_sums(knn_searcher):
    from lucene_spark.search import (
        BooleanQuery, KnnVectorQuery, Occur, TermQuery,
    )

    s, vecs = knn_searcher
    knn = KnnVectorQuery(QV, 8)
    term = TermQuery("model")
    bq = BooleanQuery.of((term, Occur.MUST), (knn, Occur.MUST))
    got = {int(r.doc_id): float(r.score) for r in s.scored(bq).collect()}
    kset = {int(r.doc_id): float(r.score) for r in s.scored(knn).collect()}
    tset = {int(r.doc_id): float(r.score) for r in s.scored(term).collect()}
    exp_ids = set(kset) & set(tset)
    assert set(got) == exp_ids
    for d in exp_ids:
        assert got[d] == pytest.approx(kset[d] + tset[d], rel=1e-12)


def test_knn_as_must_not_excludes(knn_searcher):
    from lucene_spark.search import (
        BooleanQuery, KnnVectorQuery, Occur, TermQuery,
    )

    s, vecs = knn_searcher
    knn = KnnVectorQuery(QV, 8)
    bq = BooleanQuery.of(
        (TermQuery("model"), Occur.MUST), (knn, Occur.MUST_NOT)
    )
    got = {int(r.doc_id) for r in s.scored(bq).collect()}
    kset = {int(r.doc_id) for r in s.scored(knn).collect()}
    assert not (got & kset)


def test_knn_should_hybrid_sums(knn_searcher):
    from lucene_spark.search import (
        BooleanQuery, KnnVectorQuery, Occur, TermQuery,
    )

    s, vecs = knn_searcher
    knn = KnnVectorQuery(QV, 8)
    term = TermQuery("model")
    bq = BooleanQuery.of((term, Occur.SHOULD), (knn, Occur.SHOULD))
    got = {int(r.doc_id): float(r.score) for r in s.scored(bq).collect()}
    kset = {int(r.doc_id): float(r.score) for r in s.scored(knn).collect()}
    tset = {int(r.doc_id): float(r.score) for r in s.scored(term).collect()}
    assert set(got) == set(kset) | set(tset)
    for d, v in got.items():
        assert v == pytest.approx(kset.get(d, 0.0) + tset.get(d, 0.0), rel=1e-12)


def test_knn_ivf_backed(knn_searcher, tmp_path):
    """With an IVF index registered, the unfiltered knn reads only probed
    partitions and must equal ivf_topk on the same relation."""
    from lucene_spark.pipeline.similarity import ivf_build, ivf_topk
    from lucene_spark.search import IndexSearcher, KnnVectorQuery

    s, vecs = knn_searcher
    emb = vecs.select(F.col("doc_id").alias("vec_id"), "embedding")
    path = str(tmp_path / "ivf")
    ivf_build(
        emb.withColumn("doc_id", F.col("vec_id")), path, n_centroids=8,
        id_col="vec_id",
    )
    s2 = IndexSearcher(s.index, scoring="plain_f64").with_vectors(
        vecs, ivf_path=path
    )
    got = [int(r.doc_id) for r in s2.search(KnnVectorQuery(QV, 5), 5).collect()]
    exp = [
        int(r.vec_id)
        for r in ivf_topk(emb, QV, 5, n_centroids=8, nprobe=2).collect()
    ]
    assert got == exp

    # plan check: the vectors scan is partition-pruned
    s2._scored_knn(KnnVectorQuery(QV, 5))  # builds without error
