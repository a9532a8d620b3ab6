"""Engine vs oracle: rank-identical top-k, float32-identical BM25 scores.

The oracle (lucene_spark.oracle) re-implements the reference's exact scoring
semantics; the reference query set covers head/mid/rare/absent terms, OR/AND/
NOT, ties, norms and k>hits (FIXTURES.md §2).  This mirrors the reference's
CheckHits cross-validation strategy (test-framework CheckHits.java:58).
"""

import numpy as np
import pytest

from lucene_spark.fixtures import reference_queries
from lucene_spark.search import (
    BooleanQuery,
    IndexSearcher,
    Occur,
    PhraseQuery,
    TermQuery,
)


def _engine_topk(searcher, query, k):
    rows = searcher.search(query, k).collect()
    return [(r.conv_id, r.turn_idx, np.float32(r.score)) for r in rows]


def _oracle_topk(oracle, kind, qtext, k):
    terms = [t for t in __import__("lucene_spark.analysis", fromlist=["tokenize_text"]).tokenize_text(qtext)]
    if kind == "term":
        hits = oracle.search_or(terms[:1], k)
    elif kind == "or":
        hits = oracle.search_or(terms, k)
    elif kind == "and":
        hits = oracle.search_and(terms, k)
    elif kind == "not":
        hits = oracle.search_not(terms[:1], terms[1:], k)
    elif kind == "phrase":
        hits = oracle.search_phrase(terms, k)
    else:
        raise ValueError(kind)
    return [(c, t, np.float32(s)) for c, t, s in oracle.topk_keys(hits)]


def _build_query(searcher, kind, qtext):
    terms = searcher.parse_terms(qtext.replace("-", " ").replace('"', " "))
    if kind == "term":
        return TermQuery(terms[0])
    if kind == "or":
        return BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in terms])
    if kind == "and":
        return BooleanQuery.of(*[(TermQuery(t), Occur.MUST) for t in terms])
    if kind == "not":
        return BooleanQuery.of(
            (TermQuery(terms[0]), Occur.MUST),
            *[(TermQuery(t), Occur.MUST_NOT) for t in terms[1:]],
        )
    if kind == "phrase":
        return PhraseQuery(tuple(terms))
    raise ValueError(kind)


@pytest.mark.parametrize("q", reference_queries(), ids=lambda q: q["query_id"])
def test_reference_query_set_parity(spark, tiny_index, tiny_oracle, q):
    searcher = IndexSearcher(tiny_index)
    kind, qtext, k = q["kind"], q["query"], q["k"]
    terms = searcher.parse_terms(qtext.replace("-", " ").replace('"', " "))
    if not terms:
        pytest.skip("query tokenizes to nothing")
    engine = _engine_topk(searcher, _build_query(searcher, kind, qtext), k)
    oracle = _oracle_topk(tiny_oracle, kind, qtext.replace("-", " ").replace('"', " "), k)
    assert [(c, t) for c, t, _ in engine] == [(c, t) for c, t, _ in oracle], (
        f"rank mismatch for {q['query_id']}: {engine} vs {oracle}"
    )
    es = np.array([s for _, _, s in engine], dtype=np.float32)
    os_ = np.array([s for _, _, s in oracle], dtype=np.float32)
    np.testing.assert_array_equal(es, os_, err_msg=f"scores differ for {q['query_id']}")


def test_global_stats_match(tiny_index, tiny_oracle):
    assert tiny_index.stats["doc_count"] == tiny_oracle.doc_count
    assert tiny_index.stats["sum_total_term_freq"] == tiny_oracle.sum_total_term_freq


def test_index_invariants(tiny_index):
    assert all(tiny_index.check().values())


def test_doc_ids_match_oracle_order(tiny_index, tiny_oracle):
    rows = tiny_index.docs.select("doc_id", "conv_id", "turn_idx").collect()
    got = {(r.conv_id, r.turn_idx): r.doc_id for r in rows}
    want = {(d.conv_id, d.turn_idx): d.doc_id for d in tiny_oracle.docs}
    assert got == want


def test_norms_match_oracle(tiny_index, tiny_oracle):
    rows = tiny_index.docs.select("doc_id", "norm", "length").collect()
    want = {d.doc_id: d.norm for d in tiny_oracle.docs}
    lens = {d.doc_id: len(d.tokens) for d in tiny_oracle.docs}
    for r in rows:
        assert r.norm == want[r.doc_id], f"norm mismatch doc {r.doc_id}"
        assert r.length == lens[r.doc_id]


def test_search_after_pagination(tiny_index):
    searcher = IndexSearcher(tiny_index)
    q = TermQuery("the")
    full = searcher.search(q, 20).collect()
    page1 = searcher.search(q, 10).collect()
    last = page1[-1]
    page2 = searcher.search(q, 10, search_after=(last.score, last.doc_id)).collect()
    got = [(r.conv_id, r.turn_idx) for r in page1 + page2]
    want = [(r.conv_id, r.turn_idx) for r in full]
    assert got == want


# -- ClassicSimilarity (TFIDF) ---------------------------------------------


def test_classic_similarity_parity(spark, tiny_index, tiny_oracle):
    """classic_f32 engine scores == the oracle's TFIDFScorer transliteration
    (rank + float32 score identity) for term and OR queries."""
    s = IndexSearcher(tiny_index, scoring="classic_f32")
    for terms in (["model"], ["the", "spark", "query"], ["data", "rareterm007"]):
        q = (
            TermQuery(terms[0])
            if len(terms) == 1
            else BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in terms])
        )
        engine = [(r.conv_id, r.turn_idx, np.float32(r.score)) for r in s.search(q, 10).collect()]
        want = [
            (c, t, np.float32(sc))
            for c, t, sc in tiny_oracle.topk_keys(tiny_oracle.search_or_classic(terms, 10))
        ]
        assert [(c, t) for c, t, _ in engine] == [(c, t) for c, t, _ in want], terms
        np.testing.assert_array_equal(
            np.array([x for _, _, x in engine], dtype=np.float32),
            np.array([x for _, _, x in want], dtype=np.float32),
        )


def test_classic_rank_differs_from_bm25_sometimes(spark, tiny_index):
    """Sanity: the two similarities are actually different functions."""
    b = IndexSearcher(tiny_index).search(TermQuery("the"), 30).collect()
    c = IndexSearcher(tiny_index, scoring="classic_f32").search(TermQuery("the"), 30).collect()
    assert [float(r.score) for r in b] != [float(r.score) for r in c]


def test_lm_dirichlet_parity(spark, tiny_index, tiny_oracle):
    """lm_dirichlet_f32 engine scores == the oracle's LMDirichletSimilarity
    transliteration (rank + float32 score identity)."""
    s = IndexSearcher(tiny_index, scoring="lm_dirichlet_f32")
    for terms in (["model"], ["the", "spark", "query"]):
        q = (
            TermQuery(terms[0])
            if len(terms) == 1
            else BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in terms])
        )
        engine = [(r.conv_id, r.turn_idx, np.float32(r.score)) for r in s.search(q, 10).collect()]
        want = [
            (c, t, np.float32(sc))
            for c, t, sc in tiny_oracle.topk_keys(tiny_oracle.search_or_lm(terms, 10))
        ]
        assert [(c, t) for c, t, _ in engine] == [(c, t) for c, t, _ in want], terms
        np.testing.assert_array_equal(
            np.array([x for _, _, x in engine], dtype=np.float32),
            np.array([x for _, _, x in want], dtype=np.float32),
        )


def test_lm_jm_parity(spark, tiny_index, tiny_oracle):
    """lm_jm_f32 == the oracle's LMJelinekMercerSimilarity transliteration
    (rank + float32 score identity)."""
    s = IndexSearcher(tiny_index, scoring="lm_jm_f32")
    for terms in (["model"], ["the", "spark", "query"]):
        q = (
            TermQuery(terms[0])
            if len(terms) == 1
            else BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in terms])
        )
        engine = [(r.conv_id, r.turn_idx, np.float32(r.score)) for r in s.search(q, 10).collect()]
        want = [
            (c, t, np.float32(sc))
            for c, t, sc in tiny_oracle.topk_keys(tiny_oracle.search_or_lm_jm(terms, 10))
        ]
        assert [(c, t) for c, t, _ in engine] == [(c, t) for c, t, _ in want], terms
        np.testing.assert_array_equal(
            np.array([x for _, _, x in engine], dtype=np.float32),
            np.array([x for _, _, x in want], dtype=np.float32),
        )


def test_dfr_parity(spark, tiny_index, tiny_oracle):
    """dfr_f32 (BasicModelG + AfterEffectL + NormalizationH2) == the oracle
    transliteration (rank + float32 score identity)."""
    s = IndexSearcher(tiny_index, scoring="dfr_f32")
    for terms in (["model"], ["the", "spark", "query"]):
        q = (
            TermQuery(terms[0])
            if len(terms) == 1
            else BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in terms])
        )
        engine = [(r.conv_id, r.turn_idx, np.float32(r.score)) for r in s.search(q, 10).collect()]
        want = [
            (c, t, np.float32(sc))
            for c, t, sc in tiny_oracle.topk_keys(tiny_oracle.search_or_dfr(terms, 10))
        ]
        assert [(c, t) for c, t, _ in engine] == [(c, t) for c, t, _ in want], terms
        np.testing.assert_array_equal(
            np.array([x for _, _, x in engine], dtype=np.float32),
            np.array([x for _, _, x in want], dtype=np.float32),
        )


def test_ib_parity(spark, tiny_index, tiny_oracle):
    """ib_f32 (DistributionLL + LambdaDF + NormalizationH2) == the oracle
    transliteration (rank + float32 score identity)."""
    s = IndexSearcher(tiny_index, scoring="ib_f32")
    for terms in (["model"], ["the", "spark", "query"]):
        q = (
            TermQuery(terms[0])
            if len(terms) == 1
            else BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in terms])
        )
        engine = [(r.conv_id, r.turn_idx, np.float32(r.score)) for r in s.search(q, 10).collect()]
        want = [
            (c, t, np.float32(sc))
            for c, t, sc in tiny_oracle.topk_keys(tiny_oracle.search_or_ib(terms, 10))
        ]
        assert [(c, t) for c, t, _ in engine] == [(c, t) for c, t, _ in want], terms
        np.testing.assert_array_equal(
            np.array([x for _, _, x in engine], dtype=np.float32),
            np.array([x for _, _, x in want], dtype=np.float32),
        )


def test_ax_parity(spark, tiny_index, tiny_oracle):
    """ax_f32 (AxiomaticF2EXP, s=0.25 k=0.35) == the oracle transliteration
    (rank + float32 score identity)."""
    s = IndexSearcher(tiny_index, scoring="ax_f32")
    for terms in (["model"], ["the", "spark", "query"]):
        q = (
            TermQuery(terms[0])
            if len(terms) == 1
            else BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in terms])
        )
        engine = [(r.conv_id, r.turn_idx, np.float32(r.score)) for r in s.search(q, 10).collect()]
        want = [
            (c, t, np.float32(sc))
            for c, t, sc in tiny_oracle.topk_keys(tiny_oracle.search_or_ax(terms, 10))
        ]
        assert [(c, t) for c, t, _ in engine] == [(c, t) for c, t, _ in want], terms
        np.testing.assert_array_equal(
            np.array([x for _, _, x in engine], dtype=np.float32),
            np.array([x for _, _, x in want], dtype=np.float32),
        )


def _simbase_parity(tiny_index, tiny_oracle, mode, oracle_fn):
    s = IndexSearcher(tiny_index, scoring=mode)
    for terms in (["model"], ["the", "spark", "query"]):
        q = (
            TermQuery(terms[0])
            if len(terms) == 1
            else BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in terms])
        )
        engine = [(r.conv_id, r.turn_idx, np.float32(r.score)) for r in s.search(q, 10).collect()]
        want = [
            (c, t, np.float32(sc))
            for c, t, sc in tiny_oracle.topk_keys(oracle_fn(terms, 10))
        ]
        assert [(c, t) for c, t, _ in engine] == [(c, t) for c, t, _ in want], (mode, terms)
        np.testing.assert_array_equal(
            np.array([x for _, _, x in engine], dtype=np.float32),
            np.array([x for _, _, x in want], dtype=np.float32),
        )


def test_ib_spl_parity(spark, tiny_index, tiny_oracle):
    """ib_spl_f32 (DistributionSPL + LambdaDF + NormalizationH2) == the
    oracle transliteration (rank + float32 score identity)."""
    _simbase_parity(tiny_index, tiny_oracle, "ib_spl_f32", tiny_oracle.search_or_ib_spl)


def test_dfi_parity(spark, tiny_index, tiny_oracle):
    """dfi_f32 (DFISimilarity + IndependenceStandardized) == the oracle
    transliteration, including the freq<=expected zero clamp."""
    _simbase_parity(tiny_index, tiny_oracle, "dfi_f32", tiny_oracle.search_or_dfi)


def test_bool_parity(spark, tiny_index, tiny_oracle):
    """bool_f32 (BooleanSimilarity: score = boost per match) == oracle."""
    _simbase_parity(tiny_index, tiny_oracle, "bool_f32", tiny_oracle.search_or_bool)


@pytest.mark.parametrize("variant", ["f1exp", "f1log", "f2log", "f3exp", "f3log"])
def test_ax_variant_parity(spark, tiny_index, tiny_oracle, variant):
    """Axiomatic F1/F2/F3 EXP/LOG variants == the oracle transliteration
    (AxiomaticF*.java component formulas, defaults s=0.25 k=0.35 queryLen=1)."""
    _simbase_parity(
        tiny_index,
        tiny_oracle,
        f"ax_{variant}_f32",
        lambda terms, k: tiny_oracle.search_or_ax_variant(terms, variant, k),
    )


def test_simbase_families_differ(spark, tiny_index):
    """Sanity: the SimilarityBase-adjacent families produce distinct
    score functions."""
    scores = {}
    for mode in (
        "lucene_f32", "lm_dirichlet_f32", "lm_jm_f32", "dfr_f32",
        "ib_f32", "ib_spl_f32", "ax_f32", "ax_f1exp_f32", "ax_f1log_f32",
        "ax_f2log_f32", "ax_f3exp_f32", "ax_f3log_f32", "dfi_f32", "bool_f32",
    ):
        s = IndexSearcher(tiny_index, scoring=mode)
        scores[mode] = [float(r.score) for r in s.search(TermQuery("the"), 20).collect()]
    vals = list(scores.values())
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            assert vals[i] != vals[j]


def test_sweetspot_brute_force(spark, tiny_index):
    """SweetSpotSimilarity: baselineTf branches + plateau lengthNorm vs a
    driver-side brute force over the collected postings (byte4-quantized
    dl, like every simbase family)."""
    import math

    from lucene_spark.util.smallfloat import LENGTH_TABLE
    from lucene_spark.search import BooleanQuery, IndexSearcher, Occur, TermQuery

    s = IndexSearcher(tiny_index, scoring="sweetspot_f64")
    terms = ["the", "model", "data"]
    q = BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in terms])
    got = {r.doc_id: r.score for r in s._scored(q).collect()}

    post = tiny_index.postings.select("term", "doc_id", "freq", "norm").collect()
    dfs = {}
    for r in post:
        if r.term in terms:
            dfs[r.term] = dfs.get(r.term, 0) + 1
    n = float(s.doc_count)
    want = {}
    for r in post:
        if r.term not in terms:
            continue
        idf2 = (math.log((n + 1.0) / (dfs[r.term] + 1.0)) + 1.0) ** 2
        f = float(r.freq)
        tf = 1.5 if f <= 2.0 else math.sqrt(f + 1.5 * 1.5 - 2.0)
        dl = float(LENGTH_TABLE[r.norm])
        ln = 1.0 / math.sqrt(
            0.5 * (abs(dl - 6.0) + abs(dl - 20.0) - 14.0) + 1.0
        )
        want[r.doc_id] = want.get(r.doc_id, 0.0) + idf2 * tf * ln
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-9), d
    # the plateau is flat: any doc with 6 <= dl <= 20 has lengthNorm 1
    inside = [r for r in post if r.term in terms and 6 <= LENGTH_TABLE[r.norm] <= 20]
    assert inside, "corpus should have plateau-length docs"


def test_sweetspot_parity(spark, tiny_index, tiny_oracle):
    """sweetspot_f32 == the oracle transliteration (rank + float32 score
    identity), completing the per-family f32 parity suite."""
    _simbase_parity(
        tiny_index, tiny_oracle, "sweetspot_f32", tiny_oracle.search_or_sweetspot
    )
