"""Benchmark harness: index-build throughput + BM25 top-k query latency.

Run:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q_term_head": sec, ...}, "sf": 0.1,
   "index_build_sec": ..., "turns_per_sec": ..., "postings_per_sec": ..., ...}

Corpus: a deterministic synthetic transcript table generated distributed
(lucene_spark.fixtures.synth), sized 3,000,000 * sf turns, PLUS the driver's
sf-dir documents-derived transcripts for the cross-checked queries.  Use
SPARK_GRAFT_TURNS to override the synthetic corpus size.

For the two-parallelism scaling evidence (BASELINE.md: efficiency >= 0.8
from N to 4N), run scripts/scaling.py which invokes this twice
(local[8] vs local[32]) and writes BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    except ValueError:
        sf = 0.1  # corpus size only scales with the sf encoded in the dir name
    n_turns = int(os.environ.get("SPARK_GRAFT_TURNS", str(int(3_000_000 * sf))))
    # fixed partition count (not cpu-derived) so scaling runs at different
    # parallelism levels execute the IDENTICAL job over identical input
    n_parts = int(os.environ.get("SPARK_GRAFT_PARTS", str(cpus * 2)))
    min_w = int(os.environ.get("SPARK_GRAFT_MINW", "3"))
    max_w = int(os.environ.get("SPARK_GRAFT_MAXW", "40"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lucene_spark-bench")
        # shuffle width tied to the data layout, not the core count, so the
        # same job shape runs at every parallelism level (scaling fairness)
        .config("spark.sql.shuffle.partitions", str(n_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from lucene_spark.fixtures.synth import synth_transcripts
    from lucene_spark.index import IndexBuilder
    from lucene_spark.search import (
        BooleanQuery,
        IndexSearcher,
        Occur,
        PhraseQuery,
        TermQuery,
    )

    t0 = time.time()

    # ---- corpus: generated once, persisted to parquet, indexed FROM
    # storage (the 100 TB posture: the build reads a table, and the range
    # partitioner's sampling pass doesn't re-run the generator) ----
    corpus_dir = os.environ.get("SPARK_GRAFT_CORPUS_DIR", "/tmp/lucene_spark_bench")
    corpus_path = f"{corpus_dir}/corpus_{n_turns}_s42_p{n_parts}_w{min_w}-{max_w}.parquet"
    if not os.path.exists(corpus_path):
        synth_transcripts(
            spark, n_turns, seed=42, partitions=n_parts,
            min_words=min_w, max_words=max_w,
        ).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    # JVM warm-up: a small prefix build first so the measured build pays
    # neither classloading nor JIT cold-start (standard practice; the
    # 100 TB posture is a long-lived cluster, not a cold JVM)
    warm = IndexBuilder(num_segments=8).build(corpus.limit(max(1000, n_turns // 20)))
    warm.docs.count()
    for c in warm.cached:
        c.unpersist()

    # build min-of-N: the build is the single largest timed section and a
    # one-shot measurement on a shared host is dice (observed 43s..91s for
    # the identical job); report the min + spread like the query section
    build_reps = int(os.environ.get("SPARK_GRAFT_BUILD_REPS", "2"))
    # wall-clock budget: extra noise-reduction reps (build rep 2+, query
    # rep 2+) are shed once elapsed time passes this, so a bad host window
    # degrades precision instead of blowing the caller's timeout
    budget = float(os.environ.get("SPARK_GRAFT_BUDGET_SEC", "420"))
    build_times = []
    pos_times = []
    idx = None
    for rep in range(build_reps):
        if rep > 0 and time.time() - t0 > budget * 0.5:
            break
        if idx is not None:
            for c in idx.cached:
                c.unpersist()
        t_build0 = time.time()
        idx = IndexBuilder(num_segments=n_parts).build(corpus)
        # force full materialization of every index table
        n_docs = idx.docs.count()
        n_postings = (idx.postings_slim if idx.postings_slim is not None else idx.postings).count()
        n_terms = idx.term_stats.count()
        build_times.append(round(time.time() - t_build0, 3))
        # warm the positions relation (phrase path) as part of index prep —
        # reported separately so phrase latencies measure the query, not a
        # one-time cache build; timed per build rep (each rep's idx is
        # cold) so this is min-of-N like everything else, not one-shot dice
        t_pos0 = time.time()
        idx.postings_for_terms(["the"], with_positions=True).count()
        pos_times.append(round(time.time() - t_pos0, 3))
    t_build = min(build_times)
    t_pos = min(pos_times)

    searcher = IndexSearcher(idx)

    def or_q(*ts):
        return BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in ts])

    def and_q(*ts):
        return BooleanQuery.of(*[(TermQuery(t), Occur.MUST) for t in ts])

    bench_queries = {
        "q_term_head": TermQuery("the"),
        "q_term_mid": TermQuery("postings"),
        "q_term_rare": TermQuery("rareterm150"),
        "q_or3": or_q("spark", "query", "data"),
        "q_or5": or_q("index", "merge", "segment", "token", "score"),
        "q_and2": and_q("data", "model"),
        "q_not": BooleanQuery.of(
            (TermQuery("spark"), Occur.MUST), (TermQuery("the"), Occur.MUST_NOT)
        ),
        "q_phrase2": PhraseQuery(("the", "data")),
        "q_phrase_slop2": PhraseQuery(("the", "data"), slop=2),
    }
    # noise robustness: run each query N times, report the MIN (the
    # shared-host-noise-free estimate, same protocol as the scaling
    # scripts) plus the spread so round-over-round comparisons are not
    # single-run dice
    n_reps = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "3"))
    # untimed warm-up query: pays searcher init (term-cache collect, weight
    # broadcast, plan compilation) once, so the FIRST timed query measures
    # the query, not session warm-up
    searcher.search(TermQuery("data"), 10).collect()
    # reps are INTERLEAVED round-robin across queries (rep 1 of every
    # query, then rep 2, ...): a multi-second host stall is bursty in
    # time, so back-to-back reps of one query could all land inside it
    # and poison that query's min while its neighbors read clean —
    # interleaving spreads each query's reps across the wall clock.
    allreps: dict[str, list[float]] = {name: [] for name in bench_queries}
    topk_rows = 0
    for i in range(n_reps):
        if i > 0 and time.time() - t0 > budget:
            break
        for name, q in bench_queries.items():
            tq = time.time()
            rows = searcher.search(q, 10).collect()
            allreps[name].append(round(time.time() - tq, 4))
            if i == 0:
                topk_rows += len(rows)
    qtimes = {name: min(reps) for name, reps in allreps.items()}
    qspread = {name: [min(reps), max(reps)] for name, reps in allreps.items()}

    # round-5 wave-5 surface, timed OUTSIDE the headline set (the headline
    # sums bench_queries, so new sections must not shift it between
    # rounds): the term-automaton DP "the ANY data" — one disjunctive
    # gather + a single ArrowEvalPython
    from lucene_spark.search import TermAutomatonQuery

    _taq = TermAutomatonQuery()
    _s0 = _taq.create_state()
    _s1 = _taq.create_state()
    _taq.add_transition(_s0, _s1, "the")
    _s2 = _taq.create_state()
    _taq.add_any_transition(_s1, _s2)
    _s3 = _taq.create_state()
    _taq.set_accept(_s3, True)
    _taq.add_transition(_s2, _s3, "data")
    _taq.finish()
    taq_reps = []
    for _ in range(max(2, n_reps - 1)):
        tq = time.time()
        searcher.search(_taq, 10).collect()
        taq_reps.append(round(time.time() - tq, 4))
    t_term_automaton = min(taq_reps)

    # ---- ANN quality: recall@10 vs brute-force cosine on the sf-dir
    # embeddings (IVF = the headline sim_topk_ann path; LSH multi-probe
    # reported alongside for the honest comparison) ----
    ann = {}
    ext = {}
    emb_path = f"{sf_dir}/embeddings.parquet"
    if os.path.exists(emb_path):
        from lucene_spark.pipeline import similarity as sim

        emb = spark.read.parquet(emb_path).persist()
        emb.count()
        qvec = [
            float(x)
            for x in emb.filter("vec_id = 0").select("embedding").collect()[0][0]
        ]

        def _min_of(fn, n=n_reps):
            reps, res = [], None
            for i in range(n):
                if i > 0 and time.time() - t0 > budget * 1.2:
                    break
                tq = time.time()
                res = fn()
                reps.append(round(time.time() - tq, 4))
            return min(reps), res

        ann["t_brute"], brute = _min_of(
            lambda: {r.vec_id for r in sim.cosine_topk(emb, qvec, 10).collect()}
        )
        # IVF: one-time build (assignment persisted partitioned-by-cid) +
        # the pruned query — reported split so the amortized build cost
        # is visible and t_ivf measures the designed nprobe/K scan
        ivf_path = "/tmp/lucene_spark_bench/ivf_index"
        import shutil

        shutil.rmtree(ivf_path, ignore_errors=True)
        tq = time.time()
        sim.ivf_build(emb, ivf_path)
        ann["t_ivf_build"] = round(time.time() - tq, 4)
        ann["t_ivf"], ivf = _min_of(
            lambda: {
                r.vec_id
                for r in sim.ivf_topk_indexed(spark, ivf_path, qvec, 10).collect()
            }
        )
        ann["t_ivf_unindexed"], _ = _min_of(
            lambda: {r.vec_id for r in sim.ivf_topk(emb, qvec, 10).collect()}, n=1
        )
        ann["t_lsh"], lsh = _min_of(
            lambda: {r.vec_id for r in sim.lsh_topk(emb, qvec, 10).collect()}
        )
        ann["recall_ivf_at10"] = round(len(brute & ivf) / max(len(brute), 1), 2)
        ann["recall_lsh_at10"] = round(len(brute & lsh) / max(len(brute), 1), 2)

        # assignment-strategy A/B at K=1024 (the 100 TB sizing, K ~ sqrt(N)):
        # the matmul path's physical plan must stay FLAT as K grows (one
        # mapInPandas node; centroids ride inside the UDF), while the expr
        # path's plan grows with K (a K-branch greatest() tree) — that
        # growth is why assign_centroids switches strategy above
        # IVF_EXPR_MAX_K.  plan_chars_* records the explain-string size
        # (maxToStringFields raised so Spark's "... N more fields" plan
        # truncation can't hide the expr-tree growth).
        spark.conf.set("spark.sql.debug.maxToStringFields", "1000000")

        def _plan_chars(df) -> int:
            return len(df._jdf.queryExecution().explainString(
                df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ))

        for kc in (64, 1024):
            cents_k = sim._centroids(emb, kc)
            a = sim.assign_centroids(emb, cents_k, strategy="matmul")
            tq = time.time()
            a.select("cid").groupBy().max("cid").collect()
            ann[f"t_assign_matmul_k{kc}"] = round(time.time() - tq, 4)
            ann[f"plan_chars_matmul_k{kc}"] = _plan_chars(a)
            ann[f"plan_chars_expr_k{kc}"] = _plan_chars(
                sim.assign_centroids(emb, cents_k, strategy="expr")
            )
        spark.conf.unset("spark.sql.debug.maxToStringFields")

        # ---- round-5 query surface: KNN / filtered-KNN (indexed vs
        # brute A/B), BM25F, one suggester — reported OUTSIDE the headline
        # so `value` stays comparable round-over-round ----
        from pyspark.sql import functions as SF

        from lucene_spark.search import CombinedFieldQuery, KnnVectorQuery
        from lucene_spark.search.suggest import suggest_terms

        ext = {}
        vecs = emb.select(SF.col("vec_id").alias("doc_id"), "embedding")
        ivf_doc_path = "/tmp/lucene_spark_bench/ivf_doc_index"
        shutil.rmtree(ivf_doc_path, ignore_errors=True)
        tq = time.time()
        sim.ivf_build(
            emb.withColumn("doc_id", SF.col("vec_id")), ivf_doc_path,
            id_col="vec_id",
        )
        ext["t_knn_ivf_build"] = round(time.time() - tq, 4)
        s_knn = IndexSearcher(idx).with_vectors(vecs, ivf_path=ivf_doc_path)
        s_knn_brute = IndexSearcher(idx).with_vectors(vecs)
        knn_q = KnnVectorQuery(qvec, 10)
        knn_fq = KnnVectorQuery(qvec, 10, filter=TermQuery("data"))
        ext["q_knn"], _ = _min_of(
            lambda: s_knn.search(knn_q, 10).collect()
        )
        ext["q_knn_filtered"], filt_ivf = _min_of(
            lambda: {int(r.doc_id) for r in s_knn.search(knn_fq, 10).collect()}
        )
        ext["q_knn_filtered_brute"], filt_brute = _min_of(
            lambda: {
                int(r.doc_id) for r in s_knn_brute.search(knn_fq, 10).collect()
            }
        )
        ext["recall_knn_filtered_at10"] = round(
            len(filt_ivf & filt_brute) / max(len(filt_brute), 1), 2
        )
        cf_q = CombinedFieldQuery(("data", "search"))
        ext["q_combined_field"], _ = _min_of(
            lambda: searcher.search(cf_q, 10).collect()
        )
        ext["q_suggest_prefix"], _ = _min_of(
            lambda: suggest_terms(idx, "po", 10).collect()
        )

        # ---- round-5 wave-6 surface: payload span scoring ----
        from pyspark.sql import functions as _F

        from lucene_spark.index import IndexBuilder as _PayIB
        from lucene_spark.search.query import PayloadScoreQuery
        from lucene_spark.search.spans import SpanNearQuery, SpanTermQuery

        pay_text = _F.array_join(
            _F.expr(
                "transform(regexp_extract_all(lower(text), '[a-z0-9]+', 0),"
                " (t, i) -> concat(t, '|', i))"
            ),
            " ",
        )
        tp = time.time()
        pay_idx = _PayIB(
            num_segments=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
            payload_delimiter="|",
        ).build(corpus.withColumn("text", pay_text))
        ext["t_payload_build"] = round(time.time() - tp, 4)
        pay_s = IndexSearcher(pay_idx, scoring="plain_f64")
        near = SpanNearQuery(
            (SpanTermQuery("the"), SpanTermQuery("data")),
            slop=0,
            in_order=True,
        )
        ext["q_payload_span"], _ = _min_of(
            lambda: pay_s.search(PayloadScoreQuery(near, "avg"), 10).collect()
        )
        pay_idx.unpersist_all()

        # ---- round-5 wave-4 surface ----
        from lucene_spark.analysis import Analyzer
        from lucene_spark.search import CoveringQuery, FunctionRangeQuery
        from lucene_spark.search.geo import distance_topk
        from lucene_spark.search.suggest import (
            build_freetext_model,
            freetext_lookup,
        )

        cov_q = CoveringQuery(
            (TermQuery("data"), TermQuery("search"), TermQuery("the")),
            "1 + turn_idx % 2",
        )
        ext["q_covering"], _ = _min_of(lambda: searcher.search(cov_q, 10).collect())
        frq = FunctionRangeQuery("length", lower=20, upper=60)
        ext["q_function_range"], _ = _min_of(
            lambda: searcher.search(frq, 10).collect()
        )
        geo_docs = idx.docs.select(
            "doc_id",
            ((SF.col("doc_id") * 7919 % 16000) / 100.0 - 80.0).alias("lat"),
            ((SF.col("doc_id") * 104729 % 36000) / 100.0 - 180.0).alias("lon"),
        )
        ext["q_geo_distance"], _ = _min_of(
            lambda: distance_topk(
                geo_docs, "lat", "lon", 12.34, 56.78, 2_000_000.0, 10
            ).collect()
        )
        if time.time() - t0 < budget * 1.2:  # shed on a bad host window
            an_std = Analyzer()
            tq = time.time()
            ft_model = build_freetext_model(
                corpus.select("text"), an_std, grams=3
            ).persist()
            ft_model.count()
            ext["t_freetext_build"] = round(time.time() - tq, 4)
            ext["q_freetext"], _ = _min_of(
                lambda: freetext_lookup(ft_model, an_std, "the data s", 10).collect()
            )
            ft_model.unpersist()
        emb.unpersist()

    # ---- pipeline ops over the sf-dir documents table (reported outside
    # the headline value; single rep — these are batch jobs, not latency
    # paths, and the budget guard sheds them on a bad host window) ----
    pipeline = {}
    docs_path = f"{sf_dir}/documents.parquet"
    if os.path.exists(docs_path) and time.time() - t0 < budget * 1.3:
        from pyspark.sql import functions as SF

        from lucene_spark.pipeline import textstats as ts
        from lucene_spark.pipeline.cluster import connected_components
        from lucene_spark.pipeline.dedup import near_duplicates_minhash

        docs = spark.read.parquet(docs_path).persist()
        n_pipeline_docs = docs.count()
        tq = time.time()
        pairs = near_duplicates_minhash(docs).persist()
        n_pairs = pairs.count()
        pipeline["t_minhash_pairs"] = round(time.time() - tq, 3)
        tq = time.time()
        n_clustered = connected_components(pairs).count()
        pipeline["t_connected_components"] = round(time.time() - tq, 3)
        pairs.unpersist()
        tq = time.time()
        ts.remove_boilerplate_lines(
            docs.select("doc_id", SF.col("text"))
        ).agg(SF.sum("n_removed")).collect()
        pipeline["t_boilerplate"] = round(time.time() - tq, 3)
        tq = time.time()
        ts.repetition_scores(docs).agg(SF.sum("dup_line_frac_i")).collect()
        pipeline["t_repetition"] = round(time.time() - tq, 3)
        # round-4 curation ops (same docs relation, still single-rep)
        from lucene_spark.pipeline.classify import naive_bayes_classify
        from lucene_spark.pipeline.pack import pack_stats, with_token_counts
        from lucene_spark.pipeline.sessionize import session_stats

        tr4 = docs.select(
            SF.concat(SF.lit("c"), (SF.col("doc_id") / 10).cast("long").cast("string")).alias("conv_id"),
            (SF.col("doc_id") % 10).cast("int").alias("turn_idx"),
            SF.col("lang").alias("role"),
            SF.col("text"),
            SF.expr(
                "timestamp'2024-01-01' + make_interval(0,0,0,0, CAST(doc_id % 97 AS INT),0,0)"
            ).alias("ts"),
        ).persist()
        tr4.count()
        tq = time.time()
        session_stats(tr4, gap_seconds=3600).agg(SF.sum("n_turns")).collect()
        pipeline["t_sessionize"] = round(time.time() - tq, 3)
        tq = time.time()
        pack_stats(with_token_counts(tr4), cap=60).agg(SF.sum("tokens")).collect()
        pipeline["t_pack"] = round(time.time() - tq, 3)
        tq = time.time()
        naive_bayes_classify(tr4, tr4.filter(SF.col("turn_idx") == 0)).count()
        pipeline["t_nb_classify"] = round(time.time() - tq, 3)
        tr4.unpersist()
        pipeline["n_docs"] = n_pipeline_docs
        pipeline["n_dup_pairs"] = n_pairs
        pipeline["n_clustered_docs"] = n_clustered
        docs.unpersist()

    total = time.time() - t0
    # headline value = index build + the min-of-reps query latencies (the
    # comparable core work); positions warm-up + ANN section + corpus gen
    # wall time are reported in their own fields so new workload sections
    # don't shift the headline between rounds
    core = round(t_build + sum(qtimes.values()), 3)
    out = {
        "metric": "index_build_plus_topk_bm25",
        "value": core,
        "unit": "sec",
        "total_wall_sec": round(total, 3),
        "queries": qtimes,
        "query_spread": qspread,
        "query_reps": n_reps,
        "sf": sf,
        "cpus": cpus,
        "n_turns": n_turns,
        "index_build_sec": round(t_build, 3),
        "index_build_spread": build_times,
        "positions_build_sec": round(t_pos, 3),
        "q_term_automaton_sec": t_term_automaton,
        "turns_per_sec": round(n_docs / t_build, 1),
        "postings_per_sec": round(n_postings / t_build, 1),
        "n_docs": n_docs,
        "n_postings": n_postings,
        "n_terms": n_terms,
        "topk_rows": topk_rows,
        # corpus shape pin: BENCH.md and BENCH_rNN.json are comparable only
        # at identical turns x words/turn; these fields make that auditable
        "words_per_turn": [min_w, max_w],
        "ann": ann,
        "queries_ext": ext,
        "pipeline": pipeline,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
