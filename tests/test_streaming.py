"""Incremental indexing: micro-batch segments == batch-built index.

≙ the reference's NRT tests: index a corpus in flush increments, reopen,
and expect the same hits as a single-shot build (SearcherManager semantics).
"""

import os

import pytest
from pyspark.sql import functions as F

from lucene_spark.search import BooleanQuery, IndexSearcher, Occur, TermQuery
from lucene_spark.streaming import IncrementalIndexer


def _or(*terms):
    return BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in terms])


def _topk(searcher, q, k=10):
    return [(r.conv_id, r.turn_idx, r.score) for r in searcher.search(q, k).collect()]


@pytest.fixture(scope="module")
def inc(spark, tiny_corpus, tmp_path_factory):
    """Index the fixture corpus in 3 micro-batches, in turn order."""
    from lucene_spark.fixtures import transcripts_df

    df = transcripts_df(spark, rows=tiny_corpus).orderBy("conv_id", "turn_idx")
    convs = sorted({r["conv_id"] for r in tiny_corpus})
    cut1, cut2 = convs[len(convs) // 3], convs[2 * len(convs) // 3]
    ix = IncrementalIndexer(str(tmp_path_factory.mktemp("inc") / "idx"))
    ix.process_batch(df.filter(F.col("conv_id") < cut1), batch_id=0)
    ix.process_batch(
        df.filter((F.col("conv_id") >= cut1) & (F.col("conv_id") < cut2)), batch_id=1
    )
    ix.process_batch(df.filter(F.col("conv_id") >= cut2), batch_id=2)
    return ix


def test_incremental_equals_batch(spark, inc, tiny_index):
    got = IndexSearcher(inc.open_index(spark))
    want = IndexSearcher(tiny_index)
    for q in [TermQuery("model"), _or("the", "spark", "query"), _or("data", "rareterm007")]:
        assert _topk(got, q) == _topk(want, q)


def test_batch_replay_is_idempotent(spark, inc):
    n_before = len(inc._manifests())
    docs_before = inc.open_index(spark).stats["max_doc"]
    # Structured Streaming replays the last batch id after recovery
    from lucene_spark.fixtures import generate_transcripts, transcripts_df

    df = transcripts_df(spark, rows=generate_transcripts(n_convs=3, seed=9))
    inc.process_batch(df, batch_id=2)  # same id -> must be a no-op
    assert len(inc._manifests()) == n_before
    assert inc.open_index(spark).stats["max_doc"] == docs_before


def test_compact_forcemerge(spark, inc, tiny_index):
    merged = inc.compact(spark, n_buckets=4, chunk_bits=5)
    assert merged.prefer_packed
    got = IndexSearcher(merged)
    want = IndexSearcher(tiny_index)
    q = _or("the", "model", "data")
    assert _topk(got, q) == _topk(want, q)
    assert [r for r in got.search(q, 10, prune=True).collect()] == [
        r for r in got.search(q, 10).collect()
    ]


def test_streaming_wiring_availablenow(spark, tiny_corpus, tmp_path_factory):
    """Real readStream -> foreachBatch -> segment flush, one batch per file."""
    from lucene_spark.fixtures import transcripts_df

    root = tmp_path_factory.mktemp("stream")
    src = str(root / "in")
    df = transcripts_df(spark, rows=tiny_corpus)
    df.filter(F.col("turn_idx") % 2 == 0).coalesce(1).write.parquet(src + "/a")
    df.filter(F.col("turn_idx") % 2 == 1).coalesce(1).write.parquet(src + "/b")

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    ix = IncrementalIndexer(str(root / "idx"))
    q = ix.attach(stream, trigger_once=True)
    q.awaitTermination(120)
    idx = ix.open_index(spark)
    assert idx.stats["max_doc"] == df.count()
    s = IndexSearcher(idx)
    assert s.search(TermQuery("model"), 5).count() == 5


def test_tiered_merge_many_microbatches(spark, tiny_corpus, tmp_path_factory):
    """25 micro-batches with a tight tier budget compact to a handful of
    segments; results and stats are identical to the unmerged view, replay
    stays idempotent across merged batch_ids, and the reopen plan has ONE
    parquet scan node regardless of segment count."""
    from lucene_spark.fixtures import transcripts_df
    from lucene_spark.streaming.incremental import TieredMergePolicy

    df = transcripts_df(spark, rows=tiny_corpus).orderBy("conv_id", "turn_idx")
    convs = sorted({r["conv_id"] for r in tiny_corpus})
    n_batches = 25
    pol = TieredMergePolicy(segs_per_tier=3, max_merge_at_once=4, floor_docs=10)
    ix = IncrementalIndexer(
        str(tmp_path_factory.mktemp("tiered") / "idx"), merge_policy=pol
    )
    ref = IncrementalIndexer(str(tmp_path_factory.mktemp("ref") / "idx"))
    for b in range(n_batches):
        sel = [c for i, c in enumerate(convs) if i % n_batches == b]
        part = df.filter(F.col("conv_id").isin(sel))
        ix.process_batch(part, batch_id=b)
        ix.maybe_merge(spark)
        ref.process_batch(part, batch_id=b)

    live = ix._manifests()
    assert len(live) <= pol.allowed_seg_count([m["n_docs"] for m in live]) + 1
    assert len(live) < n_batches // 2
    assert len(ref._manifests()) == n_batches

    got = ix.open_index(spark)
    want = ref.open_index(spark)
    assert got.stats == want.stats
    gs, ws = IndexSearcher(got), IndexSearcher(want)
    for q in [TermQuery("model"), _or("the", "spark", "query")]:
        assert _topk(gs, q) == _topk(ws, q)

    # merged batch_ids keep replay idempotent
    n_before = len(ix._manifests())
    ix.process_batch(df.limit(5), batch_id=3)
    assert len(ix._manifests()) == n_before

    # flat plan: one parquet FileScan per family regardless of segment count
    plan = got.docs._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_allowed_seg_count_budget():
    from lucene_spark.streaming.incremental import TieredMergePolicy

    pol = TieredMergePolicy(segs_per_tier=10, max_merge_at_once=10, floor_docs=1000)
    # 100 floor-sized segments are way over budget
    assert pol.allowed_seg_count([1000] * 100) < 30
    # a few big segments are within budget
    assert pol.allowed_seg_count([1_000_000, 900_000, 800_000]) >= 3
    assert pol.select_merge([]) is None


def test_streaming_exact_dedup(spark, tmp_path_factory):
    """Stateful dropDuplicates: each distinct normalized text survives once
    across micro-batches (first occurrence wins), duplicates in later
    batches are suppressed by the state store."""
    from lucene_spark.pipeline.dedup import streaming_exact_dedup

    root = tmp_path_factory.mktemp("sdedup")
    src = str(root / "in")
    rows_a = [(1, "alpha beta"), (2, "Gamma  Delta"), (3, "unique one")]
    rows_b = [(4, "gamma delta"), (5, "ALPHA BETA"), (6, "unique two")]
    schema = "doc_id long, text string"
    spark.createDataFrame(rows_a, schema).coalesce(1).write.parquet(src + "/a")
    spark.createDataFrame(rows_b, schema).coalesce(1).write.parquet(src + "/b")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = streaming_exact_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sdedup_out")
        .option("checkpointLocation", str(root / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT doc_id, text FROM sdedup_out").collect()
    ids = sorted(r.doc_id for r in got)
    # 2 duplicate texts dropped; whitespace/case-normalized matching
    assert len(got) == 4
    assert 3 in ids and 6 in ids
    assert len({1, 5} & set(ids)) == 1  # exactly one of the alpha-beta pair
    assert len({2, 4} & set(ids)) == 1  # exactly one of the gamma-delta pair


def test_batch_sessionize(spark):
    """Gap sessionization: boundaries on first turn, gap > threshold, and
    backwards time; session_idx dense per conversation."""
    from datetime import datetime

    from lucene_spark.pipeline.sessionize import session_stats, sessionize

    def t(h, m=0):
        return datetime(2024, 1, 1, h, m)

    rows = [
        ("c1", 0, t(0)), ("c1", 1, t(0, 30)),     # session 0
        ("c1", 2, t(2)), ("c1", 3, t(2, 10)),     # session 1 (gap 90m)
        ("c1", 4, t(1)),                          # session 2 (backwards)
        ("c2", 0, t(5)),                          # session 0
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    got = {
        (r.conv_id, r.turn_idx): r.session_idx
        for r in sessionize(df, gap_seconds=3600).collect()
    }
    assert got == {
        ("c1", 0): 0, ("c1", 1): 0, ("c1", 2): 1,
        ("c1", 3): 1, ("c1", 4): 2, ("c2", 0): 0,
    }
    stats = {
        (r.conv_id, r.session_idx): (r.n_turns, r.start_epoch, r.end_epoch)
        for r in session_stats(df, gap_seconds=3600).collect()
    }
    assert stats[("c1", 1)][0] == 2
    assert stats[("c1", 2)] == (1, int(t(1).timestamp()), int(t(1).timestamp()))


def test_streaming_sessionize_matches_batch(spark, tmp_path_factory):
    """applyInPandasWithState sessionization: sessions closed by a later
    in-stream arrival match the batch operator's sessions; the still-open
    session per key is withheld (not yet emitted)."""
    from datetime import datetime

    from lucene_spark.pipeline.sessionize import session_stats, sessionize_stream

    root = tmp_path_factory.mktemp("ssess")
    src = str(root / "in")

    def t(h, m=0):
        return datetime(2024, 1, 1, h, m)

    rows_a = [("c1", 0, t(0)), ("c1", 1, t(0, 20)), ("c2", 0, t(0))]
    rows_b = [("c1", 2, t(3)), ("c2", 1, t(0, 40)), ("c3", 0, t(1))]
    rows_c = [("c1", 3, t(3, 5)), ("c2", 2, t(6))]
    schema = "conv_id string, turn_idx int, ts timestamp"
    for name, rows in [("a", rows_a), ("b", rows_b), ("c", rows_c)]:
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{src}/{name}")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = sessionize_stream(stream, gap_seconds=3600)
    q = (
        out.writeStream.format("memory")
        .queryName("ssess_out")
        .option("checkpointLocation", str(root / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.conv_id, r.session_start): (r.session_end, r.n_turns)
        for r in spark.sql("SELECT * FROM ssess_out").collect()
    }
    batch = spark.createDataFrame(rows_a + rows_b + rows_c, schema)
    full = {
        (r.conv_id, r.start_epoch): (r.end_epoch, r.n_turns)
        for r in session_stats(batch, gap_seconds=3600).collect()
    }
    # every emitted session must agree with the batch operator exactly
    for key, val in got.items():
        assert full[key] == val, key
    # closed in-stream: c1 session 0 (by the t(3) turn), c2 session 0 (by t(6))
    assert ("c1", int(t(0).timestamp())) in got
    assert ("c2", int(t(0).timestamp())) in got
    # c2's t(6) session horizon is past the final watermark -> still open,
    # withheld (c1/c3's open sessions MAY flush via the event-time timeout)
    assert ("c2", int(t(6).timestamp())) not in got


def test_incremental_commit_generations(spark, tmp_path_factory):
    """NRT + time travel: snapshot generations committed mid-ingest keep
    their exact corpus state; the latest pointer tracks new batches."""
    from lucene_spark.fixtures import generate_transcripts, transcripts_df
    from lucene_spark.index.store import load_index
    from lucene_spark.search import IndexSearcher, TermQuery
    from lucene_spark.streaming.incremental import IncrementalIndexer

    root = tmp_path_factory.mktemp("nrt_snap")
    inc = IncrementalIndexer(str(root / "inc"))
    rows = generate_transcripts(n_convs=12, seed=99)
    df = transcripts_df(spark, rows=rows)
    half = df.filter(F.col("conv_id") < "conv000006")
    rest = df.filter(F.col("conv_id") >= "conv000006")

    inc.process_batch(half, 0)
    table = str(root / "table")
    sid1 = inc.commit_generation(spark, table)
    n1 = load_index(spark, table, snapshot_id=sid1).docs.count()
    assert n1 == half.count()

    inc.process_batch(rest, 1)
    sid2 = inc.commit_generation(spark, table)
    assert (sid1, sid2) == (1, 2)

    old = load_index(spark, table, snapshot_id=sid1)
    latest = load_index(spark, table)
    assert old.docs.count() == n1
    assert latest.docs.count() == df.count()
    # the old generation scores with its own (smaller-corpus) statistics
    a = IndexSearcher(old).search(TermQuery("model"), 5).collect()
    assert all(r.conv_id < "conv000006" for r in a)


def test_streaming_windowed_counts(spark, tmp_path_factory):
    """Event-time tumbling windows with watermark: streaming (append mode,
    two micro-batches, a late-but-inside-watermark row) finalizes to the
    SAME rows as the batch operator over the union of the input."""
    from datetime import datetime

    from lucene_spark.streaming.windows import windowed_event_counts

    root = tmp_path_factory.mktemp("swin")
    src = str(root / "in")
    schema = "event_id long, ts timestamp, event_type string, value double"

    def t(h, m=0):
        return datetime(2024, 1, 1, h, m)

    batch1 = [
        (1, t(0, 10), "click", 1.0),
        (2, t(0, 50), "click", 2.0),
        (3, t(1, 5), "buy", 10.0),
        (4, t(9, 0), "click", 5.0),  # advances the watermark far ahead
    ]
    # batch 2: a LATE click for hour 1 (inside the 10h watermark) plus
    # more recent rows that push event time further
    batch2 = [
        (5, t(1, 20), "click", 4.0),
        (6, t(10, 0), "buy", 7.0),
        (7, t(23, 50), "click", 1.5),  # final row pushes watermark past all
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(src + "/a")
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(src + "/b")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = windowed_event_counts(
        stream, window="1 hour", watermark="10 hours"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("swin_out")
        .option("checkpointLocation", str(root / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r.win_start), r.key): (r.n, r.total)
        for r in spark.sql("SELECT * FROM swin_out").collect()
    }

    both = spark.createDataFrame(batch1 + batch2, schema)
    want_all = {
        (str(r.win_start), r.key): (r.n, r.total)
        for r in windowed_event_counts(both, window="1 hour").collect()
    }
    # every window whose end is <= final watermark (23:50 - 10h = 13:50)
    # must have finalized with the late row included
    finalized = {
        k: v for k, v in want_all.items() if k[0] <= "2024-01-01 12:"
    }
    for k, v in finalized.items():
        assert got.get(k) == v, (k, got.get(k), v)
    # the late (1:20, click) row landed in the hour-1 window
    assert got[("2024-01-01 01:00:00", "click")] == (1, 4.0)
    assert got[("2024-01-01 01:00:00", "buy")] == (1, 10.0)
