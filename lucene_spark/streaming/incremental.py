"""Incremental (near-real-time) indexing via Structured Streaming.

≙ the reference's NRT lifecycle (SURVEY.md §2.10): buffered docs are flushed
into immutable segments and a reopened reader sees the union of segments
(core/search/SearcherManager.java:52, flush §2.3).  Here:

* one micro-batch = one segment flush (``writeStream.foreachBatch``);
* docIDs are insertion-ordered — a segment's docs get dense local ids and a
  running global offset, exactly Lucene's docID semantics (late turns land
  in later segments with later docIDs, SURVEY.md §2.10 "Late data");
* each segment commit is manifest-last and keyed by the micro-batch id, so
  Structured Streaming's batch replay on recovery is exactly-once
  (a replayed batch sees its manifest and skips — ≙ IndexWriter's
  idempotent sequence numbers);
* ``open_index()`` = reader reopen: unions the committed segments at their
  offsets (point-in-time view);
* ``compact()`` = forceMerge(1) (IndexWriter.java:2098): merges all
  segments into one packed stored index via the (term, chunk) merge shuffle.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.index.builder import IndexBuilder, InvertedIndex
from lucene_spark.index.store import DEFAULT_BUCKETS, load_index, save_index


class IncrementalIndexer:
    """Maintains a segmented index directory fed by micro-batches."""

    def __init__(
        self,
        index_dir: str,
        k1: float = 1.2,
        b: float = 0.75,
        segments_per_batch: int | None = None,
    ):
        self.dir = index_dir
        self.k1, self.b = k1, b
        self.segments_per_batch = segments_per_batch
        os.makedirs(os.path.join(self.dir, "segments"), exist_ok=True)

    # -- segment bookkeeping -------------------------------------------
    def _manifests(self) -> list[dict]:
        out = []
        seg_root = os.path.join(self.dir, "segments")
        for name in sorted(os.listdir(seg_root)):
            if name.endswith(".manifest.json"):
                with open(os.path.join(seg_root, name)) as f:
                    out.append(json.load(f))
        out.sort(key=lambda m: m["seq"])
        return out

    def _batch_done(self, batch_id: int) -> bool:
        return any(m["batch_id"] == batch_id for m in self._manifests())

    # -- one flush ------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch sink: build + commit one segment (idempotent)."""
        if self._batch_done(batch_id):
            return
        manifests = self._manifests()
        seq = (manifests[-1]["seq"] + 1) if manifests else 0
        offset = sum(m["n_docs"] for m in manifests)
        t0 = time.time()
        idx = IndexBuilder(
            k1=self.k1, b=self.b, num_segments=self.segments_per_batch
        ).build(batch_df)
        seg = os.path.join(self.dir, "segments", f"seg-{seq:06d}")
        idx.docs.write.mode("overwrite").parquet(os.path.join(seg, "docs"))
        idx.postings.write.mode("overwrite").parquet(os.path.join(seg, "postings"))
        n_postings = idx.postings.count()
        dt = time.time() - t0
        idx.unpersist_all()
        manifest = {
            "seq": seq,
            "batch_id": batch_id,
            "offset": offset,
            "n_docs": idx.stats["max_doc"],
            "doc_count": idx.stats["doc_count"],
            "sum_total_term_freq": idx.stats["sum_total_term_freq"],
            "n_postings": n_postings,
            "build_sec": round(dt, 3),
        }
        with open(
            os.path.join(self.dir, "segments", f"seg-{seq:06d}.manifest.json"), "w"
        ) as f:
            json.dump(manifest, f, indent=2)

    # -- attach to a stream --------------------------------------------
    def attach(self, stream_df: DataFrame, trigger_once: bool = False, **trigger_kw):
        """writeStream wiring: micro-batch -> segment flush."""
        w = stream_df.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", os.path.join(self.dir, "_stream_checkpoint")
        )
        if trigger_once:
            w = w.trigger(availableNow=True)
        elif trigger_kw:
            w = w.trigger(**trigger_kw)
        return w.start()

    # -- reader reopen --------------------------------------------------
    def open_index(self, spark: SparkSession) -> InvertedIndex:
        """Point-in-time view over all committed segments (≙
        SearcherManager.maybeRefresh returning a new DirectoryReader)."""
        manifests = self._manifests()
        if not manifests:
            raise ValueError("no committed segments yet")
        parts_d, parts_p = [], []
        for m in manifests:
            seg = os.path.join(self.dir, "segments", f"seg-{m['seq']:06d}")
            off = F.lit(m["offset"]).cast("long")
            d = spark.read.parquet(os.path.join(seg, "docs"))
            parts_d.append(d.withColumn("doc_id", F.col("doc_id") + off))
            p = spark.read.parquet(os.path.join(seg, "postings"))
            parts_p.append(p.withColumn("doc_id", F.col("doc_id") + off))
        docs = parts_d[0]
        for d in parts_d[1:]:
            docs = docs.unionByName(d)
        postings = parts_p[0]
        for p in parts_p[1:]:
            postings = postings.unionByName(p)
        term_stats = postings.groupBy("term").agg(
            F.count("*").alias("doc_freq"),
            F.sum("freq").alias("total_term_freq"),
            F.max("freq").alias("max_freq"),
            F.min("norm").alias("min_norm"),
        )
        stats = {
            "max_doc": sum(m["n_docs"] for m in manifests),
            "doc_count": sum(m["doc_count"] for m in manifests),
            "sum_total_term_freq": sum(m["sum_total_term_freq"] for m in manifests),
        }
        return InvertedIndex(
            spark=spark,
            docs=docs,
            postings=postings,
            term_stats=term_stats,
            stats=stats,
            k1=self.k1,
            b=self.b,
        )

    # -- forceMerge ------------------------------------------------------
    def compact(
        self, spark: SparkSession, n_buckets: int = DEFAULT_BUCKETS, chunk_bits=None
    ) -> InvertedIndex:
        """Merge all segments into one packed stored index (forceMerge(1))."""
        idx = self.open_index(spark)
        out = os.path.join(self.dir, "index")
        save_index(idx, out, n_buckets=n_buckets, chunk_bits=chunk_bits)
        return load_index(spark, out)
