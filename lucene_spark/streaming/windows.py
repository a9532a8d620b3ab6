"""Event-time windowed aggregation with watermarked late-data handling.

The index side of the engine treats NRT ingest as micro-batched segment
builds (streaming/incremental.py); this module is the complementary
ANALYTICS surface: tumbling/sliding event-time windows over a stream,
with a watermark bounding both state and lateness — the canonical
Structured Streaming shape (Spark docs "Window Operations on Event
Time").  The reference's benchmark module aggregates per-time-bucket
throughput reports the same way, single-node
(benchmark/src/java/org/apache/lucene/benchmark/byTask/stats — points
per time interval); the streaming twin here is the distributed,
late-data-correct version.

One function serves BOTH batch and streaming inputs (the frame algebra
is identical; Spark routes it to an incremental plan under readStream):
call it on a batch DataFrame for the oracle-checkable result, on a
readStream for the incremental one — tests prove batch == streaming
including late rows inside the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = None,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """(win_start, win_end, key, n, total): per event-time window and key,
    the event count and value sum.

    ``watermark`` (streaming only) bounds state: windows older than
    max(event time) - watermark finalize and late rows beyond it drop —
    pass None for batch.  Tumbling window when ``slide`` is None, sliding
    otherwise.  One shuffle on (window, key); partial aggregation runs
    map-side.  At 100 TB the key space is bounded (event types), so the
    post-shuffle cardinality is windows x keys, not events."""
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(
        F.col(ts_col), window
    )
    return (
        df.groupBy(win.alias("win"), F.col(key_col).alias("key"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("value").alias("total"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "key",
            "n",
            "total",
        )
    )
