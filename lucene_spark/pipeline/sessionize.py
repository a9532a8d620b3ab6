"""Gap-based sessionization of transcript turns.

A session is a maximal run of turns where each turn starts within
``gap_seconds`` of the previous one (and time moves forward) — the
standard interaction-session model for conversation / agent-transcript
analytics.

Two implementations of the same contract:

* **Batch** (:func:`sessionize`): pure JVM window algebra — a lag diff,
  a boundary flag, and a running sum.  No UDF, whole-stage codegen, one
  shuffle on the partition key; at 100 TB this is a single exchange on
  conv_id (already the natural layout for transcript tables).
* **Streaming** (:func:`sessionize_stream`): ``applyInPandasWithState``
  keyed by conv_id — the custom-stateful-operator socket (Structured
  Streaming ``FlatMapGroupsWithState``).  State per key is the one open
  session (start, end, n); a turn within the gap extends it, a later
  turn closes and EMITS it, and an event-time timeout past the watermark
  flushes the open session when the stream goes quiet.  State is O(1)
  per active conversation and evicted on timeout — bounded regardless of
  stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    gap_seconds: int = 3600,
    ts_col: str = "ts",
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Label every row with a 0-based ``session_idx`` per ``key_col``.

    A new session starts at the first turn, whenever the gap to the
    previous turn (in ``order_col`` order) exceeds ``gap_seconds``, or
    whenever time moves backwards (out-of-order timestamps start a fresh
    session rather than extending one into the past)."""
    w = Window.partitionBy(key_col).orderBy(order_col)
    t = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(t).over(w)
    brk = F.when(
        prev.isNull() | ((t - prev) > gap_seconds) | ((t - prev) < 0), 1
    ).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_idx", (F.sum(brk).over(run) - 1).cast("int"))


def session_stats(
    df: DataFrame,
    gap_seconds: int = 3600,
    ts_col: str = "ts",
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """(key, session_idx, n_turns, start_epoch, end_epoch) per session."""
    s = sessionize(df, gap_seconds, ts_col, key_col, order_col)
    t = F.unix_timestamp(F.col(ts_col))
    return s.groupBy(key_col, "session_idx").agg(
        F.count("*").cast("int").alias("n_turns"),
        F.min(t).alias("start_epoch"),
        F.max(t).alias("end_epoch"),
    )


_OUT_SCHEMA = (
    "conv_id string, session_start long, session_end long, n_turns int"
)
_STATE_SCHEMA = "start long, end long, n int"


def sessionize_stream(
    stream_df: DataFrame,
    gap_seconds: int = 3600,
    ts_col: str = "ts",
    key_col: str = "conv_id",
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Emit CLOSED sessions (key, session_start, session_end, n_turns)
    from a stream of turns.

    ``applyInPandasWithState`` with an event-time timeout: each key's
    state is its single open session; arrivals within ``gap_seconds``
    extend it, a later arrival closes + emits the previous session, and
    when the watermark passes ``session_end + gap`` the timeout fires and
    flushes the open session.  Epoch seconds in the output keep the frame
    Arrow-friendly and engine-comparable."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = int(gap_seconds)

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        def frame(rows):
            return pd.DataFrame(
                rows,
                columns=["conv_id", "session_start", "session_end", "n_turns"],
            )

        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield frame([(key[0], s, e, n)])
            return

        ts = []
        for pdf in pdfs:
            ts.extend(
                int(v.timestamp()) for v in pd.to_datetime(pdf[ts_col])
            )
        ts.sort()
        open_sess = state.get if state.exists else None
        closed = []
        for t in ts:
            if open_sess is None:
                open_sess = (t, t, 1)
            elif 0 <= t - open_sess[1] <= gap:
                open_sess = (open_sess[0], t, open_sess[2] + 1)
            else:
                closed.append((key[0], *open_sess))
                open_sess = (t, t, 1)
        state.update(open_sess)
        # flush the open session once the watermark passes its gap horizon
        state.setTimeoutTimestamp((open_sess[1] + gap) * 1000)
        yield frame(closed)

    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
