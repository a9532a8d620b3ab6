"""Greedy sequence packing: fill fixed token budgets with consecutive turns.

LLM training pipelines pack documents/turns into fixed-size context
windows (budget ``cap`` tokens): walk the turns of a conversation in
order, start a new bin whenever adding the next turn would overflow the
budget (a turn larger than the budget gets a bin of its own).  The scan
is NON-associative (the bin boundary depends on the running remainder),
so no window/aggregate combination expresses it — this is the legitimate
``applyInPandas`` case: one Arrow-batched pass per conversation, state
bounded by the conversation length.

Scale shape: ONE shuffle on the group key (conv_id — the natural
transcript layout, usually already the partition key), then a pure
per-group pandas scan.  The cross-engine twin is a recursive CTE
(tests + gate), so the exact greedy semantics are pinned, not
approximated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_PATTERN = "[a-z0-9]+"


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``n_tokens`` (same token class as the oracle prelude)."""
    return df.withColumn(
        "n_tokens",
        F.size(F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)")),
    )


def pack_sequences(
    df: DataFrame,
    cap: int,
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    len_col: str = "n_tokens",
) -> DataFrame:
    """Assign each row a 0-based ``bin`` per key: greedy first-fit in
    ``order_col`` order — a new bin starts when the running total would
    exceed ``cap`` (rows with ``len > cap`` occupy a bin alone)."""
    import pandas as pd

    out_schema = f"{key_col} string, {order_col} int, {len_col} int, bin int"
    cap_i = int(cap)

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_col, kind="mergesort")
        bins = []
        running, b = 0, 0
        for length in pdf[len_col]:
            if running > 0 and running + length > cap_i:
                b += 1
                running = int(length)
            else:
                running += int(length)
            bins.append(b)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].values,
                order_col: pdf[order_col].values,
                len_col: pdf[len_col].values,
                "bin": bins,
            }
        )

    return (
        df.select(key_col, order_col, len_col)
        .groupBy(key_col)
        .applyInPandas(fn, out_schema)
    )


def pack_stats(
    df: DataFrame,
    cap: int,
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    len_col: str = "n_tokens",
) -> DataFrame:
    """(key, bin, n_turns, tokens): per-bin fill stats — the packing
    efficiency report (tokens/cap is the utilization)."""
    packed = pack_sequences(df, cap, key_col, order_col, len_col)
    return packed.groupBy(key_col, "bin").agg(
        F.count("*").cast("int").alias("n_turns"),
        F.sum(len_col).cast("long").alias("tokens"),
    )
