"""Replicates the driver's verify: run each __spark_entry__ query on Spark
and its oracle_sql on DuckDB over the same parquet, compare row count, column
names, and order-insensitive values."""

import math
import os

import pytest

import __spark_entry__ as entry_mod

# default sf0.001 keeps the suite fast; the pre-submission certification run
# sets ENTRY_CONTRACT_SF_DIR=/root/testdata/sf0.01 (the driver's scale)
SF_DIR = os.environ.get("ENTRY_CONTRACT_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    return v


def _canon(rows, cols):
    """Driver-replica canonicalization: build a pandas frame, sort columns by
    name, sort_values over ALL columns (this is what the real driver does, and
    it throws `TypeError: unhashable type` on list/dict cells — exactly the
    failure class that shipped in round 3's `term_vector_doc`), then compare
    normalized cell values."""
    import pandas as pd

    order = sorted(cols)
    df = pd.DataFrame(
        [tuple(_norm_cell(v) for v in r) for r in rows], columns=list(cols)
    )
    df = df[order]
    if len(df):
        # pandas sort_values -> Categorical.factorize requires hashable cells,
        # same as the driver's canonicalizer.
        df = df.sort_values(by=order, kind="mergesort", ignore_index=True)
    return [tuple(r) for r in df.itertuples(index=False, name=None)]


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["rank", "conv_id", "turn_idx", "score_i"]


def test_queries_have_oracles():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    missing = set(qs) - set(os_)
    assert not missing, f"queries without oracle_sql: {missing}"


_FLAT_TYPES = {
    "string", "boolean", "tinyint", "smallint", "int", "bigint",
    "float", "double", "decimal", "date", "timestamp", "binary",
}


@pytest.mark.parametrize("name", list(entry_mod.queries()))
def test_query_vs_oracle(spark, duck, name):
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    for fname, ftype in sdf.dtypes:
        base = ftype.split("(")[0]
        assert base in _FLAT_TYPES, (
            f"{name}: column {fname} has nested type {ftype}; the driver's "
            "pandas canonicalizer cannot hash list/struct cells — emit a "
            "string (concat_ws/to_json) instead"
        )
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(osql[name])
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    assert _canon(srows, scols) == _canon(drows, dcols), f"{name}: value mismatch"
