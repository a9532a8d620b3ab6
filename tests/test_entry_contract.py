"""Replicates the driver's verify: run each __spark_entry__ query on Spark
and its oracle_sql on DuckDB over the same parquet, compare row count, column
names, and order-insensitive values."""

import math

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
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
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["rank", "conv_id", "turn_idx", "score_i"]


def test_queries_have_oracles():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    missing = set(qs) - set(os_)
    assert not missing, f"queries without oracle_sql: {missing}"


@pytest.mark.parametrize("name", list(entry_mod.queries()))
def test_query_vs_oracle(spark, duck, name):
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(osql[name])
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    assert _canon(srows, scols) == _canon(drows, dcols), f"{name}: value mismatch"
