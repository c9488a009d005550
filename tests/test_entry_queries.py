"""Replicates the driver's correctness gate: every queries() entry vs its
oracle_sql() on DuckDB at sf0.001 (fast) — row count, column names, and
order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    sc, sv = _norm_rows(scols, [[r[c] for c in scols] for r in srows])
    dc, dv = _norm_rows(dcols, drows)
    mism = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b]
    assert not mism, f"{name}: {len(mism)} value mismatches, first: {sv[mism[0]]} vs {dv[mism[0]]}"


def test_rows_only_queries(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() > 0, f"{name}: empty result"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 3
