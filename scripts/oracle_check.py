#!/usr/bin/env python
"""Ad-hoc replica of the driver's correctness gate at an arbitrary scale
factor: python scripts/oracle_check.py [sf_dir] q1 q2 ...

Compares each named queries() entry against its oracle_sql() on DuckDB:
row count, column names, order-insensitive 6-dp-rounded values — the
same normalization as tests/test_entry_queries.py."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


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


def main():
    import duckdb

    import __spark_entry__ as em
    from bench_extra import build_spark
    from spider_core_spark.textops import dedup as td

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, os_ = em.queries(), em.oracle_sql()
    names = args or sorted(os_)
    failed = []
    for name in names:
        sdf = qs[name](spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        td.release_staged_caches()
        res = con.execute(os_[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok = sorted(scols) == sorted(dcols) and len(srows) == len(drows)
        if ok:
            _, sv = _norm_rows(scols, [[r[c] for c in scols] for r in srows])
            _, dv = _norm_rows(dcols, drows)
            ok = sv == dv
        print(f"{'PASS' if ok else 'FAIL'} {name} ({len(srows)} rows)", flush=True)
        if not ok:
            failed.append(name)
    spark.stop()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
