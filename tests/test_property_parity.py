"""Property-based three-way parity of the shared h64 primitive (the
foundation every oracle-vs-Spark comparison rests on): for ARBITRARY
unicode strings, the Spark expression, the pure-Python twin, and the
DuckDB SQL fragment must agree bit-for-bit — seeded and unseeded.

Strings are generated in batches so each hypothesis example costs one
Spark job, not one per string. NUL is excluded (DuckDB VARCHAR cannot
carry it); surrogates are excluded (not UTF-8-encodable)."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spider_core_spark.functions import hashing

# printable + multibyte unicode, no NUL, no surrogates
_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x00"
    ),
    min_size=0,
    max_size=64,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(strs=st.lists(_text, min_size=1, max_size=16), seed=st.integers(0, 1000))
def test_h64_three_way_property(spark, strs, seed):
    py = [hashing.h64_py(s) for s in strs]
    py_seeded = [hashing.h64_py(s, seed=seed) for s in strs]

    sdf = spark.createDataFrame([(s,) for s in strs], "s string")
    got = sdf.select(
        hashing.h64_col(F.col("s")).alias("h"),
        hashing.h64_col(F.col("s"), seed=seed).alias("hs"),
    ).collect()
    assert [r["h"] for r in got] == py
    assert [r["hs"] for r in got] == py_seeded

    con = duckdb.connect()
    for s, expect, expect_seeded in zip(strs, py, py_seeded):
        dd = con.execute(
            f"SELECT {hashing.h64_duckdb('?::VARCHAR')}, "
            f"{hashing.h64_duckdb('?::VARCHAR', seed=seed)}",
            [s, s],
        ).fetchone()
        assert dd[0] == expect
        assert dd[1] == expect_seeded


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(strs=st.lists(_text, min_size=1, max_size=16))
def test_h64_range_and_determinism(spark, strs):
    """60-bit contract: every value fits a non-negative int64 in all
    engines (the property the % bucket arithmetic in every banded
    operator relies on), and repeated evaluation is stable."""
    for s in strs:
        v = hashing.h64_py(s)
        assert 0 <= v < 2**60
        assert hashing.h64_py(s) == v
