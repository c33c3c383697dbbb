"""Mirror of the driver's correctness gate: every queries() entry vs its
oracle_sql() on sf0.01, order-insensitive value comparison."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


def _canon(v):
    # Mirror of the driver's value canonicalization (everything to a
    # string — scripts/check_correctness.py::canon): nullable int columns
    # make raw tuples unsortable (None < int TypeError).
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        s = v.isoformat(sep=" ")
        return s[:-3] if s.endswith("000") and "." in s else s
    return str(v)


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in idx) for r in rows)


ORACLES = E.oracle_sql()
ALL_QUERIES = list(E.queries())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, con, name):
    qdf = E.queries()[name](spark, SF)
    spark_cols = qdf.columns
    spark_rows = [tuple(r) for r in qdf.collect()]
    if name not in ORACLES:
        assert len(spark_rows) >= 0  # rows-only check (driver's weak gate)
        return
    res = con.sql(ORACLES[name])
    duck_cols = res.columns
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    got = _rows_to_set(spark_cols, spark_rows)
    want = _rows_to_set(duck_cols, duck_rows)
    if got != want:
        diffs = [(g, w) for g, w in zip(got, want) if g != w][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "ts", "part", "lsn"]
