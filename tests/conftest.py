"""Shared fixtures: local SparkSession + DuckDB oracle harness.

``assert_matches_oracle`` mirrors the driver's correctness gate
(CORRECTNESS_r{N}.json): run the Spark query and the DuckDB SQL over the
same parquet tables, sort columns by name, canonicalize values, compare
order-insensitively and *exactly* (no float tolerance — the engine is
built so results are bit-identical; see hcdc_spark.functions.columns).
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pytest

from hcdc_spark.catalog import TABLES, table_path
from hcdc_spark.session import get_spark

SF_DIR = os.environ.get("HCDC_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hcdc-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle(sf_dir):
    con = duckdb.connect()
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            con.sql(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def canon_value(v):
    """Canonicalize one cell the way a value-hash would see it."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # exact shortest repr — bit-identical or bust
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def assert_matches_oracle(spark_df, con, sql: str, name: str = "query"):
    spark_cols = [f.name for f in spark_df.schema.fields]
    spark_rows = [tuple(r) for r in spark_df.collect()]

    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} "
        f"duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count mismatch spark={len(spark_rows)} "
        f"duck={len(duck_rows)}"
    )
    s = canon_rows(spark_cols, spark_rows)
    d = canon_rows(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs duck): {diffs}"
        )
