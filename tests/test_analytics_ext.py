"""§2B extension operators: oracle checks + approx-distinct error gate
+ asof_join unit semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hcdc_spark.operators import analytics_ext as X
from tests.conftest import assert_matches_oracle

ALL_SPECS = sorted(X.REG.specs.values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", ALL_SPECS, ids=[s.name for s in ALL_SPECS])
def test_operator(spec, spark, oracle, sf_dir):
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    assert_matches_oracle(df, oracle, spec.oracle, spec.name)


def test_approx_distinct_error_bound(spark, sf_dir):
    # The <=2% contract is surfaced as the within_2pct column; the raw
    # sketch estimate is re-derived here to double-check the boolean.
    rows = X.q51_approx_distinct(spark, sf_dir).collect()
    assert rows and all(r["within_2pct"] for r in rows)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["a"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("a"))
        .collect()
    }
    for k, e in exact.items():
        assert abs(approx[k] - e) / e <= 0.02, (k, approx[k], e)
        assert {r["event_type"]: r["exact_users"] for r in rows}[k] == e


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d")],
        "k int, t long, lbl string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 15, "r15"), (2, 99, "r99")],
        "k int, rt long, rv string",
    )
    out = {
        r["lbl"]: r["rv"]
        for r in X.asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            right_cols=["rv"],
        ).collect()
    }
    # a(t=10) matches r10 (<=), b(t=20) matches r15, c(t=5) no match,
    # d(k=2,t=7) has only a future right row -> no match
    assert out == {"a": "r10", "b": "r15", "c": None, "d": None}
