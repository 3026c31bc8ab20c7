"""Oracle-checked correctness for the relational query library."""

from __future__ import annotations

import pytest

from hcdc_spark.operators.analytics import REG

SPECS = sorted(REG.specs.values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spec, spark, oracle, sf_dir):
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(df, oracle, spec.oracle, spec.name)


def test_normalize_event_ts_tz_independent(spark):
    """NTZ wall-clock must pin as-UTC regardless of session timezone.

    2024-01-01 00:00:00 NTZ must normalize to 1704067200e9 nanos under
    both a UTC and a non-UTC session tz (the DuckDB oracle's epoch_ms
    reads the naive wall-clock as UTC).
    """
    from pyspark.sql import functions as F

    from hcdc_spark.catalog import normalize_event_ts

    cases = {
        # plain mid-winter wall-clock
        "2024-01-01 00:00:00": 1704067200 * 10**9,
        # inside the US spring-forward gap (02:30 PDT does not exist in
        # America/Los_Angeles on 2024-03-10) — a session-tz-dependent
        # cast would shift this by the DST delta
        "2024-03-10 02:30:00": 1710037800 * 10**9,
        # inside the fall-back overlap (01:30 occurs twice on 2024-11-03)
        "2024-11-03 01:30:00": 1730597400 * 10**9,
    }
    df = spark.createDataFrame(
        [(w,) for w in cases], "wall string"
    ).select(
        F.col("wall"), F.col("wall").cast("timestamp_ntz").alias("ts")
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/Los_Angeles", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            for row in normalize_event_ts(df).collect():
                assert row["ts"] == cases[row["wall"]], (tz, row)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_event_ts_nonnegative(spark, sf_dir):
    """Gate for catalog.normalize_event_ts's documented assumption:
    `ts div N` (truncate-toward-zero) and the oracles' floor semantics
    agree only for non-negative epochs, so the events fixture must
    contain no pre-1970 timestamp."""
    from pyspark.sql import functions as F

    from hcdc_spark.catalog import load_tables

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    assert ev.where(F.col("ts") < 0).count() == 0
