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


def test_asof_join_tie_break(spark):
    """Duplicate right rows per (key, time): tie_break makes the
    greatest-valued row win the carry — the max_by-pre-agg semantics
    without the pre-agg shuffle (the r14 q47 shape)."""
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b")], "k int, t long, lbl string"
    )
    right = spark.createDataFrame(
        [(1, 10, 7, "lo"), (1, 10, 9, "hi"), (1, 15, 1, "mid")],
        "k int, rt long, pri long, rv string",
    )
    out = {
        r["lbl"]: (r["pri"], r["rv"])
        for r in X.asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            right_cols=["pri", "rv"], tie_break="pri",
        ).collect()
    }
    # a(t=10): two right rows at rt=10 -> pri=9 wins; b(t=20): the
    # latest right row overall (rt=15) wins regardless of pri.
    assert out == {"a": (9, "hi"), "b": (1, "mid")}


def test_scd2_interval_invariants(spark, sf_dir):
    """SCD2 contract: per user, versions are dense 1..k, intervals chain
    exactly (valid_to == next valid_from), exactly one open row, and no
    two consecutive versions carry the same state."""
    rows = X.q75_scd2_history(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for uid, hist in by_user.items():
        hist.sort(key=lambda r: r["version"])
        assert [r["version"] for r in hist] == list(range(1, len(hist) + 1))
        assert sum(r["is_current"] for r in hist) == 1
        assert hist[-1]["is_current"] and hist[-1]["valid_to"] is None
        for a, b in zip(hist, hist[1:]):
            assert a["valid_to"] == b["valid_from"], uid
            assert a["state"] != b["state"], uid


def test_zorder_key_known_values(spark):
    """Morton interleave spot-checks: zorder_key(x, y) must place x bits
    at even positions and y bits at odd positions."""
    df = spark.createDataFrame(
        [(0, 0), (3, 1), (1, 3), (1023, 0), (0, 1023), (1023, 1023)],
        "x int, y int",
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", X.zorder_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(10):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y)
    assert got[(3, 1)] == 0b0111
    assert got[(1023, 1023)] == (1 << 20) - 1


def test_zorder_buckets_bound_both_dims(spark, sf_dir):
    """The layout property the query audits: a z-range bucket bounds
    BOTH dimensions (each bucket spans at most 1/8 of one dim and 1/8
    of the other — 6 fixed top bits = 3 bits of each dimension)."""
    rows = X.q79_zorder_cluster(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["x_max"] - r["x_min"] < 128, r
        assert r["y_max"] - r["y_min"] < 128, r


def test_histogram_bin_matches_width_bucket_builtin(spark, sf_dir):
    """q80's hand-rolled bin formula exists only because DuckDB lacks
    width_bucket; Spark's builtin must agree with it on every row (the
    data sits far from any bin-edge float boundary)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    manual = X.histogram_bin(F.col("l_extendedprice"))
    builtin = F.width_bucket(
        F.col("l_extendedprice"),
        F.lit(X.HIST_LO),
        F.lit(X.HIST_HI),
        F.lit(X.HIST_BINS),
    ).cast("int")
    n_disagree = (
        li.select(manual.alias("m"), builtin.alias("b"))
        .where(F.col("m") != F.col("b"))
        .count()
    )
    assert n_disagree == 0
    # histogram totals cover every row exactly once
    rows = X.q80_histogram(spark, sf_dir).collect()
    assert sum(r["n_rows"] for r in rows) == li.count()


def test_corr_stats_close_to_native(spark, sf_dir):
    """The exact-moment corr/stddev must agree with Spark's native
    streaming corr()/stddev_samp() to float tolerance — same statistic,
    different (order-dependent) summation."""
    got = {r["l_returnflag"]: r for r in X.q81_corr_stats(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    native = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr(F.floor("l_quantity"), F.floor("l_extendedprice")).alias(
                "c"
            ),
            F.stddev_samp(F.floor("l_quantity")).alias("s"),
        )
        .collect()
    }
    assert set(got) == set(native)
    for flag, r in got.items():
        assert abs(r["corr_qty_price"] - native[flag]["c"]) < 1e-9
        assert abs(r["stddev_qty"] - native[flag]["s"]) < 1e-9


def test_scd2_matches_python_reference_on_random_log(spark):
    """q75's windowed SCD2 build must equal a pure-Python fold over a
    seeded random event log (300 users, duplicate timestamps, single-
    event users) — one Spark job, exhaustive comparison."""
    import random

    from pyspark.sql import Window

    rng = random.Random(42)
    types = ["view", "click", "purchase", "error"]
    rows = []
    eid = 0
    for uid in range(300):
        for _ in range(rng.randint(1, 12)):
            eid += 1
            # coarse ts pool → frequent duplicate timestamps per user
            rows.append((eid, rng.randint(0, 20) * 1000, uid,
                         rng.choice(types)))
    df = spark.createDataFrame(
        rows, "event_id long, ts_ms long, user_id long, state string"
    )

    # Spark: the same two-window build q75 uses, on this log
    w_in = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    changes = (
        df.withColumn("prev", F.lag("state").over(w_in))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("state")))
    )
    w_out = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    got = sorted(
        (r["user_id"], r["version"], r["state"], r["valid_from"],
         r["valid_to"])
        for r in changes.select(
            "user_id",
            F.row_number().over(w_out).alias("version"),
            "state",
            F.col("ts_ms").alias("valid_from"),
            F.lead("ts_ms").over(w_out).alias("valid_to"),
        ).collect()
    )

    # Python reference fold
    by_user = {}
    for eid_, ts, uid, state in rows:
        by_user.setdefault(uid, []).append((ts, eid_, state))
    want = []
    for uid, evs in by_user.items():
        evs.sort()
        versions = []
        for ts, _e, state in evs:
            if not versions or versions[-1][1] != state:
                versions.append((ts, state))
        for i, (ts, state) in enumerate(versions):
            nxt = versions[i + 1][0] if i + 1 < len(versions) else None
            want.append((uid, i + 1, state, ts, nxt))
    assert got == sorted(want)


def test_zorder_key_is_bijective_on_grid(spark):
    """zorder_key must be a bijection on the 32x32 grid (every z-value
    distinct) and decode back to (x, y) by de-interleaving."""
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = df.select(
        "x", "y", X.zorder_key(F.col("x"), F.col("y")).alias("z")
    ).collect()
    assert len({r["z"] for r in got}) == len(pts)

    def deinterleave(z):
        x = y = 0
        for i in range(10):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    for r in got:
        assert deinterleave(r["z"]) == (r["x"], r["y"])


def test_funnel_monotone_and_bounded(spark, sf_dir):
    """Funnel stages must be non-increasing and bounded by the user
    count; every stage must be hit by someone in the fixtures."""
    r = X.q85_event_funnel(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert n_users >= r["stage_view"] >= r["stage_click"] >= r["stage_purchase"]
    assert r["stage_view"] > 0


def test_retention_offsets_consistent(spark, sf_dir):
    """Retention invariants: offsets are non-negative, offset 0 exists
    for every cohort (the cohort's own first day), and the offset-0
    count equals the cohort's total user count (everyone is active on
    their first day by construction)."""
    rows = X.q84_retention_cohorts(spark, sf_dir).collect()
    by_cohort = {}
    for r in rows:
        assert r["day_offset"] >= 0
        by_cohort.setdefault(r["cohort_day"], {})[r["day_offset"]] = r["n_users"]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from hcdc_spark.catalog import load_tables

    evn = load_tables(spark, sf_dir, ("events",))["events"]
    day = F.date_from_unix_date(F.expr("ts div 86400000000000").cast("int"))
    cohort_sizes = {
        r["cohort_day"]: r["n"]
        for r in evn.select("user_id", day.alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(by_cohort) == set(cohort_sizes)
    for cday, offsets in by_cohort.items():
        assert offsets.get(0) == cohort_sizes[cday], cday
        assert all(n <= cohort_sizes[cday] for n in offsets.values())
