"""Skew utilities: salted results == plain results; salt spreads keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from hcdc_spark.operators import skew


def _skewed(spark):
    # one hot key (90%) + a tail
    hot = spark.range(900).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    tail = spark.range(100).select(
        (F.col("id") % 50 + 2).alias("k"), F.col("id").alias("payload")
    )
    return hot.unionAll(tail)


def test_salted_join_matches_plain(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(1, 60)], "k long, attr string"
    )
    plain = fact.join(dim, "k").select("k", "payload", "attr")
    salted = skew.salted_join(fact, dim, "k").select("k", "payload", "attr")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame([(1, "one")], "k long, attr string")
    out = skew.salted_join(fact, dim, "k", how="left")
    assert out.count() == fact.count()
    assert out.where(F.col("attr").isNull()).count() == 100  # tail rows


def test_salt_spreads_hot_key(spark):
    fact = _skewed(spark)
    salt = F.pmod(F.xxhash64(*fact.columns), F.lit(8))
    n_salts = (
        fact.withColumn("_salt", salt)
        .where(F.col("k") == 1)
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts == 8  # hot key split across all salt buckets


def test_skew_safe_distinct_exact(spark):
    df = _skewed(spark)
    got = {
        r["k"]: r["n_distinct"]
        for r in skew.skew_safe_distinct(df, "k", "payload").collect()
    }
    want = {
        r["k"]: r["n"]
        for r in df.groupBy("k")
        .agg(F.count_distinct("payload").alias("n"))
        .collect()
    }
    assert got == want


def test_top_keys_diagnosis(spark):
    top = skew.top_keys(_skewed(spark), "k", n=1).collect()
    assert top[0]["k"] == 1 and abs(top[0]["share"] - 0.9) < 1e-9


def test_q70_salted_join_agg_matches_oracle(spark, oracle, sf_dir):
    from tests.conftest import assert_matches_oracle

    from hcdc_spark.operators.skew import REG

    spec = REG.specs["q70_salted_join_agg"]
    assert_matches_oracle(
        spec.fn(spark, sf_dir), oracle, spec.oracle, spec.name
    )


def test_q70_equals_unsalted_plan(spark, sf_dir):
    """Salting is a physical rewrite only: row-for-row equal to the
    plain join+agg DataFrame plan."""
    from pyspark.sql import functions as F

    from hcdc_spark.catalog import load_tables
    from hcdc_spark.operators.skew import q70_salted_join_agg

    t = load_tables(spark, sf_dir, ("orders", "customer"))
    plain = (
        t["orders"]
        .join(t["customer"],
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double").alias("total_price"),
        )
    )
    got = sorted(tuple(r) for r in q70_salted_join_agg(spark, sf_dir).collect())
    want = sorted(tuple(r) for r in plain.collect())
    assert got == want


def test_q72_skew_safe_distinct_matches_oracle(spark, oracle, sf_dir):
    from tests.conftest import assert_matches_oracle

    from hcdc_spark.operators.skew import REG

    spec = REG.specs["q72_skew_safe_distinct"]
    assert_matches_oracle(
        spec.fn(spark, sf_dir), oracle, spec.oracle, spec.name
    )
