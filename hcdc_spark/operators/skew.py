"""Skew-mitigation utilities.

AQE's skew-join splitting (on in the engine conf) handles most runtime
skew; these are the explicit tools for the cases it can't see:

- ``salted_join``: shuffle-join a fact table against a *medium* table
  (too big to broadcast) when a handful of hot keys would pin single
  reducers. The fact side gets a deterministic salt (hash of the whole
  row — no rand(), so retries/replays stay consistent); the other side
  is replicated `salt_factor` times. Work per hot key spreads across
  `salt_factor` reducers at the cost of replicating the smaller side.
- ``skew_safe_distinct``: exact count-distinct per key as two cascaded
  aggregations — the (key, value) pre-aggregation spreads a hot key's
  values across all partitions before the per-key count, so one hot
  key never serializes into one task (Spark plans single-column
  count(distinct) this way itself; this form is for when you need the
  pattern explicitly, e.g. under additional aggregates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact ⋈ dim` on `on` with the fact side salted.

    Result equals ``fact.join(dim, on, how)`` for inner/left joins.
    The dim side is replicated `salt_factor`× via a literal explode —
    deterministic, no rand(): a replayed task salts identically.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(*fact.columns), F.lit(salt_factor))
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_factor)])),
    )
    out = f.join(d, [on, "_salt"], how)
    return out.drop("_salt")


def skew_safe_distinct(
    df: DataFrame, key: str, value: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact per-key distinct count via two cascaded aggregations."""
    return (
        df.groupBy(key, value)
        .agg(F.lit(1))
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias(out_col))
    )


def top_keys(df: DataFrame, key: str, n: int = 20) -> DataFrame:
    """Skew diagnosis: heaviest keys and their share of all rows."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.col("n_rows") / F.lit(float(total)))
        .orderBy(F.col("n_rows").desc())
        .limit(n)
    )


# -------------------------------------------------- driver-visible query

from pyspark.sql import SparkSession  # noqa: E402

from hcdc_spark.catalog import load_tables  # noqa: E402
from hcdc_spark.registry import Registry  # noqa: E402

REG = Registry()


@REG.add(
    "q70_salted_join_agg",
    """
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Skew-mitigated join surface: orders (fact) joined to customer "
    "(medium dim) through salted_join — the fact side salted by a "
    "deterministic row hash, the dim side replicated salt_factor "
    "times — then aggregated per market segment. The oracle is the "
    "PLAIN join+agg SQL: salting must be result-invariant, which is "
    "exactly what this row verifies. The tool for the 100 TB case "
    "where a handful of hot keys would pin single reducers and the "
    "dim is too big to broadcast (AQE skew-split only sees "
    "partition-size skew after the fact).",
    tags=("join", "skew"),
)
def q70_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    fact = t["orders"].select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    dim = t["customer"].select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    joined = salted_join(fact, dim, "custkey", salt_factor=8)
    return joined.groupBy(
        F.col("c_mktsegment").alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_price"),
    )


@REG.add(
    "q72_skew_safe_distinct",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
    FROM events
    GROUP BY event_type
    """,
    doc="skew_safe_distinct surfaced driver-visible: exact per-key "
    "distinct count as two cascaded aggregations — the (key, value) "
    "pre-aggregation spreads a hot key's values across all partitions "
    "before the per-key count, so one hot key never serializes into a "
    "single task. Oracle = the plain COUNT(DISTINCT) SQL: the cascade "
    "must be result-invariant. (Same oracle SQL as c14 on purpose: "
    "batch cascade and streaming dedup are two operator paths to one "
    "answer.)",
    tags=("agg", "skew"),
)
def q72_skew_safe_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return skew_safe_distinct(ev, "event_type", "user_id", "n_distinct")
