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
