"""Table catalog over the parquet test tables.

``load_tables`` returns DataFrames; ``register_views`` also registers them
as temp views so ``spark.sql`` queries work. The scan itself is the
Catalyst-native ``spark.read.parquet`` — predicate pushdown, column
pruning, and partition pruning apply automatically to every downstream
query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: The star-schema tables the driver generates (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables that should always broadcast in joins at any SF —
#: their cardinality grows sublinearly (region/nation are constant-size).
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: Memoized DataFrames keyed by (application id, sf_dir, table).
#: ``spark.read.parquet`` on a raw path re-lists files and re-reads
#: footers on every call (~0.1 s per table) — a catalog's job is to do
#: that once per session. DataFrames are immutable logical plans, so
#: reuse across queries is safe; a new session gets a new application
#: id and therefore fresh entries.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    if "events" in names:
        # events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read it as epoch-nanos LongType instead. Set
        # dynamically (not only in ENGINE_CONF) so the queries also work
        # under an externally-created session (the driver's).
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    app = spark.sparkContext.applicationId
    base = os.path.abspath(sf_dir)
    out: dict[str, DataFrame] = {}
    for name in names:
        key = (app, base, name)
        df = _DF_CACHE.get(key)
        if df is None:
            df = spark.read.parquet(table_path(sf_dir, name))
            _DF_CACHE[key] = df
        out[name] = df
    return out


def event_ts_ms(col_name: str = "ts"):
    """events.ts (epoch nanos, see load_tables) → epoch millis.

    DuckDB reads the same column as µs-truncated TIMESTAMP; floor-to-ms
    agrees on both sides (oracle: ``epoch_ms(ts)``).
    """
    from pyspark.sql import functions as F

    return F.expr(f"{col_name} div 1000000")


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
