"""Analytic surface extensions (SURVEY §2B gaps): GROUPING SETS,
collect_list/set, null-safe equality, as-of join, range join, exact
percentiles, pivot, approx distinct.

The two custom *operators* here are the ones Spark lacks as builtins:

- **as-of join** (`asof_join`): implemented with the union-merge
  pattern — tag both sides, one shuffle by key, one window pass with
  ``last(ignorenulls)`` — NOT a range join. At 100 TB this is one sort
  per key partition; the naive inequality-join alternative is quadratic
  per key and the broadcast variant caps the right side. DuckDB's
  native ASOF JOIN is the oracle.
- **range join** (`q48`): static band dimensions broadcast; the
  inequality join becomes BroadcastNestedLoop over a literal array —
  constant work per row, no shuffle. For *two large* sides the same
  query should bucket both sides to an equi-key first (see doc note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hcdc_spark.catalog import event_ts_ms, load_tables
from hcdc_spark.registry import Registry

REG = Registry()


@REG.add(
    "q44_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority))
    """,
    doc="Explicit GROUPING SETS (beyond q11 ROLLUP / q12 CUBE): three "
    "chosen sets with GROUPING() discriminators. One shuffle; Spark "
    "expands sets map-side.",
    tags=("agg", "grouping-sets"),
)
def q44_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hcdc_spark.catalog import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))
        """
    )


@REG.add(
    "q45_collect_sets",
    """
    SELECT o_orderstatus,
           array_to_string(
             array_agg(DISTINCT o_orderpriority ORDER BY o_orderpriority),
             ',') AS priorities,
           COUNT(DISTINCT o_custkey) AS n_custs
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="collect_set/collect_list surface: per-status sorted distinct "
    "priorities. Surfaced as a comma-joined string, not array<string>: "
    "the driver's canonicalizer sorts a pandas frame and array cells "
    "are unhashable (r2 `err`). The set semantics are identical; only "
    "the surface type changed.",
    tags=("agg", "collect"),
)
def q45_collect_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return orders.groupBy("o_orderstatus").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderpriority")), ","
        ).alias("priorities"),
        F.count_distinct("o_custkey").alias("n_custs"),
    )


@REG.add(
    "q46_null_safe_eq",
    """
    WITH a AS (SELECT DISTINCT NULLIF(o_orderpriority, '1-URGENT') AS v
               FROM orders),
         b AS (SELECT DISTINCT NULLIF(o_orderpriority, '3-MEDIUM') AS v
               FROM orders)
    SELECT a.v AS v_a, b.v AS v_b
    FROM a JOIN b ON a.v IS NOT DISTINCT FROM b.v
    """,
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL "
    "rows on both sides must pair up exactly once.",
    tags=("join", "null-safe"),
)
def q46_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    a = orders.select(
        F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("v_a")
    ).distinct()
    b = orders.select(
        F.nullif("o_orderpriority", F.lit("3-MEDIUM")).alias("v_b")
    ).distinct()
    return a.join(b, F.col("v_a").eqNullSafe(F.col("v_b")))


# --------------------------------------------------------- as-of join


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_time <= left_time`` (backward) per key.

    Union-merge implementation: tag sides, shuffle once by key, one
    ordered window pass carrying the last-seen right values forward
    (``last(ignorenulls=True)``), keep left rows. O(n log n) per key
    partition, no inequality join, no broadcast cap. Right side must be
    unique per (key, time) — pre-aggregate if not.
    """
    if direction != "backward":
        raise ValueError("only backward as-of is implemented")
    clash = set(right_cols) & set(left.columns)
    if clash:
        # A right_col also present on the left would feed the left rows'
        # OWN values into the last(ignorenulls) carry — silently wrong
        # as-of values. Rename on either side before joining.
        raise ValueError(f"right_cols also exist on the left: {sorted(clash)}")
    lt = F.col(left_time)
    l_tagged = left.withColumn("_t", lt).withColumn("_side", F.lit(1))
    r_tagged = right.withColumn("_t", F.col(right_time)).withColumn(
        "_side", F.lit(0)
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None))
    for c in right_cols:
        if c not in l_tagged.columns:
            l_tagged = l_tagged.withColumn(c, F.lit(None))
    cols = list(dict.fromkeys(left.columns + right_cols + ["_t", "_side"]))
    u = l_tagged.select(cols).unionByName(r_tagged.select(cols))
    # right rows sort before left rows at equal time → `<=` semantics
    w = (
        Window.partitionBy(on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(c, ignorenulls=True).over(w).alias(f"_asof_{c}")
        for c in right_cols
    ]
    out = u.select(*cols, *carried).where(F.col("_side") == 1)
    for c in right_cols:
        out = out.drop(c).withColumnRenamed(f"_asof_{c}", c)
    return out.drop("_t", "_side")


@REG.add(
    "q47_asof_join",
    """
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), purchases AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           epoch_ms(p.ts) AS purchase_ms,
           epoch_ms(c.ts) AS click_ms,
           c.click_id
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="As-of join: each purchase matched to the user's most recent "
    "prior click. Spark side is the union-merge single-window "
    "implementation (no inequality join); oracle is DuckDB's native "
    "ASOF JOIN — matching hashes prove the semantics exactly.",
    tags=("join", "asof"),
)
def q47_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The as-of comparison runs at MICROSECOND precision (`ts div 1000`)
    # to match the oracle exactly: DuckDB reads events.ts as µs
    # timestamps and its ASOF compares full values, so an ms-truncated
    # Spark side would disagree whenever two events share a millisecond
    # (latent in the current fixtures, real on any larger dataset). The
    # ms values surfaced in the result are projections only.
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    base = ev.select(
        "event_id", "user_id", "event_type",
        F.expr("ts div 1000").alias("tus"),
    )
    clicks = (
        base.where(F.col("event_type") == "click")
        .groupBy("user_id", "tus")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_us", F.col("tus"))
    )
    purchases = base.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("tus").alias("purchase_us")
    )
    joined = asof_join(
        purchases,
        clicks.select("user_id", "tus", "click_id", "click_us"),
        on="user_id",
        left_time="purchase_us",
        right_time="tus",
        right_cols=["click_id", "click_us"],
    )
    return joined.select(
        "event_id", "user_id",
        F.expr("purchase_us div 1000").alias("purchase_ms"),
        F.expr("click_us div 1000").alias("click_ms"),
        "click_id",
    )


@REG.add(
    "q48_range_join",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('none', 0.00, 0.01), ('low', 0.01, 0.04),
             ('mid', 0.04, 0.08), ('high', 0.08, 1.01)
    )
    SELECT band, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS price_sum
    FROM lineitem JOIN bands
      ON l_discount >= lo AND l_discount < hi
    GROUP BY band
    """,
    doc="Range (interval) join of lineitem against static discount "
    "bands. The band dim is a broadcast literal → nested-loop over 4 "
    "rows, constant per item, no shuffle before the agg. (Two large "
    "sides would instead bucket both to an equi-key; bands here are "
    "static so broadcast is the right plan.)",
    tags=("join", "range"),
)
def q48_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    # SQL VALUES → LocalRelation: stays JVM-side. (createDataFrame from
    # Python lists goes through applySchemaToPythonRDD, which drags a
    # Python worker into an otherwise all-JVM plan — ~8s of worker
    # spin-up on first use for a 4-row dim.)
    bands = spark.sql(
        "SELECT * FROM VALUES"
        " ('none', 0.00D, 0.01D), ('low', 0.01D, 0.04D),"
        " ('mid', 0.04D, 0.08D), ('high', 0.08D, 1.01D)"
        " AS bands(band, lo, hi)"
    )
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_discount") >= F.col("lo"))
            & (F.col("l_discount") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("price_sum"),
        )
    )


@REG.add(
    "q49_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.5) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles per group (Spark `percentile` "
    "== DuckDB quantile_cont; quantity values are small integers in "
    "doubles, so interpolation is exact in binary).",
    tags=("agg", "percentile"),
)
def q49_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("p25"),
        F.percentile("l_quantity", 0.5).alias("p50"),
        F.percentile("l_quantity", 0.75).alias("p75"),
        F.max("l_quantity").alias("max_qty"),
    )


@REG.add(
    "q50_pivot",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE)
             AS qty_F,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE)
             AS qty_O
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot (long→wide): explicit value list keeps the plan one "
    "pass (no extra distinct-values job).",
    tags=("agg", "pivot"),
)
def q50_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
        )
    )
    return out.withColumnRenamed("F", "qty_F").withColumnRenamed("O", "qty_O")


@REG.add(
    "q51_approx_distinct",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events,
           TRUE AS within_2pct
    FROM events
    GROUP BY event_type
    """,
    doc="approx_count_distinct (HyperLogLog++) per event_type. Sketch "
    "internals differ across engines, so the raw estimate is not "
    "oracle-able — instead the query surfaces the exact distinct "
    "count, the row count, and the <=2% relative-error CONTRACT as a "
    "boolean (abs(approx-exact)/exact <= 0.02); the oracle recomputes "
    "exact_users/n_events and emits the constant TRUE, so a hash "
    "match certifies the sketch met its error bound on every group. "
    "At 100 TB the sketch mergeability (partial agg) is the point.",
    tags=("agg", "approx"),
)
def q51_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.01)
                - F.count_distinct("user_id")
            ).cast("double")
            / F.count_distinct("user_id")
            <= 0.02
        ).alias("within_2pct"),
    )


@REG.add(
    "q65_map_json_functions",
    """
    SELECT event_id,
           'k,type,uid' AS keys_csv,
           event_type AS type_val,
           CAST(user_id AS VARCHAR) AS uid_val,
           json_extract_string(props, '$.k') AS k_val,
           3 AS n_entries,
           'STRUCT<k: BIGINT>' AS props_schema
    FROM events
    WHERE event_id % 100 = 0
    """,
    doc="Map + JSON schema surface (SURVEY §2B scalar fns: map_keys, "
    "element_at, map creation, schema_of_json): events are lifted into "
    "a map<string,string> column, then read back out via map_keys "
    "(sorted), element_at lookups, and size; schema_of_json infers the "
    "props schema (the T20 inference primitive as an expression). The "
    "oracle recomputes every surfaced value from the raw columns — "
    "including Spark's inferred-schema string, which is part of the "
    "contract. Map ops are pure projections: zero shuffles.",
    tags=("analytics", "scalar"),
)
def q65_map_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
        F.lit("k"), F.get_json_object("props", "$.k"),
    )
    return (
        ev.where(F.col("event_id") % 100 == 0)
        .withColumn("m", m)
        .select(
            "event_id",
            F.array_join(F.array_sort(F.map_keys("m")), ",").alias(
                "keys_csv"
            ),
            F.element_at("m", "type").alias("type_val"),
            F.element_at("m", "uid").alias("uid_val"),
            F.element_at("m", "k").alias("k_val"),
            F.size("m").alias("n_entries"),
            F.schema_of_json(F.lit('{"k": 69}')).alias("props_schema"),
        )
    )
