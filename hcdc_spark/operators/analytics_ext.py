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
    tie_break: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_time <= left_time`` (backward) per key.

    Union-merge implementation: tag sides, shuffle once by key, one
    ordered window pass carrying the last-seen right values forward
    (``last(ignorenulls=True)``), keep left rows. O(n log n) per key
    partition, no inequality join, no broadcast cap. Right side must be
    unique per (key, time) — pre-aggregate if not, OR pass ``tie_break``.

    ``tie_break``: name of a right column appended to the window
    ordering. With duplicate right rows per (key, time), the row with
    the GREATEST tie_break value sorts last and wins the carry — the
    same result as pre-aggregating the right side with max_by on that
    column, without the extra shuffle the pre-aggregation costs (the
    dedup rides in the sort the window pays anyway; left rows carry
    NULL in the column, which is irrelevant to their relative order).
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
    order = ["_t", "_side"] + ([tie_break] if tie_break else [])
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
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
    # The oracle's MAX(event_id)-per-(user, ts) click dedup rides in
    # the as-of window's ordering (tie_break) instead of a standalone
    # groupBy: sorted by (_t, _side, click_id), the same-µs click with
    # the greatest event_id is the last one the carry sees — identical
    # result, one exchange instead of two (the clicks stream was
    # shuffled once to dedup and again, unioned, for the window).
    clicks = base.where(F.col("event_type") == "click").select(
        "user_id",
        "tus",
        F.col("event_id").alias("click_id"),
        F.col("tus").alias("click_us"),
    )
    purchases = base.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("tus").alias("purchase_us")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="purchase_us",
        right_time="tus",
        right_cols=["click_id", "click_us"],
        tie_break="click_id",
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


# ------------------------------------------------- SCD2 dimension build

_SCD2_ORACLE = """
    WITH ordered AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
             ) AS prev_type
      FROM events),
    changes AS (
      SELECT user_id, event_type AS state, ts_ms AS valid_from, event_id
      FROM ordered WHERE prev_type IS NULL OR prev_type <> event_type)
    SELECT user_id, state, valid_from,
           LEAD(valid_from) OVER w AS valid_to,
           (LEAD(valid_from) OVER w IS NULL) AS is_current,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
    FROM changes WINDOW w AS (PARTITION BY user_id ORDER BY valid_from,
                              event_id)
"""


@REG.add(
    "q75_scd2_history",
    _SCD2_ORACLE,
    doc="Slowly-changing-dimension type-2 build from a CDC-style event "
    "stream: per user, consecutive identical states collapse and each "
    "state change opens a version row with [valid_from, valid_to) "
    "millisecond bounds, is_current on the open row, and a dense "
    "version number. Two window passes over the SAME (user_id) "
    "partitioning — Catalyst plans one shuffle and reuses the sort, so "
    "at 100 TB this is a single exchange by the dimension key (the "
    "minimum any SCD2 build can do). Ties inside a millisecond break "
    "on event_id on both sides, so the result is deterministic. Oracle "
    "re-derives the identical history with DuckDB windows.",
    tags=("cdc", "window", "scd2"),
)
def q75_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    base = ev.select(
        "user_id", "event_type", "event_id",
        event_ts_ms().alias("ts_ms"),
    )
    w_in = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    changes = (
        base.withColumn("prev_type", F.lag("event_type").over(w_in))
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts_ms").alias("valid_from"),
            "event_id",
        )
    )
    w_out = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w_out).alias("valid_to"),
        F.lead("valid_from").over(w_out).isNull().alias("is_current"),
        F.row_number().over(w_out).cast("long").alias("version"),
    )


# ------------------------------------- approx percentile rank contract


@REG.add(
    "q77_approx_percentile",
    """
    SELECT l_returnflag, COUNT(*) AS n_items,
           quantile_cont(l_quantity, 0.5) AS exact_p50,
           TRUE AS within_rank_bound
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_percentile (t-digest-style sketch) per group with its "
    "accuracy CONTRACT surfaced, mirroring q51's shape: sketch "
    "internals differ across engines, so the query emits the exact "
    "interpolated median plus a boolean certifying the approximate "
    "median's true rank lies within +-0.5% OF N of the midpoint, i.e. "
    "rank(ap50) in [0.495n, 0.505n] (checked via one broadcast-join "
    "count pass: #values strictly below <= 0.505n and #values "
    "at-or-below >= 0.495n). The oracle recomputes "
    "n and the exact median and emits the constant TRUE, so a hash "
    "match certifies the sketch met its rank bound on every group. At "
    "100 TB the sketch's mergeability (map-side partial agg, fixed "
    "memory) is the point — the exact percentile needs a full sort.",
    tags=("agg", "approx", "percentile"),
)
def q77_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    ap = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 10000).alias("ap50")
    )
    return (
        li.join(F.broadcast(ap), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.percentile("l_quantity", 0.5).alias("exact_p50"),
            F.sum(
                F.when(F.col("l_quantity") < F.col("ap50"), 1).otherwise(0)
            ).alias("_lt"),
            F.sum(
                F.when(F.col("l_quantity") <= F.col("ap50"), 1).otherwise(0)
            ).alias("_le"),
        )
        .select(
            "l_returnflag",
            "n_items",
            "exact_p50",
            (
                (F.col("_lt") <= 0.505 * F.col("n_items"))
                & (F.col("_le") >= 0.495 * F.col("n_items"))
            ).alias("within_rank_bound"),
        )
    )


# ----------------------------------------------- z-order layout key


def zorder_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton (z-order) interleave of two ``bits``-bit dimensions.

    Pure integer arithmetic (shift/mask/or) — stays inside whole-stage
    codegen, no UDF. Sorting or range-partitioning a table by this key
    co-locates rows that are close in BOTH dimensions, so min/max file
    statistics prune scans for predicates on either column — the
    standard multi-dimensional clustering trick for 100 TB layouts
    (Delta/Iceberg Z-ORDER is this exact key feeding a range partition).
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def _zorder_oracle() -> str:
    xbits = " + ".join(f"(((x >> {i}) & 1) << {2 * i})" for i in range(10))
    ybits = " + ".join(
        f"(((y >> {i}) & 1) << {2 * i + 1})" for i in range(10)
    )
    return f"""
    WITH d AS (SELECT l_orderkey % 1024 AS x, l_partkey % 1024 AS y
               FROM lineitem),
    z AS (SELECT x, y, ({xbits}) + ({ybits}) AS zval FROM d)
    SELECT zval >> 14 AS bucket, COUNT(*) AS n_rows,
           MIN(x) AS x_min, MAX(x) AS x_max,
           MIN(y) AS y_min, MAX(y) AS y_max
    FROM z GROUP BY bucket
    """


@REG.add(
    "q79_zorder_cluster",
    _zorder_oracle(),
    doc="Z-order (Morton) clustering key over two join/filter "
    "dimensions, demonstrated as the layout audit a 100 TB table "
    "maintenance job runs: interleave 10 bits of each dimension into a "
    "20-bit z-value, bucket rows by the z-range a file would hold "
    "(top 6 bits), and report per-bucket min/max of BOTH dimensions — "
    "the exact statistics a scan would prune on. The key is built by "
    "``zorder_key`` (shift/mask expressions, zero UDFs); the oracle "
    "recomputes the identical interleave with DuckDB bit arithmetic.",
    tags=("layout", "clustering", "scale"),
)
def q79_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    d = li.select(
        (F.col("l_orderkey") % 1024).alias("x"),
        (F.col("l_partkey") % 1024).alias("y"),
    )
    return (
        d.withColumn("zval", zorder_key(F.col("x"), F.col("y")))
        .groupBy(F.shiftright("zval", 14).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )


# --------------------------------------------- histogram / binning

#: q80 histogram geometry: 20 equi-width bins over [900, 105000).
HIST_LO, HIST_HI, HIST_BINS = 900.0, 105000.0, 20
HIST_SPAN = HIST_HI - HIST_LO


def histogram_bin(col: Column) -> Column:
    """width_bucket-shaped bin id for q80, written as explicit IEEE
    arithmetic (one subtract, one divide, one multiply, floor) so the
    DuckDB oracle can spell the identical expression — DuckDB has no
    width_bucket builtin. Values below HIST_LO land in bin 0, at or
    above HIST_HI in bin HIST_BINS+1, mirroring width_bucket. The
    pytest gate cross-checks this formula against Spark's builtin
    width_bucket on the data."""
    return F.least(
        F.lit(HIST_BINS + 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (col - F.lit(HIST_LO)) / F.lit(HIST_SPAN) * F.lit(HIST_BINS)
            ).cast("int")
            + F.lit(1),
        ),
    )


@REG.add(
    "q80_histogram",
    """
    WITH b AS (
      SELECT l_extendedprice AS price,
             LEAST(21, GREATEST(0,
               CAST(FLOOR((l_extendedprice - 900.0) / 104100.0 * 20)
                    AS INT) + 1)) AS bin
      FROM lineitem)
    SELECT bin, COUNT(*) AS n_rows,
           MIN(price) AS bin_lo, MAX(price) AS bin_hi
    FROM b GROUP BY bin
    """,
    doc="Equi-width histogram (20 bins over [900, 105000) plus the two "
    "width_bucket-style overflow bins 0 and 21): the per-bin count and "
    "observed min/max a profiler or optimizer collects. The bin "
    "expression is written identically in both engines — one subtract, "
    "one divide, one multiply, floor — so every IEEE intermediate is "
    "bit-identical (DuckDB has no width_bucket; Spark's builtin "
    "width_bucket is cross-checked against this formula in pytest). "
    "One shuffle of 22 partial rows per task at any scale — histograms "
    "are the canonical map-side-combine aggregate.",
    tags=("agg", "histogram", "profile"),
)
def q80_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    bin_col = histogram_bin(F.col("l_extendedprice"))
    return (
        li.select(F.col("l_extendedprice").alias("price"), bin_col.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("price").alias("bin_lo"),
            F.max("price").alias("bin_hi"),
        )
    )


# ------------------------------------- exact-moment statistics (corr)


@REG.add(
    "q81_corr_stats",
    """
    WITH b AS (
      SELECT l_returnflag, CAST(FLOOR(l_quantity) AS BIGINT) AS x,
             CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
      FROM lineitem),
    m AS (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
      FROM b GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty,
           sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
             AS stddev_qty,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS corr_qty_price
    FROM m
    """,
    doc="Sample stddev + Pearson correlation per group, computed from "
    "EXACT integer moments (sums of x, y, x², y², xy over integer-"
    "valued columns — quantity and floor-dollars price) and only then "
    "combined in double arithmetic. Native corr()/stddev() stream "
    "incremental float updates whose result depends on row order — "
    "unusable for a hash-compared contract and nondeterministic under "
    "retries at scale; the moment form is one map-side-combinable "
    "shuffle of 7 exact integers per group, order-independent, and "
    "bit-reproducible across engines AND across reruns (the IEEE ops "
    "on the exact moments are the same every time). BIGINT moments "
    "hold to ~10^9 rows of these magnitudes; beyond that switch the "
    "moment sums to DECIMAL(38,0).",
    tags=("agg", "stats", "corr"),
)
def q81_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    # FLOOR on both inputs, not a bare cast: Spark's double→long cast
    # truncates while DuckDB's rounds, so FLOOR is the one spelling
    # with identical semantics in both engines (quantity is
    # integral-valued today, but the contract must not depend on that).
    b = li.select(
        "l_returnflag",
        F.floor("l_quantity").cast("long").alias("x"),
        F.floor("l_extendedprice").cast("long").alias("y"),
    )
    m = b.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_x = nd * sxx - sx * sx
    var_y = nd * syy - sy * sy
    return m.select(
        "l_returnflag",
        "n",
        (sx / nd).alias("mean_qty"),
        F.sqrt(var_x / (nd * (F.col("n") - 1).cast("double"))).alias(
            "stddev_qty"
        ),
        ((nd * sxy - sx * sy) / (F.sqrt(var_x) * F.sqrt(var_y))).alias(
            "corr_qty_price"
        ),
    )


# ------------------------------------- time-bucket rollup + gap fill


@REG.add(
    "q83_date_rollup_gapfill",
    """
    WITH bounds AS (
      SELECT CAST(MIN(l_shipdate) AS DATE) AS lo,
             CAST(MAX(l_shipdate) AS DATE) AS hi FROM lineitem),
    spine AS (
      SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        AS day
      FROM bounds),
    daily AS (
      SELECT CAST(l_shipdate AS DATE) AS day, COUNT(*) AS n_items,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY CAST(l_shipdate AS DATE))
    SELECT s.day, COALESCE(d.n_items, 0) AS n_items,
           COALESCE(d.qty, 0.0) AS qty
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
    doc="Time-bucket rollup with calendar gap-fill (the hypertable/"
    "time_bucket_gapfill shape): aggregate the fact table per day, "
    "then LEFT JOIN a generated contiguous date spine so empty days "
    "surface as explicit zero rows — the form every downstream "
    "time-series consumer (charting, anomaly detection, windowed "
    "models) needs. The fact table shuffles ONCE into the daily "
    "aggregate; the spine is generated from the 1-row min/max bounds "
    "and is calendar-sized (tiny at any fact scale), so the gap-fill "
    "join broadcasts the daily aggregate against it. Quantity sums go "
    "through DECIMAL for exact cross-engine parity.",
    tags=("agg", "timeseries", "gapfill"),
)
def q83_date_rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    daily = li.groupBy(
        F.col("l_shipdate").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)"))
        .cast("double")
        .alias("qty"),
    )
    # spine bounds come from the calendar-sized DAILY aggregate, not a
    # second pass over the fact table. The lazy localCheckpoint pins
    # the aggregate so both consumers (bounds + gap-fill join) share
    # one materialization — without it Catalyst prunes the two branches
    # differently (bounds needs only `day`), the exchanges stop being
    # identical, and the fact table is scanned twice. Tradeoff vs
    # persist(): localCheckpoint CUTS LINEAGE, so an executor loss
    # fails the job instead of recomputing — acceptable for the tiny
    # calendar-sized aggregate (re-run cost ≈ one scan); a
    # fault-tolerant variant would persist(DISK_ONLY) and accept the
    # double-scan risk on eviction.
    daily = daily.localCheckpoint(eager=False)
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n_items", F.lit(0)).alias("n_items"),
            F.coalesce("qty", F.lit(0.0)).alias("qty"),
        )
    )


# --------------------------------------- cohort retention + funnel


@REG.add(
    "q84_retention_cohorts",
    """
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT cohort_day, day_offset, COUNT(*) AS n_users
    FROM activity GROUP BY cohort_day, day_offset
    """,
    doc="Cohort retention matrix: users grouped by first-seen day, "
    "counted distinct on each (cohort, day-offset) cell — the standard "
    "product/engagement retention table. Spark derives the event day "
    "tz-free from the epoch-nanos ts (date_from_unix_date of the "
    "epoch-day quotient — identical to the oracle's wall-clock-as-UTC "
    "CAST(ts AS DATE), never consulting the session timezone, see "
    "catalog.normalize_event_ts). Plan shape: NO self-join — the "
    "cohort day is a min() window over the user_id partition, so the "
    "fact shuffles once by user_id, dedups (cohort, offset) pairs, "
    "and aggregates the tiny matrix. All counts exact.",
    tags=("analytics", "events", "retention"),
)
def q84_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # epoch-nanos → epoch-day → DATE, no timezone anywhere
    day = F.date_from_unix_date(
        F.expr("ts div 86400000000000").cast("int")
    )
    w_user = Window.partitionBy("user_id")
    activity = (
        ev.select("user_id", day.alias("day"))
        .withColumn("cohort_day", F.min("day").over(w_user))
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@REG.add(
    "q85_event_funnel",
    """
    WITH m AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS t_purchase
      FROM events GROUP BY user_id)
    SELECT COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS stage_view,
           COUNT(*) FILTER (WHERE t_view IS NOT NULL
                            AND t_click > t_view) AS stage_click,
           COUNT(*) FILTER (WHERE t_view IS NOT NULL
                            AND t_click > t_view
                            AND t_purchase > t_click) AS stage_purchase
    FROM m
    """,
    doc="Ordered conversion funnel (view → click → purchase): a user "
    "advances a stage only if the next event type FIRST occurs "
    "strictly after the previous stage's first occurrence — the "
    "min-timestamp-per-stage formulation, which needs exactly one "
    "shuffle by user_id and one 1-row final reduce (no window, no "
    "self-join; the naive per-stage join cascade shuffles the fact "
    "once per stage). Stage times compare at MICROSECOND precision "
    "(`ts div 1000`) matching DuckDB's timestamp comparisons exactly "
    "(the q47 as-of lesson: ms truncation disagrees whenever two "
    "events share a millisecond). NULL comparisons are three-valued "
    "in both engines: a missing stage never advances the funnel.",
    tags=("analytics", "events", "funnel"),
)
def q85_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    tus = F.expr("ts div 1000")

    def first_ts(etype: str) -> Column:
        return F.min(F.when(F.col("event_type") == etype, tus))

    m = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    c_view = F.col("t_view").isNotNull()
    c_click = c_view & (F.col("t_click") > F.col("t_view"))
    c_purchase = c_click & (F.col("t_purchase") > F.col("t_click"))
    return m.agg(
        F.sum(c_view.cast("long")).alias("stage_view"),
        F.sum(c_click.cast("long")).alias("stage_click"),
        F.sum(c_purchase.cast("long")).alias("stage_purchase"),
    )


# --------------------------------------------------- unpivot / melt


@REG.add(
    "q86_unpivot",
    """
    WITH wide AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_price,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_disc
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, measure, value
    FROM wide UNPIVOT INCLUDE NULLS
      (value FOR measure IN (sum_qty, sum_price, sum_disc))
    """,
    doc="Unpivot/melt (the inverse of q50's pivot): a wide per-flag "
    "aggregate turns long as (measure, value) rows via the native "
    "DataFrame.unpivot — q50 covers long→wide, this covers wide→long, "
    "completing the reshape surface. The unpivot itself is a zero-"
    "shuffle projection (row explosion of an already-tiny aggregate); "
    "only the upstream groupBy shuffles. Sums go through DECIMAL for "
    "exact parity; DuckDB's UNPIVOT is the oracle, with INCLUDE NULLS "
    "to match DataFrame.unpivot's keep-nulls semantics (DuckDB's "
    "default drops NULL cells — latent divergence if a nullable "
    "measure is ever added; the sums here are never NULL).",
    tags=("reshape", "unpivot"),
)
def q86_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]

    def dsum(c: str) -> Column:
        return F.sum(F.col(c).cast("decimal(18,4)")).cast("double")

    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_discount").alias("sum_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="value",
    )


# --------------------------------------------- robust stats (MAD)


@REG.add(
    "q88_robust_stats",
    """
    WITH med AS (
      SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS m
      FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           ANY_VALUE(m) AS med_qty,
           quantile_cont(abs(l.l_quantity - m), 0.5) AS mad_qty
    FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag
    GROUP BY l.l_returnflag
    """,
    doc="Robust statistics: median absolute deviation per group — "
    "MAD = median(|x - median(x)|), the outlier-resistant spread "
    "measure every data-quality monitor wants next to stddev (q81). "
    "Two-pass by construction: the per-group median (tiny) broadcasts "
    "back over the fact scan, then one aggregate of the absolute "
    "deviations. Interpolated medians are exact in binary here "
    "(quantity values are small integers, deviations land on 0.5 "
    "steps), so Spark percentile == DuckDB quantile_cont bit-exactly, "
    "as q49 already proves for the same column.",
    tags=("agg", "stats", "robust"),
)
def q88_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("m")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("m").alias("med_qty"),
            F.percentile(
                F.abs(F.col("l_quantity") - F.col("m")), 0.5
            ).alias("mad_qty"),
        )
    )
