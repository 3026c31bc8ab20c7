"""Relational operator surface (SURVEY.md §2B) as named queries.

Each query exercises one operator family over the driver's TPC-H-ish
tables and carries an equivalent DuckDB oracle. The Spark side is written
with the DataFrame API (declarative → Catalyst chooses the physical plan:
broadcast joins for dims, partial aggregation, pushdown). The reference
system has no relational engine of its own — it delegates analytics on
its CDC outputs to external readers (SURVEY.md §0, §2B); Spark SQL *is*
that surface here.

Scale notes are inline per query; the general posture:
- joins to `region/nation/supplier/part` must broadcast (dims grow
  sublinearly; never shuffle the fact side for them);
- aggregations rely on partial (map-side) agg — grouping keys here are
  low-cardinality, so the shuffle carries only partial states;
- window functions partition by high-cardinality keys (custkey/user_id)
  → shuffle is unavoidable but balanced; no global single-partition
  windows anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hcdc_spark.catalog import load_tables
from hcdc_spark.functions.columns import (
    dec,
    exact_money_summary,
    money_avg,
    money_sum,
    oracle_money_avg,
    oracle_money_sum,
)
from hcdc_spark.registry import Registry

REG = Registry()


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    dfs = load_tables(spark, sf_dir, names)
    return [dfs[n] for n in names]


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------

@REG.add(
    "q01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_money_sum('l_quantity', 'sum_qty')},
           {oracle_money_sum('l_extendedprice', 'sum_base_price')},
           {oracle_money_sum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {oracle_money_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {oracle_money_avg('l_quantity', 'avg_qty')},
           {oracle_money_avg('l_extendedprice', 'avg_price')},
           {oracle_money_avg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: hash agg w/ partial+final, "
    "sum/avg/count over arithmetic expressions.",
    tags=("agg",),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    flt = li.where(
        F.col("l_shipdate").cast("date") <= F.lit("2000-12-01").cast("date")
    )
    # exact_money_summary = decimal-exact sums on an all-long hot path
    # (2-level cascade; see functions/columns.py) — ~3x faster than
    # per-row DECIMAL aggregation on the full fact table.
    return exact_money_summary(
        flt,
        keys=["l_returnflag", "l_linestatus"],
        sums={
            "sum_qty": "l_quantity",
            "sum_base_price": "l_extendedprice",
            "sum_disc_price": "l_extendedprice * (1 - l_discount)",
            "sum_charge": (
                "l_extendedprice * (1 - l_discount) * (1 + l_tax)"
            ),
        },
        avgs={
            "avg_qty": "l_quantity",
            "avg_price": "l_extendedprice",
            "avg_disc": "l_discount",
        },
        count_alias="count_order",
    )


@REG.add(
    "q02_filter_project",
    """
    SELECT p_partkey, p_name, p_brand, p_type, p_size,
           CAST(CAST(p_retailprice AS DECIMAL(18,6)) AS DOUBLE) AS retail_dec
    FROM part
    WHERE p_type IN ('PROMO', 'ECONOMY')
      AND p_size BETWEEN 10 AND 40
      AND p_name LIKE '%e%'
      AND p_brand IS NOT NULL
    """,
    doc="Scan + projection + predicate mix (IN / BETWEEN / LIKE / IS NOT "
    "NULL). All four predicates reach the parquet scan via pushdown.",
    tags=("filter", "scan"),
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.where(
            F.col("p_type").isin("PROMO", "ECONOMY")
            & F.col("p_size").between(10, 40)
            & F.col("p_name").like("%e%")
            & F.col("p_brand").isNotNull()
        )
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            # Surface as DOUBLE: the driver's value-hash is sensitive to
            # the output type, and raw DECIMAL reprs diverge from DuckDB.
            dec("p_retailprice").cast("double").alias("retail_dec"),
        )
    )


@REG.add(
    "q10_agg_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_distinct_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="count(distinct) expansion (Catalyst rewrites to two-phase "
    "agg) + sum(distinct) over decimal.",
    tags=("agg",),
)
def q10_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.sum_distinct(dec("l_quantity")).cast("double").alias("sum_distinct_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@REG.add(
    "q11_rollup",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP grouping sets with GROUPING() discriminators.",
    tags=("agg", "grouping-sets"),
)
def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("sum_price"),
        )
    )


@REG.add(
    "q12_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets. Two-phase: the fact table is first "
    "aggregated on the base keys (one shuffle with map-side partial "
    "agg), then CUBE runs over the tiny per-key aggregate — Spark's "
    "Expand operator otherwise quadruples every fact row before the "
    "shuffle, which at 100 TB is 4x scan-side shuffle volume for "
    "identical results (COUNT/SUM are re-aggregable; DECIMAL sums are "
    "exact-associative; n_items takes coalesce(sum,0) so the empty-input "
    "grand-total row still reads COUNT(*)=0 like the one-phase form).",
    tags=("agg", "grouping-sets"),
)
def q12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec("l_quantity")).alias("_sq"),
    )
    return base.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.coalesce(F.sum("_n"), F.lit(0)).alias("n_items"),
        F.sum("_sq").cast("double").alias("sum_qty"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@REG.add(
    "q03_join_topn_revenue",
    """
    SELECT o.o_orderkey, c.c_mktsegment,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus <> 'F'
    GROUP BY o.o_orderkey, c.c_mktsegment
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style join+agg+top-N. customer joins broadcast "
    "(small side); top-N via TakeOrderedAndProject, no global sort.",
    tags=("join", "topn"),
)
def q03_join_topn_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders.where(F.col("o_orderstatus") != "F"),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "c_mktsegment")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
                "revenue",
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@REG.add(
    "q04_left_outer_join",
    """
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))), 0) AS DOUBLE) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    doc="Left outer join preserving customers with zero orders "
    "(COUNT over the null-extended side).",
    tags=("join",),
)
def q04_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0))
            .cast("double")
            .alias("total_spent"),
        )
    )


@REG.add(
    "q05_star_join",
    """
    SELECT n.n_name, r.r_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name, r.r_name
    """,
    doc="TPC-H Q5-style 5-way star join. nation/region/customer "
    "broadcast; only the lineitem↔orders join shuffles. The region "
    "filter prunes before the join (Catalyst pushes it through).",
    tags=("join", "broadcast"),
)
def q05_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, customer, nation, region = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name").isin("ASIA", "EUROPE"))),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name", "r_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@REG.add(
    "q06_semi_join",
    """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    doc="Left-semi join (EXISTS). The semi side reduces to its join key "
    "→ broadcastable at any SF after dedup.",
    tags=("join",),
)
def q06_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return customer.join(
        orders.where(F.col("o_orderstatus") == "F"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_semi",
    ).select("c_custkey", "c_mktsegment")


@REG.add(
    "q07_anti_join",
    """
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS): customers that never ordered.",
    tags=("join",),
)
def q07_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@REG.add(
    "q08_theta_join",
    """
    SELECT p.p_brand,
           COUNT(*) AS n_small_lots,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND l.l_quantity < p.p_size
    GROUP BY p.p_brand
    """,
    doc="Equi + theta (range) join condition: quantity below part size. "
    "The equi part drives the join strategy (broadcast hash on part); "
    "the range predicate evaluates as a post-join filter.",
    tags=("join", "theta"),
)
def q08_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        li.join(
            F.broadcast(part),
            (F.col("l_partkey") == F.col("p_partkey"))
            & (F.col("l_quantity") < F.col("p_size")),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_lots"),
            money_sum("l_extendedprice", "sum_price"),
        )
    )


@REG.add(
    "q09_cross_join",
    """
    SELECT r.r_name, s.status, CONCAT(r.r_name, '/', s.status) AS combo
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
    """,
    doc="Cross join of two tiny relations (cartesian of dims).",
    tags=("join", "cross"),
)
def q09_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, orders = _t(spark, sf_dir, "region", "orders")
    statuses = orders.select(
        F.col("o_orderstatus").alias("status")
    ).distinct()
    return region.crossJoin(statuses).select(
        "r_name",
        "status",
        F.concat(F.col("r_name"), F.lit("/"), F.col("status")).alias("combo"),
    )


# --------------------------------------------------------------------------
# Windows
# --------------------------------------------------------------------------

@REG.add(
    "q13_window_rank",
    """
    SELECT * FROM (
      SELECT o_orderkey, o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DOUBLE) AS price_dec,
             ROW_NUMBER() OVER w AS rn,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk,
             NTILE(4) OVER w AS quartile
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 5
    """,
    doc="Ranking window functions + top-k per group (T4-style dedup "
    "pattern generalized). Deterministic via o_orderkey tiebreak.",
    tags=("window",),
)
def q13_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderkey",
            "o_orderstatus",
            dec("o_totalprice").cast("double").alias("price_dec"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .where(F.col("rn") <= 5)
    )


@REG.add(
    "q14_window_analytic",
    """
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DOUBLE) AS price_dec,
           CAST(LAG(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS prev_price,
           CAST(LEAD(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS next_price,
           CAST(FIRST_VALUE(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS first_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Analytic window functions (lag/lead/first_value) + moving frame "
    "aggregate. Partitioned by custkey — scales with key cardinality.",
    tags=("window",),
)
def q14_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(-2, 0)
    price = dec("o_totalprice")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        price.cast("double").alias("price_dec"),
        F.lag(price).over(w).cast("double").alias("prev_price"),
        F.lead(price).over(w).cast("double").alias("next_price"),
        F.first(price).over(w).cast("double").alias("first_price"),
        F.sum(price).over(wf).cast("double").alias("moving_sum3"),
    )


# --------------------------------------------------------------------------
# Sort / limit / set ops
# --------------------------------------------------------------------------

@REG.add(
    "q15_sort_limit",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,6)) AS DOUBLE) AS price_dec
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
    doc="Global top-k: Catalyst compiles ORDER BY+LIMIT to "
    "TakeOrderedAndProject (per-partition heap + driver merge), never "
    "a full sort.",
    tags=("sort",),
)
def q15_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            dec("l_extendedprice").cast("double").alias("price_dec"),
        )
        .limit(20)
    )


@REG.add(
    "q16_set_ops",
    """
    WITH o_cust AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'),
         f_cust AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
    SELECT 'both' AS bucket, custkey FROM (SELECT custkey FROM o_cust INTERSECT SELECT custkey FROM f_cust)
    UNION ALL
    SELECT 'open_only' AS bucket, custkey FROM (SELECT custkey FROM o_cust EXCEPT SELECT custkey FROM f_cust)
    UNION ALL
    SELECT 'finished_only' AS bucket, custkey FROM (SELECT custkey FROM f_cust EXCEPT SELECT custkey FROM o_cust)
    """,
    doc="INTERSECT / EXCEPT / UNION ALL over key sets (row-level delta "
    "computation — the Spark-native analogue of the reference's "
    "change-set subtraction, SURVEY §2A-T15).",
    tags=("setops",),
)
def q16_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    # Each distinct key-set feeds TWO set-op arms; left lazy, every arm
    # re-derives its inputs from the fact table — 6 parquet scans and 6
    # distinct-aggregate exchanges for 2 distinct sets (Catalyst cannot
    # reuse the exchanges: intersect and exceptAll compile the shared
    # subtree into differently-shaped aggregates). Materialize each set
    # once (one scan + one distinct each) and run the three set ops on
    # the collapsed key frames — at any corpus scale that is 4 fewer
    # full passes over the fact table for identical results.
    o_cust = (
        orders.where(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    f_cust = (
        orders.where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    tag = lambda df, name: df.select(  # noqa: E731
        F.lit(name).alias("bucket"), "custkey"
    )
    return (
        tag(o_cust.intersect(f_cust), "both")
        .unionAll(tag(o_cust.exceptAll(f_cust), "open_only"))
        .unionAll(tag(f_cust.exceptAll(o_cust), "finished_only"))
    )


# --------------------------------------------------------------------------
# Scalar function families
# --------------------------------------------------------------------------

@REG.add(
    "q17_string_functions",
    """
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_name, 1, 3) AS name_pfx,
           SPLIT_PART(p_name, ' ', 1) AS first_word,
           REGEXP_EXTRACT(p_name, '([a-z]+)$', 1) AS last_word,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
           CONCAT_WS('|', p_brand, p_type) AS brand_type,
           REPLACE(p_type, 'PROMO', 'PROMOTION') AS type_full,
           LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded
    FROM part
    """,
    doc="String function family: case, length, substring, split, regex "
    "extract/replace, concat, pad. All JVM-side builtins (codegen).",
    tags=("scalar", "string"),
)
def q17_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 3).alias("name_pfx"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit("PROMO"), F.lit("PROMOTION")).alias(
            "type_full"
        ),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
    )


@REG.add(
    "q18_datetime_functions",
    """
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           EXTRACT(YEAR FROM o_orderdate) AS order_year,
           EXTRACT(MONTH FROM o_orderdate) AS order_month,
           EXTRACT(QUARTER FROM o_orderdate) AS order_quarter,
           EXTRACT(DOW FROM o_orderdate) AS order_dow,
           COUNT(*) AS n_orders
    FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) BETWEEN 1996 AND 1999
    GROUP BY 1, 2, 3, 4, 5
    """,
    doc="Date/time extraction + grouping by calendar parts. DOW "
    "normalized to DuckDB's 0=Sunday convention.",
    tags=("scalar", "datetime"),
)
def q18_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return (
        orders.where(F.year(od).between(1996, 1999))
        .groupBy(
            od.cast("date").alias("order_date"),
            F.year(od).cast("long").alias("order_year"),
            F.month(od).cast("long").alias("order_month"),
            F.quarter(od).cast("long").alias("order_quarter"),
            (F.dayofweek(od) - 1).cast("long").alias("order_dow"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@REG.add(
    "q19_conditional",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 5000 THEN 'regular'
                ELSE 'premium' END AS balance_band,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_alias,
           CAST(CAST(GREATEST(c_acctbal, 0.0) AS DECIMAL(18,6)) AS DOUBLE) AS floored_bal,
           CAST(CAST(LEAST(c_acctbal, 1000.0) AS DECIMAL(18,6)) AS DOUBLE) AS capped_bal
    FROM customer
    """,
    doc="Conditional expressions: CASE/WHEN, COALESCE, NULLIF, "
    "GREATEST/LEAST.",
    tags=("scalar", "conditional"),
)
def q19_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return customer.select(
        "c_custkey",
        F.when(bal < 0, "overdrawn")
        .when(bal < 5000, "regular")
        .otherwise("premium")
        .alias("balance_band"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("segment_alias"),
        dec(F.greatest(bal, F.lit(0.0))).cast("double").alias("floored_bal"),
        dec(F.least(bal, F.lit(1000.0))).cast("double").alias("capped_bal"),
    )


@REG.add(
    "q20_json_extract",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
    doc="JSON field extraction from a string payload column (the "
    "reference's schema-on-read JSON path, SURVEY §2A-T20/T21) + agg.",
    tags=("scalar", "json"),
)
def q20_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.select(
            (F.get_json_object("props", "$.k").cast("bigint") % 10).alias(
                "k_bucket"
            ),
            "value",
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value", "sum_value"),
        )
    )


@REG.add(
    "q21_hash_functions",
    """
    SELECT c_custkey,
           md5(CONCAT(c_name, '|', c_mktsegment)) AS row_md5
    FROM customer
    WHERE c_custkey % 7 = 0
    """,
    doc="Deterministic row hashing via md5 (reference checksum "
    "semantics, SURVEY §2A-C7).",
    tags=("scalar", "hash"),
)
def q21_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = _t(spark, sf_dir, "customer")
    return customer.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.md5(
            F.concat(F.col("c_name"), F.lit("|"), F.col("c_mktsegment"))
        ).alias("row_md5"),
    )


@REG.add(
    "q22_explode_wordcount",
    """
    SELECT word, COUNT(*) AS n
    FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 50
    """,
    doc="Array split + explode (lateral) + count: word frequency over "
    "the documents corpus. Deterministic top-50 via (count, word) order.",
    tags=("array", "explode", "text"),
)
def q22_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Subqueries
# --------------------------------------------------------------------------

@REG.add(
    "q23_scalar_subquery",
    """
    WITH brand_agg AS (
      SELECT p_brand AS b_brand,
             SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS sum_dec,
             COUNT(*) AS n_parts
      FROM part GROUP BY p_brand
    )
    SELECT p.p_partkey, p.p_brand,
           CAST(CAST(p.p_retailprice AS DECIMAL(18,6)) AS DOUBLE) AS price_dec
    FROM part p JOIN brand_agg b ON p.p_brand = b.b_brand
    WHERE CAST(p.p_retailprice AS DECIMAL(18,6)) * b.n_parts > b.sum_dec
    """,
    doc="Correlated-scalar-subquery semantics (above-brand-average "
    "parts), decorrelated into an aggregate + broadcast join. The "
    "comparison is price*count > sum — exact decimal arithmetic, so "
    "the engine and the oracle agree on boundary rows.",
    tags=("subquery",),
)
def q23_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    brand_agg = part.groupBy(F.col("p_brand").alias("b_brand")).agg(
        F.sum(dec("p_retailprice")).alias("sum_dec"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        part.join(
            F.broadcast(brand_agg), F.col("p_brand") == F.col("b_brand")
        )
        .where(dec("p_retailprice") * F.col("n_parts") > F.col("sum_dec"))
        .select(
            "p_partkey",
            "p_brand",
            dec("p_retailprice").cast("double").alias("price_dec"),
        )
    )
