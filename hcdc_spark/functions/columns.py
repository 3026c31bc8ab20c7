"""Column helpers shared by the query library.

The decimal round-trip (``money_sum``) exists for oracle parity: summing
doubles is order-dependent in IEEE arithmetic, so a Spark sum and a DuckDB
sum of the same column can differ in the last bits. Casting to
DECIMAL(18,6) first makes the aggregation exact (test data carries ≤2
fractional digits), and the final cast back to DOUBLE is correctly rounded
in both engines → bit-identical results. On the Spark side decimal
aggregation stays inside whole-stage codegen (no UDF), so the cost is
negligible relative to the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 6) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def money_sum(col: Column | str, alias: str) -> Column:
    """Exact (decimal) sum of a 2-dp double column, surfaced as DOUBLE."""
    return F.sum(dec(col)).cast("double").alias(alias)


def money_avg(col: Column | str, alias: str) -> Column:
    """Exact-sum / count average, surfaced as DOUBLE.

    avg() return types differ between engines (DuckDB → DOUBLE, Spark →
    wider DECIMAL), so build it from the exact decimal sum instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


def oracle_money_sum(expr: str, alias: str) -> str:
    """DuckDB-side rendering of money_sum over SQL expression ``expr``."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def oracle_money_avg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
