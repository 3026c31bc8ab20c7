"""hcdc_spark — a PySpark-native analytics & CDC engine.

A from-scratch re-expression of the capabilities of the reference system
(subhagho/hcdc, a Hadoop CDC framework — see SURVEY.md) on top of Apache
Spark: the CDC dataflow (change-event model, stateful per-file
reconciliation, entity registry, materialization, snapshot/backfill) runs
on DataFrames + Structured Streaming, and the analytic surface over the
materialized tables is Spark SQL.

Design stance (SURVEY.md §7): declarative DataFrame plans everywhere so
Catalyst/Tungsten pick the physical strategy; state machines via
``applyInPandasWithState``; Python only in Arrow-batched UDFs; no RDDs.
"""

__version__ = "0.1.0"

from hcdc_spark.session import get_spark  # noqa: F401
from hcdc_spark.catalog import TABLES, load_tables, register_views  # noqa: F401
