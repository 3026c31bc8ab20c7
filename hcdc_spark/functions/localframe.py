"""JVM-local DataFrames from driver-side row lists.

``spark.createDataFrame(<python list>)`` backs the frame with an RDD
of PICKLED rows, so every job that touches it — in this codebase,
usually a small metadata/artifact WRITE — runs a Python-worker stage.
Round-14 profiling measured that stage at ~4-5 s per call in this
environment regardless of row count (28-row tombstone appends, the
one-row IVF-PQ meta rewrite that fires per micro-batch in the c20
upsert stream, per-batch staging-pointer appends), against ~0.2-0.5 s
for the same write from a JVM-side frame.

``local_df`` converts through pandas with Arrow FORCED ON for the one
conversion (the driver's plain session has Arrow off by default; the
previous conf value is restored immediately — conversion is eager, so
the override cannot leak). The result plans as a **LocalTableScan**:
data embedded JVM-side, no RDD, no Python stage (plan-gated in
tests/test_plans.py via the takedown id frame).

Scope: flat scalar schemas (long/int/string/…) — exactly the
metadata-row shapes this repo writes. Nested rows (e.g. the CDC event
fixtures' blocks arrays) keep the classic path: they are test/demo
inputs, not per-batch hot writes.

The override touches a SESSION conf for the duration of one eager
conversion, so two threads racing local_df could briefly observe each
other's setting — harmless for correctness (the non-Arrow path
produces the same rows, just slower), and no call site here runs it
from a thread pool (materialize's pointer/registry writes are
deliberately serial; the reconcile cascade loop is serial).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ARROW_KEY = "spark.sql.execution.arrow.pyspark.enabled"


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """A DataFrame over driver-local ``rows`` (iterable of tuples)
    with DDL ``schema``, planned as a LocalTableScan — never a
    Python-RDD scan. Empty ``rows`` yields an empty frame with the
    right schema."""
    import pandas as pd
    from pyspark.sql.types import StructType

    names = [f.name for f in StructType.fromDDL(schema).fields]
    data = [tuple(r) for r in rows]
    if data:
        pdf = pd.DataFrame(data, columns=names, dtype=object)
    else:
        pdf = pd.DataFrame({n: [] for n in names})
    try:
        prev = spark.conf.get(_ARROW_KEY)
    except Exception:
        prev = None
    spark.conf.set(_ARROW_KEY, "true")
    try:
        return spark.createDataFrame(pdf, schema=schema)
    finally:
        if prev is None:
            spark.conf.unset(_ARROW_KEY)
        else:
            spark.conf.set(_ARROW_KEY, prev)
