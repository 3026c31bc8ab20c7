"""Interactive optimization REPL bootstrap (not part of the engine).

python -i scripts/_repl_init.py  →  spark session + helpers:
  t(name, n=3)   min-of-n wall seconds for a registry query via noop sink
  tdf(df, n=3)   min-of-n wall seconds for an arbitrary DataFrame
  ex(df)         print explain("formatted")
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hcdc_spark.session import get_spark

spark = get_spark("hcdc-opt-repl")
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry_mod

QS = entry_mod.queries()
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def tdf(df_fn, n=3, label=None):
    best = None
    for i in range(n):
        df = df_fn() if callable(df_fn) else df_fn
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
        print(f"  {label or ''} run{i}: {el:.3f}s")
    print(f"  {label or ''} min: {best:.3f}s")
    return best


def t(name, n=3):
    return tdf(lambda: QS[name](spark, SF), n=n, label=name)


def ex(df):
    print(
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    )


print("ready: t(name), tdf(df), ex(df); SF=", SF)
