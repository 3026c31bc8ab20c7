"""Local replica of the external driver's correctness harness.

Runs the first N registry entries (default 50 — the driver's budget)
through ``__spark_entry__`` with a PLAIN SparkSession and compares each
against its DuckDB oracle exactly the way the driver does: row count,
normalized schema (type-sensitive — decimals/hugeint are automatic
mismatches), and order-insensitive canonicalized values.

Usage: python scripts/run_driver_contract.py [N] [name ...]
Data dir defaults to /root/testdata/sf0.01; override with
HCDC_CONTRACT_SF_DIR. The repo root is derived from this file's path.
"""

from __future__ import annotations

import datetime
import math
import os
import pathlib
import re
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

NORM = {"bigint": "int", "int": "int", "integer": "int", "smallint": "int",
        "tinyint": "int", "double": "f64", "float": "f32", "string": "str",
        "varchar": "str", "date": "date", "boolean": "bool"}
BANNED = re.compile(r"decimal|hugeint|int128")


def norm_type(t: str) -> str:
    t = str(t).strip().lower()
    if t.startswith("timestamp"):
        return "ts"
    m = re.fullmatch(r"(\w+)\[\]", t)
    if m:
        return f"array<{norm_type(m.group(1))}>"
    m = re.fullmatch(r"array<(.+)>", t)
    if m:
        return f"array<{norm_type(m.group(1))}>"
    return NORM.get(t, t)


def canon(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    limit = int(args[0]) if args and args[0].isdigit() else 50
    only = set(args[1:]) if args and args[0].isdigit() else set(args)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    con = duckdb.connect()
    sf = os.environ.get("HCDC_CONTRACT_SF_DIR", "/root/testdata/sf0.01")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )

    qs, os_ = E.queries(), E.oracle_sql()
    names = [n for n in list(qs)[:limit] if not only or n in only]
    if only:
        # a requested name outside the prefix (or misspelled) must be a
        # loud error, not a silent "mismatches: 0"
        missing = sorted(only - set(names))
        if missing:
            print(f"ERROR: not in the first {limit} registry entries: "
                  f"{missing}")
            return 2
    bad = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf)
            scols = [f.name for f in sdf.schema.fields]
            stypes = {f.name: norm_type(f.dataType.simpleString())
                      for f in sdf.schema.fields}
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001 — harness surface
            print(f"{name} SPARK-ERROR {type(exc).__name__}: {exc}")
            bad += 1
            continue
        if name not in os_:
            print(f"{name} rows-only {len(srows)} "
                  f"[{time.time() - t0:.1f}s]")
            continue
        try:
            rel = con.sql(os_[name])
            dcols = list(rel.columns)
            dtypes = {c: norm_type(t) for c, t in zip(rel.columns, rel.types)}
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"{name} ORACLE-ERROR {type(exc).__name__}: {exc}")
            bad += 1
            continue
        so = sorted(range(len(scols)), key=lambda i: scols[i])
        do = sorted(range(len(dcols)), key=lambda i: dcols[i])
        s = sorted(tuple(canon(r[i]) for i in so) for r in srows)
        d = sorted(tuple(canon(r[i]) for i in do) for r in drows)
        type_ok = (stypes == dtypes
                   and not any(BANNED.search(t) for t in stypes.values())
                   and not any(BANNED.search(t) for t in dtypes.values()))
        ok = sorted(scols) == sorted(dcols) and s == d and type_ok
        why = ""
        if not type_ok:
            why = f" TYPE {stypes} vs {dtypes}"
        elif sorted(scols) != sorted(dcols):
            why = f" COLS {sorted(scols)} vs {sorted(dcols)}"
        elif len(s) != len(d):
            why = f" ROWS {len(s)} vs {len(d)}"
        elif s != d:
            diff = next(i for i, (a, b) in enumerate(zip(s, d)) if a != b)
            why = f" VALUES first-diff@{diff}: {s[diff]} vs {d[diff]}"
        print(f"{name} {'OK' if ok else 'MISMATCH' + why} {len(s)} "
              f"[{time.time() - t0:.1f}s]")
        bad += 0 if ok else 1
    print("mismatches:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
