"""Control-plane CLI (SURVEY §2A C5).

The reference exposes agent start/stop/snapshot/filter CRUD through a
Spring Boot REST service (services/.../SnapshotService.java:26-176,
EditsLogReaderService.java:21-73). A Spark engine's control plane is
the driver process itself, so the surface is a CLI of batch jobs:

    python -m hcdc_spark.cli bootstrap  --source <dir> --out <dir>
    python -m hcdc_spark.cli reconcile  --events <parquet> --out <dir>
    python -m hcdc_spark.cli pipeline   --segments <dir> --out <dir> \
        --rules <csv> --staging <dir> [--checkpoint <dir>]
    python -m hcdc_spark.cli compact    --out <dir> [--delta-min-tx N]
    python -m hcdc_spark.cli gc-staging --staging <dir>

Each command is a thin wrapper over a library function, so everything
is equally scriptable from a notebook or Airflow DAG.
"""

from __future__ import annotations

import argparse
import os
import sys


def _spark(app: str):
    from hcdc_spark.session import get_spark

    s = get_spark(app)
    s.sparkContext.setLogLevel("WARN")
    return s


def cmd_bootstrap(args) -> int:
    from hcdc_spark.cdc.reconcile import reconcile_batch
    from hcdc_spark.cdc.snapshot import bootstrap_from_listing

    spark = _spark("hcdc-bootstrap")
    ev = bootstrap_from_listing(spark, args.source, base_tx=args.base_tx)
    state = reconcile_batch(ev, expand_dirs=False).drop("errors")
    state.write.mode("overwrite").parquet(
        os.path.join(args.out, "file_state_log")
    )
    n = spark.read.parquet(os.path.join(args.out, "file_state_log")).count()
    print(f"bootstrapped {n} files from {args.source}")
    return 0


def cmd_reconcile(args) -> int:
    from hcdc_spark.cdc.reconcile import reconcile_batch, reconcile_errors

    spark = _spark("hcdc-reconcile")
    events = spark.read.parquet(args.events)
    state = reconcile_batch(events)
    state.drop("errors").write.mode("overwrite").parquet(
        os.path.join(args.out, "file_state_log")
    )
    errs = reconcile_errors(state)
    if not errs.isEmpty():
        errs.write.mode("overwrite").parquet(os.path.join(args.out, "errors"))
    print(f"reconciled -> {args.out}")
    return 0


def cmd_pipeline(args) -> int:
    from hcdc_spark.cdc.registry import load_rules_csv
    from hcdc_spark.streaming.pipeline import run_cdc_pipeline

    spark = _spark("hcdc-pipeline")
    rules = load_rules_csv(spark, args.rules)
    q = run_cdc_pipeline(
        spark,
        source_dir=args.segments,
        out_dir=args.out,
        checkpoint_dir=args.checkpoint or os.path.join(args.out, "_ckpt"),
        rules=rules,
        staging_dir=args.staging,
        registry_dir=args.schema_registry,
        available_now=not args.continuous,
    )
    q.awaitTermination()
    print(f"pipeline drained -> state {args.out}, staging {args.staging}")
    return 0


def cmd_compact(args) -> int:
    from hcdc_spark.cdc.maintenance import compact_state_log

    spark = _spark("hcdc-compact")
    n = compact_state_log(
        spark, args.out, drop_deleted=not args.keep_deleted,
        delta_min_tx=args.delta_min_tx,
    )
    print(f"compacted state log to {n} rows")
    return 0


def cmd_gc_staging(args) -> int:
    from hcdc_spark.cdc.maintenance import gc_change_data

    spark = _spark("hcdc-gc")
    n = gc_change_data(spark, args.staging)
    print(f"gc kept {n} live pointers")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="hcdc_spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("bootstrap", help="fsimage-style bootstrap from a listing")
    b.add_argument("--source", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--base-tx", type=int, default=0)
    b.set_defaults(fn=cmd_bootstrap)

    r = sub.add_parser("reconcile", help="batch-replay an event log")
    r.add_argument("--events", required=True)
    r.add_argument("--out", required=True)
    r.set_defaults(fn=cmd_reconcile)

    pl = sub.add_parser("pipeline", help="run the full CDC streaming pipeline")
    pl.add_argument("--segments", required=True)
    pl.add_argument("--out", required=True)
    pl.add_argument("--rules", required=True, help="domain;entity;path;regex CSV")
    pl.add_argument("--staging")
    pl.add_argument("--schema-registry")
    pl.add_argument("--checkpoint")
    pl.add_argument("--continuous", action="store_true",
                    help="keep running instead of draining (availableNow)")
    pl.set_defaults(fn=cmd_pipeline)

    c = sub.add_parser("compact", help="compact the file_state log")
    c.add_argument("--out", required=True)
    c.add_argument("--keep-deleted", action="store_true")
    c.add_argument("--delta-min-tx", type=int)
    c.set_defaults(fn=cmd_compact)

    g = sub.add_parser("gc-staging", help="drop superseded staging batches")
    g.add_argument("--staging", required=True)
    g.set_defaults(fn=cmd_gc_staging)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
