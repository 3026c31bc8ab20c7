"""State maintenance jobs (SURVEY §2A T27).

The reference garbage-collects Deleted file-state nodes and compacts
aged per-tx deltas inside ZooKeeper (CDCChangeDeltaProcessor.
cleanFileState, pipeline/CDCChangeDeltaProcessor.java:122-138;
FileStateHelper.compact, FileStateHelper.java:250-274). Here state is
an append-only parquet log, so maintenance is batch rewrites:

- ``compact_state_log`` — fold the log to latest-per-inode (the same
  window ``latest_state`` applies at read time), optionally dropping
  Deleted rows and aged per-tx deltas. Run OFFLINE (no concurrent
  streaming writer): the implementation stages the compacted log and
  swaps directories. On a real deployment this is a Delta/Iceberg
  rewrite/expire operation; the parquet-directory swap is the
  dependency-free equivalent.
- ``gc_change_data`` — drop superseded pointer rows and delete staging
  batch directories no pointer references (the byte-level analogue of
  deleting replaced block files).

Storage-scheme-safe (round-13 verdict #1, applied to the T27 legs the
index takedown inherited its discipline from): all existence/list/
delete calls route through the Hadoop FS API (hcdc_spark.fsutil), and
the rename-as-commit directory swaps are fenced to atomic-rename
filesystems (file:/hdfs:) — on object storage these jobs are the
table format's rewrite/expire operations, and the fence says so
instead of half-running a copy+delete "rename".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hcdc_spark import fsutil


def compact_state_log(
    spark: SparkSession,
    out_dir: str,
    drop_deleted: bool = True,
    delta_min_tx: int | None = None,
) -> int:
    """Rewrite the state log to one row per inode. Returns row count.

    ``delta_min_tx``: drop per-block tx deltas at or below this txid
    (the reference's age-based compaction, keyed by tx instead of
    wall-clock so it is deterministic and replay-safe).
    """
    log_path = fsutil.join(out_dir, "file_state_log")
    fsutil.require_atomic_rename(log_path, "compact_state_log")
    log = spark.read.parquet(log_path)
    # The streaming reconciler stamps batch_id; batch outputs written by
    # the CLI's bootstrap/reconcile commands don't carry it — compaction
    # must work on both (review r4: compact after reconcile crashed).
    if "batch_id" not in log.columns:
        log = log.withColumn("batch_id", F.lit(0).cast("long"))
    w = Window.partitionBy("inode_id").orderBy(
        F.col("batch_id").desc(), F.col("last_tx_id").desc()
    )
    latest = (
        log.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if drop_deleted:
        latest = latest.where(F.col("state") != "Deleted")
    if delta_min_tx is not None:
        latest = latest.withColumn(
            "blocks",
            F.transform(
                "blocks",
                lambda b: b.withField(
                    "deltas",
                    F.filter(
                        b["deltas"], lambda d: d["tx_id"] > F.lit(delta_min_tx)
                    ),
                ),
            ),
        )
    tmp = log_path + ".compact"
    latest.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    old = log_path + ".old"
    fsutil.rename(log_path, old)
    fsutil.rename(tmp, log_path)
    fsutil.delete(old)
    return n


def gc_change_data(spark: SparkSession, staging_dir: str) -> int:
    """Drop superseded pointers; delete unreferenced batch dirs.
    Returns the number of live pointer rows."""
    ptr_path = fsutil.join(staging_dir, "change_data")
    fsutil.require_atomic_rename(ptr_path, "gc_change_data")
    ptr = spark.read.parquet(ptr_path)
    # batch_tag desc as tie-breaker: re-materializations of the same
    # file carry the same last_tx_id, and the kept pointer must be the
    # one read_entity serves (same ordering, materialize.read_entity).
    w = Window.partitionBy("src_path").orderBy(
        F.col("last_tx_id").desc(), F.col("batch_tag").desc()
    )
    live = (
        ptr.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    tmp = ptr_path + ".compact"
    live.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()

    live_batches = {
        (r["domain"], r["entity"], r["batch_tag"])
        for r in spark.read.parquet(tmp)
        .select("domain", "entity", "batch_tag")
        .distinct()
        .collect()
    }
    data_root = fsutil.join(staging_dir, "data")
    if fsutil.is_dir(data_root):
        for domain in fsutil.list_names(data_root):
            dpath = fsutil.join(data_root, domain)
            for entity in fsutil.list_names(dpath):
                epath = fsutil.join(dpath, entity)
                for batch in fsutil.list_names(epath):
                    if not batch.startswith("batch="):
                        continue
                    tag = batch.split("=", 1)[1]
                    if (domain, entity, tag) not in live_batches:
                        fsutil.delete(fsutil.join(epath, batch))

    old = ptr_path + ".old"
    fsutil.rename(ptr_path, old)
    fsutil.rename(tmp, ptr_path)
    fsutil.delete(old)
    return n
