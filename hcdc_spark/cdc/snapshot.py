"""Snapshot & backfill (SURVEY §2A S1/T22/T23).

Three batch jobs closing the CDC loop:

- ``bootstrap_from_listing`` — the fsimage bootstrap (S1): the
  reference dumps the NameNode fsimage to XML, parses inodes, and
  seeds file/block state (NameNodeReplicator.java:98-190). Spark-first:
  a ``binaryFile`` listing *is* the inode table; each file becomes a
  synthetic CLOSE event (mode=Snapshot) that the ordinary reconciler
  folds — no separate bootstrap code path through the state machine.
- ``generate_snapshot`` — T22: current file_state → synthetic CLOSE
  events carrying all blocks (HDFSSnapshotProcessor.generateSnapshot,
  namenode-agent/.../namenode/HDFSSnapshotProcessor.java:288-337). Used
  when a new domain filter registers and already-existing files must
  flow downstream (FilterAddCallback → snapshot, :396-430).
- ``backlog_events`` — T23: files whose live tx advanced past the
  snapshot tx get a Backlog CLOSE covering ``(snapshot_tx, last_tx]``
  with the T16-compressed per-block intervals
  (HDFSSnapshotProcessor.snapshotDone, :234-286;
  SourceChangeDeltaProcessor.buildBacklogTransactions, :178-211).

All three are set-based single-pass DataFrame transforms: at 10^9 files
the bootstrap is one distributed listing + projection, and snapshot/
backlog generation is a scan of the state table — no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hcdc_spark.cdc.model import CHANGE_EVENT_SCHEMA

def _ext_type():
    return (
        F.when(F.col("_ext") == "csv", "CSV")
        .when(F.col("_ext").isin("json", "jsonl", "ndjson"), "JSON")
        .when(F.col("_ext") == "parquet", "PARQUET")
        .when(F.col("_ext") == "avro", "AVRO")
        .when(F.col("_ext") == "orc", "ORC")
        .otherwise("UNKNOWN")
    )


def contiguous_rank(df: DataFrame, order_col: str) -> DataFrame:
    """Append ``_rank``: a globally contiguous 1-based rank by
    ``order_col`` — computed DISTRIBUTED, not via the single-task
    ``Window.orderBy`` global window (which funnels every row through
    one partition; at the advertised 10^9-file bootstrap scale that
    serializes or OOMs — review r4; detect_tx_gaps documents the same
    trap). Shape: range-partition by the key, rank within partitions,
    add per-partition offsets (a partition-count-sized driver list).
    The range partitioning is pinned with an eager localCheckpoint so
    the offset pass and the final pass see identical partitions."""
    from pyspark.sql import Window

    n = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    parted = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    local = parted.withColumn("_lrank", F.row_number().over(w))
    counts = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    from hcdc_spark.functions.localframe import local_df

    off_df = local_df(
        df.sparkSession, offsets or [(0, 0)], "_pid int, _off long"
    )
    return (
        local.join(F.broadcast(off_df), "_pid", "left")
        .withColumn(
            "_rank", F.col("_lrank") + F.coalesce(F.col("_off"), F.lit(0))
        )
        .drop("_pid", "_lrank", "_off")
    )


def bootstrap_from_listing(
    spark: SparkSession,
    path_glob: str,
    namespace: str = "ns1",
    base_tx: int = 0,
    block_size: int = 128 << 20,
) -> DataFrame:
    """Distributed listing → synthetic Snapshot CLOSE events.

    Inode ids are synthesized as a 63-bit hash of the path (stable,
    collision-checked by the reconciler's duplicate-block guard);
    tx ids are ``base_tx`` + the file's rank so the log is contiguous.
    One block per file models the data extent (offsets [0, len-1]) —
    at file granularity that is all downstream consumers need.
    """
    listing = (
        spark.read.format("binaryFile")
        # listing only: never read file contents into the plan
        .option("pathGlobFilter", "*")
        .load(path_glob)
        .select("path", "length", "modificationTime")
    )
    ranked = contiguous_rank(listing, "path")
    ev = ranked.select(
        (F.lit(base_tx) + F.col("_rank")).alias("tx_id"),
        F.lit("CLOSE").alias("op"),
        F.unix_millis("modificationTime").alias("ts"),
        F.lit(namespace).alias("namespace"),
        F.regexp_replace("path", r"^[a-zA-Z0-9]+:/+", "/").alias("path"),
        (F.abs(F.xxhash64("path")) % F.lit(1 << 62)).alias("inode_id"),
        F.lit(None).cast("string").alias("dest_path"),
        F.lit(None).cast("string").alias("rename_opts"),
        F.col("length").alias("length"),
        F.lit(block_size).alias("block_size"),
        F.unix_millis("modificationTime").alias("modified_time"),
        F.unix_millis("modificationTime").alias("accessed_time"),
        F.lit(None).cast("boolean").alias("overwrite"),
        F.lit(None).cast("boolean").alias("new_block"),
        F.lit(None).cast("long").alias("truncate_new_length"),
        F.array(
            F.struct(
                (F.abs(F.xxhash64("path", F.lit(1))) % F.lit(1 << 62)).alias("block_id"),
                F.col("length").alias("size"),
                F.lit(block_size).cast("long").alias("block_size"),
                F.lit(1).cast("long").alias("generation_stamp"),
                F.lit(0).cast("long").alias("start_offset"),
                (F.col("length") - 1).alias("end_offset"),
                F.col("length").alias("delta_size"),
                F.lit(False).alias("deleted"),
            )
        ).alias("blocks"),
        F.upper(F.regexp_extract("path", r"\.(\w+)$", 1)).alias("_ext"),
        F.lit("Snapshot").alias("mode"),
        F.lit(None).cast("string").alias("domain"),
        F.lit(None).cast("string").alias("entity"),
    )
    ev = ev.withColumn("_ext", F.lower("_ext")).withColumn(
        "file_type", _ext_type()
    ).drop("_ext")
    return ev.select(*[f.name for f in CHANGE_EVENT_SCHEMA.fields])


def generate_snapshot(
    file_state: DataFrame, namespace: str = "ns1"
) -> DataFrame:
    """T22: live file_state rows → synthetic Snapshot CLOSE events.

    Replaying these into an *empty* reconciler reproduces the state
    (round-trip gated in tests) — which is exactly how a downstream
    target bootstraps without the full event history. ``namespace``
    stamps the events (FILE_STATE_SCHEMA carries none): pass the
    pipeline's real namespace or downstream eqNullSafe cascade joins
    silently skip the snapshot-seeded rows.
    """
    live = file_state.where(F.col("state") != "Deleted")
    ev = live.select(
        F.col("last_tx_id").alias("tx_id"),
        F.lit("CLOSE").alias("op"),
        F.col("updated_time").alias("ts"),
        F.lit(namespace).alias("namespace"),
        "path",
        "inode_id",
        F.lit(None).cast("string").alias("dest_path"),
        F.lit(None).cast("string").alias("rename_opts"),
        F.col("data_size").alias("length"),
        "block_size",
        F.col("updated_time").alias("modified_time"),
        F.col("updated_time").alias("accessed_time"),
        F.lit(None).cast("boolean").alias("overwrite"),
        F.lit(None).cast("boolean").alias("new_block"),
        F.lit(None).cast("long").alias("truncate_new_length"),
        F.transform(
            F.filter("blocks", lambda b: b["state"] != F.lit("Deleted")),
            lambda b: F.struct(
                b["block_id"].alias("block_id"),
                b["data_size"].alias("size"),
                b["block_size"].alias("block_size"),
                b["generation_stamp"].alias("generation_stamp"),
                F.lit(0).cast("long").alias("start_offset"),
                (b["data_size"] - 1).alias("end_offset"),
                b["data_size"].alias("delta_size"),
                F.lit(False).alias("deleted"),
            ),
        ).alias("blocks"),
        "file_type",
        F.lit("Snapshot").alias("mode"),
        "domain",
        "entity",
    )
    return ev.select(*[f.name for f in CHANGE_EVENT_SCHEMA.fields])


def backlog_events(
    file_state: DataFrame, snapshot_tx: int, namespace: str = "ns1"
) -> DataFrame:
    """T23: Backlog CLOSE for files that moved past the snapshot tx.

    Each block carries the T16-compressed covering interval of its
    deltas in ``(snapshot_tx, last_tx]`` — the exact contract of
    ``DFSBlockState.compressedChangeSet`` (DFSBlockState.java:75-106),
    expressed as array-function min/max instead of a Java loop.
    """
    behind = file_state.where(
        (F.col("state") != "Deleted") & (F.col("last_tx_id") > snapshot_tx)
    )

    def _delta_agg(b, fn, field):
        rel = F.filter(
            b["deltas"], lambda d: d["tx_id"] > F.lit(snapshot_tx)
        )
        return fn(F.transform(rel, lambda d: d[field]))

    ev = behind.select(
        F.col("last_tx_id").alias("tx_id"),
        F.lit("CLOSE").alias("op"),
        F.col("updated_time").alias("ts"),
        F.lit(namespace).alias("namespace"),
        "path",
        "inode_id",
        F.lit(None).cast("string").alias("dest_path"),
        F.lit(None).cast("string").alias("rename_opts"),
        F.col("data_size").alias("length"),
        "block_size",
        F.col("updated_time").alias("modified_time"),
        F.col("updated_time").alias("accessed_time"),
        F.lit(None).cast("boolean").alias("overwrite"),
        F.lit(None).cast("boolean").alias("new_block"),
        F.lit(None).cast("long").alias("truncate_new_length"),
        F.transform(
            F.filter(
                "blocks",
                lambda b: (b["state"] != F.lit("Deleted"))
                & (F.size(F.filter(
                    b["deltas"], lambda d: d["tx_id"] > F.lit(snapshot_tx)
                )) > 0),
            ),
            lambda b: F.struct(
                b["block_id"].alias("block_id"),
                b["data_size"].alias("size"),
                b["block_size"].alias("block_size"),
                b["generation_stamp"].alias("generation_stamp"),
                _delta_agg(b, F.array_min, "start_offset").alias("start_offset"),
                _delta_agg(b, F.array_max, "end_offset").alias("end_offset"),
                (
                    _delta_agg(b, F.array_max, "end_offset")
                    - _delta_agg(b, F.array_min, "start_offset")
                    + 1
                ).alias("delta_size"),
                F.array_contains(
                    F.transform(
                        F.filter(
                            b["deltas"],
                            lambda d: d["tx_id"] > F.lit(snapshot_tx),
                        ),
                        lambda d: d["deleted"],
                    ),
                    True,
                ).alias("deleted"),
            ),
        ).alias("blocks"),
        "file_type",
        F.lit("Backlog").alias("mode"),
        "domain",
        "entity",
    )
    return ev.select(*[f.name for f in CHANGE_EVENT_SCHEMA.fields])
