"""Streaming change-event sources.

The reference tails the NameNode edit log and republishes transactions
through Kafka (EditLogProcessor → HCDCKafkaReceiver,
namenode-agent/.../namenode/EditLogProcessor.java:87-160,
core/.../messaging/HCDCKafkaReceiver.java:53-87). Spark-native
equivalents:

- **file stream source** (this module): event-log segment files land in
  a directory (the analogue of ``edits_<start>-<end>`` segments,
  DFSEditsFileFinder.java:37-62); ``spark.readStream`` discovers new
  files per micro-batch. Offset tracking, seek-on-start, and the ZK
  offset mirror (KafkaStateManager.java:30-57) all collapse into the
  sink's ``checkpointLocation``.
- **kafka source** (``read_kafka_events``): the direct drop-in when a
  broker exists — same downstream plan, different first hop. Build is
  config-only, so it is exercised only when a broker URL is supplied.

Event time: the envelope carries epoch-millis ``ts``
(data_block.proto:143-152 uses int64 timestamps); ``with_event_time``
adds a proper TimestampType column for watermarks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hcdc_spark.cdc.model import CHANGE_EVENT_SCHEMA


def write_event_segment(
    spark: SparkSession, events: list[dict], directory: str, segment: str
) -> str:
    """Write one event-log segment file (the ``edits_*`` analogue).

    Parquet, one file per segment so the stream source picks each up
    atomically.
    """
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, segment)
    df = spark.createDataFrame(events, schema=CHANGE_EVENT_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def read_event_stream(
    spark: SparkSession,
    directory: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based change-event stream over a segment directory.

    ``maxFilesPerTrigger`` bounds micro-batch size the way the
    reference's ``receiveBatchTimeout``/batch-size bounds its Kafka
    pulls (ChangeDeltaProcessor.java:30).
    """
    reader = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(directory)


def parse_kafka_envelope(raw: DataFrame) -> DataFrame:
    """Consumer-side decode of the Kafka wire rows (key/value pairs as
    produced by ``kafka_sink.kafka_envelope``) back into typed change
    events.

    Separated from the broker hookup so the decode plan is identical —
    and testable end-to-end — over any transport carrying the same
    (key, value) contract: the real Kafka source, a file stream, or a
    static DataFrame (test_streaming's broker-less round-trip).
    """
    return raw.select(
        F.from_json(F.col("value").cast("string"), CHANGE_EVENT_SCHEMA).alias(
            "ev"
        )
    ).select("ev.*")


def read_kafka_events(
    spark: SparkSession, brokers: str, topic: str, starting: str = "earliest"
) -> DataFrame:
    """Kafka change-event stream (envelope as JSON in the value).

    The reference's manual offset commit + ZK mirror + seek-on-start
    (HCDCKafkaReceiver.java:149-218) are subsumed by checkpointing; the
    per-entity ordering its custom partitioner provides
    (ChangeDeltaKafkaPartitioner.java:38-48) is preserved by keying
    messages with ``domain::entity`` — the sink side does that.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting)
        .load()
    )
    return parse_kafka_envelope(raw)


def with_event_time(events: DataFrame, col: str = "ts") -> DataFrame:
    """Add ``event_time`` TimestampType from the epoch-millis ``ts``."""
    return events.withColumn(
        "event_time", F.timestamp_millis(F.col(col))
    )
