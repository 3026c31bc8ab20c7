"""Kafka sink projection (SURVEY §2A K1/K2).

The reference sends protobuf envelopes with a custom partitioner that
hashes ``domain::entity`` so each entity's changes stay ordered within
one partition (HCDCKafkaSender.java:41-74,
ChangeDeltaKafkaPartitioner.java:38-48) — and it blocks on every send
(``Future.get()``, one message in flight). Spark's Kafka sink batches
asynchronously per partition; per-entity ordering falls out of setting
the message **key** to ``domain::entity`` (Kafka's default partitioner
hashes the key), with no custom partitioner to maintain.

The projection (key/value/headers columns) is separable from the send
and unit-tested without a broker; the send itself is config-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kafka_envelope(events: DataFrame) -> DataFrame:
    """events → (key, value, headers) rows for the Kafka sink.

    key   = `domain::entity` (K2 ordering contract; NULL-entity rows
            key by namespace so unregistered traffic still partitions
            deterministically),
    value = the JSON envelope (T26 — the reference's protobuf
            DFSChangeDelta becomes a JSON struct; from_json on the
            consumer side restores the typed schema),
    headers = message-id + op, mirroring the reference's Kafka headers
            (MessageObject id/mode).
    """
    key = F.when(
        F.col("domain").isNotNull(),
        F.concat_ws("::", "domain", "entity"),
    ).otherwise(F.coalesce("namespace", F.lit("default")))
    return events.select(
        key.alias("key"),
        F.to_json(F.struct(*events.columns)).alias("value"),
        F.array(
            F.struct(
                F.lit("id").alias("key"),
                F.concat_ws(
                    "-", "namespace", F.col("tx_id").cast("string")
                ).cast("binary").alias("value"),
            ),
            F.struct(
                F.lit("op").alias("key"),
                F.col("op").cast("binary").alias("value"),
            ),
        ).alias("headers"),
    )


def write_kafka_events(
    events: DataFrame,
    brokers: str,
    topic: str,
    checkpoint_dir: str,
):
    """Start the Kafka sink (needs the spark-sql-kafka package on the
    cluster; config-only here). Ordering: per-key within a partition —
    exactly the reference's per-entity guarantee."""
    return (
        kafka_envelope(events)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("includeHeaders", "true")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
