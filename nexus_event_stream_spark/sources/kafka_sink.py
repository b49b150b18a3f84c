"""Kafka event sink — the command side's producer contract, Spark-first.

Mirrors control-plane/nexus/core/signals.py:19-34 + producers.py:17-48:
message key = entity id, value = JSON envelope, durable producer settings
(acks=all; idempotence ≈ checkpointed exactly-once epochs on the Spark
side). The broker jars aren't present in this environment, so the payload
construction (testable) is separated from the writer wiring (config only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexus_event_stream_spark.schemas import EVENT_SCHEMA, KAFKA_TOPIC


def events_to_kafka_payload(events: DataFrame) -> DataFrame:
    """Typed event rows → (key, value) strings for the Kafka writer.

    Delete events serialize with only {action, id} — the 2-key envelope
    asserted by the reference's tests (tests.py:134-139): to_json drops
    null fields, and delete events carry nulls everywhere else.
    """
    cols = [f.name for f in EVENT_SCHEMA.fields]
    return events.select(
        F.col("id").alias("key"),
        F.to_json(F.struct(*cols)).alias("value"),
    )


def write_stream_to_kafka(
    events: DataFrame,
    brokers: str,
    checkpoint_path: str,
    topic: str = KAFKA_TOPIC,
):
    """writeStream into Kafka with durable-producer settings.

    acks=all matches producers.py:30-34; exactly-once effect comes from
    the checkpointed epoch + broker-side idempotent producer.
    """
    return (
        events_to_kafka_payload(events)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("kafka.acks", "all")
        .option("kafka.enable.idempotence", "true")
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def write_batch_to_kafka(
    events: DataFrame, brokers: str, topic: str = KAFKA_TOPIC
) -> None:
    """Batch publish (backfill path)."""
    (
        events_to_kafka_payload(events)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("kafka.acks", "all")
        .save()
    )
