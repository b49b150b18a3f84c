"""Streaming sources for the signal-event pipeline.

Production path mirrors the reference's consumer config
(data-plane/cmd/server/main.go:56-61): topic ``nexus.signals``, start at
earliest offset for full-replay cold starts (README:164). The Kafka
connector needs the spark-sql-kafka package on the classpath — not bundled
in this environment, so tests run the same pipeline off the file source,
which exercises identical parse/merge code.

The tolerant-reader contract (domain/signal.go:27-31; consumer.go:39-44):
- unknown JSON fields ignored, missing fields null (PERMISSIVE from_json);
- malformed payloads are *dropped and acknowledged*, never fatal — an event
  without a parseable ``id`` cannot be applied, so "id present" is the keep
  predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexus_event_stream_spark.schemas import EVENT_SCHEMA, KAFKA_TOPIC


def kafka_event_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = KAFKA_TOPIC,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """readStream from Kafka → raw (key, value) strings.

    ``startingOffsets=earliest`` + a fresh checkpoint reproduces the
    reference's full-topic replay; with an existing checkpoint, offsets
    resume exactly where the last committed epoch ended (the commit-after-
    write contract of consumer.go:46-51, but transactional).
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
        )
    )


def file_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """readStream of JSON-lines event files — the test/dev stand-in with
    the same downstream contract as the Kafka source (a ``value`` string
    column). One file ≈ one producer batch.
    """
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "16")
        .load(path)
        .select(F.col("value").cast("string").alias("value"))
    )


def parse_events(raw: DataFrame) -> DataFrame:
    """value:string → typed event rows, malformed dropped (tolerant reader).

    Works on both batch and streaming DataFrames.
    """
    return (
        raw.select(F.from_json("value", EVENT_SCHEMA).alias("e"))
        .select("e.*")
        .filter(F.col("id").isNotNull())
    )
