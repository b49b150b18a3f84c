"""SparkSession factory with scale-aware defaults.

Local runs are single-JVM (``local[N]``), but every conf here is chosen so
the same code runs unchanged on a 1000-executor cluster:

- AQE on (runtime coalesce, skew-join splitting, dynamic join strategy) so
  plans re-shape themselves as real data sizes become known;
- shuffle partitions sized to cores locally; on a cluster AQE coalesces the
  initial number down, so a generous initial value is safe;
- session timezone pinned to UTC (the reference is TZ-aware UTC,
  control-plane/nexus/settings.py:123-127) — required for oracle parity;
- ANSI off: the reference is a *permissive* system (malformed events are
  dropped, unparseable timestamps degrade to 0 — data-plane/internal/
  consumer/consumer.go:39-44, projection/signal.go:147-153), so eager
  runtime errors would change semantics;
- Arrow on for the few Pandas-UDF code paths (vectorized transfer).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "nexus-event-stream-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Parameters are overridable for tests (small local session) and bench
    (local[$SPARK_GRAFT_CPUS]); production would pass a YARN/K8s master.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = 32 if inner == "*" else max(int(inner), 1)
        else:
            shuffle_partitions = 200
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size stays at the 10k default: a global 512 was
        # tried (r13) to smooth q_binary_meta's blob batches and cost
        # the VOLUME Arrow kernels 1.4-1.9× (cdc/repetition/semantic at
        # 125k docs — 24× more per-batch numpy setup); the real
        # q_binary_meta fix was io.spread(), after which each task's
        # batch is small regardless.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The 64 MB broadcast threshold needs a driver heap that can BUILD
        # a 64 MB-estimated relation (deserialized rows + hash table run
        # several× the estimate; Spark's default 1g heap OOMs the build —
        # found by the 25× stress bench). Only effective when THIS process
        # launches the JVM (first session); a cluster deployment sizes
        # driver memory in spark-submit as usual.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .config("spark.ui.enabled", "false")
        # Scan splits follow parquet row-group boundaries, so sub-row-group
        # maxPartitionBytes buys nothing on single-row-group local files
        # (measured): keep the cluster-appropriate default; compute-heavy
        # operators parallelize explicitly via io.spread().
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Driver testdata stores TIMESTAMP(NANOS) parquet, which Spark only
        # reads as BIGINT; io.load_table converts ns→µs timestamps.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # INT64-µs timestamps on write (not legacy INT96): INT96 carries no
        # parquet min/max statistics, which would blind both row-group
        # skipping and the clustering manifest (operators/clustering.py).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
