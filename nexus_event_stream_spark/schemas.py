"""Declared schemas — fixed StructTypes, never inferred.

The reference carries exactly one record shape end-to-end (SURVEY.md §1.2):
the Signal entity and its event envelope. The consumer is a *tolerant
reader* — unknown JSON fields ignored, missing fields zero-valued
(data-plane/internal/domain/signal.go:27-31, signal_test.go:71-82). Spark's
``from_json`` with an explicit schema in PERMISSIVE mode reproduces exactly
that contract, which is why every schema here is declared.

Also declares the ten driver testdata tables (TESTDATA.md / FIXTURES.md §3)
so scans never pay schema inference and column pruning is exact.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Reference domain schemas
# --------------------------------------------------------------------------

#: Event envelope on the stream (control-plane/nexus/core/signals.py:37-70;
#: data-plane/internal/domain/signal.go:15-24). Delete events carry only
#: {action, id} — the remaining fields arrive as nulls (tolerant reader).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("action", T.StringType()),  # created | updated | deleted
        T.StructField("id", T.StringType()),  # entity UUID, also the Kafka key
        T.StructField("title", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("priority", T.StringType()),  # display string Low/Medium/High
        T.StructField("author", T.StringType()),  # username (denormalized at publish)
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

#: Materialized-view row (data-plane/internal/domain/signal.go:47-55) —
#: the event minus the ``action`` discriminator.
VIEW_SCHEMA = T.StructType([f for f in EVENT_SCHEMA.fields if f.name != "action"])

#: Keyed state table behind the view: latest event per key INCLUDING delete
#: tombstones (operators/lww.py — tombstones make the incremental merge
#: equivalent to a full re-fold under out-of-order arrival). The serving
#: view is ``live_view(state)``: tombstones filtered, action dropped.
STATE_SCHEMA = EVENT_SCHEMA

#: Priority display-string → index score (projection/signal.go:21-25).
#: Unknown values score 0 (Go zero value) — a documented quirk we preserve.
PRIORITY_SCORES = {"Low": 1, "Medium": 2, "High": 3}

KAFKA_TOPIC = "nexus.signals"  # control-plane/nexus/core/signals.py:31
CONSUMER_GROUP = "nexus-data-plane"  # data-plane/cmd/server/main.go:56-61

# --------------------------------------------------------------------------
# Driver testdata tables (read-only parquet at /root/testdata/sf*/)
# --------------------------------------------------------------------------

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),  # JSON payload
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(TABLE_SCHEMAS)
