"""The declared correctness catalog (SURVEY.md §2.11).

Every query exists twice: a Spark DataFrame builder (the engine under test)
and an ANSI-SQL oracle string for DuckDB. The driver hash-compares them
(row count + schema + order-insensitive value hash), so:

- column names are aliased identically on both sides;
- every ordering / latest-per-key tie is broken by a unique key;
- float aggregation is *exact*: monetary doubles are 2-decimal by
  construction (verified against the testdata), so sums run over integer
  cents (BIGINT) and divide back at the end — bit-identical under any
  partitioning, any engine. Plain double sums would drift at the ulp level
  between Spark's partial aggregation tree and DuckDB's.

Mapping of the reference's signal domain onto the driver's ``events`` table
(FIXTURES.md §3): ``user_id`` ≈ entity key, ``event_type`` ≈
action/priority analogue (``'error'`` plays ``deleted``), ``ts`` ≈
created/updated_at, ``event_id`` = unique tie-break, ``props`` = JSON
envelope.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nexus_event_stream_spark.functions.domain import (
    priority_display_to_score,
    priority_score_to_display,
)
from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.operators.lww import latest_state
from nexus_event_stream_spark.operators.topk import newest_first, paginate

#: event_type value that plays the role of the ``deleted`` action
#: (the driver's events table has no literal 'deleted' type).
DELETE_MARKER = "error"

#: event_type → score mapping, the analogue of the reference's priority
#: scores Low/Medium/High → 1/2/3, unknown → 0 (projection/signal.go:21-25).
TYPE_SCORES = {"signup": 1, "click": 2, "purchase": 3}
SCORE_DISPLAY = {1: "Low", 2: "Medium", 3: "High"}


def cents(col):
    """Exact integer cents of a 2-decimal double column (both engines)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, 0).cast("bigint")


CENTS = "CAST(ROUND({c}*100,0) AS BIGINT)"


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only
    doc: str = ""


CATALOG: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle}


# ===========================================================================
# R tier — reference semantics (SURVEY.md §2.11, data-plane behaviors)
# ===========================================================================


@register(
    "q_latest_state",
    """
    SELECT event_id, ts, user_id, event_type, value, props FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
    doc="Keyed LWW fold: latest event per entity (projection/signal.go:45-58).",
)
def q_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return latest_state(events, key=["user_id"], ts_col="ts", tiebreak=["event_id"])


@register(
    "q_delete_semantics",
    f"""
    SELECT event_id, ts, user_id, value, props FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1 AND event_type <> '{DELETE_MARKER}'
    """,
    doc="LWW fold + evict: keys whose latest event is a delete vanish "
    "(projection/signal.go:39-42,60-67); the action column is dropped "
    "from the view (domain/signal.go:34-44).",
)
def q_delete_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    latest = latest_state(events, key=["user_id"], ts_col="ts", tiebreak=["event_id"])
    return latest.filter(F.col("event_type") != DELETE_MARKER).drop("event_type")


@register(
    "q_list_newest",
    "SELECT event_id, ts, user_id, event_type, value, props FROM events "
    "ORDER BY ts DESC, event_id DESC LIMIT 50",
    doc="Top-50 newest-first (ZRANGE REV 0 49, handler/signal.go:45). "
    "Spark plans orderBy+limit as TakeOrderedAndProject: per-partition "
    "heap top-k, no global sort.",
)
def q_list_newest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return newest_first(events, ts_col="ts", tiebreak=["event_id"], limit=50)


@register(
    "q_filter_priority",
    "SELECT event_id, ts, user_id, event_type, value, props FROM events "
    "WHERE event_type = 'purchase'",
    doc="Equality filter on the priority analogue (projection/signal.go:84-96); "
    "pushed down to the parquet scan.",
)
def q_filter_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "purchase")


@register(
    "q_pagination",
    """
    SELECT event_id, ts, user_id, event_type, value, props, 'page' AS probe
    FROM (
      SELECT *, row_number() OVER (ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn BETWEEN 11 AND 20
    UNION ALL
    SELECT event_id, ts, user_id, event_type, value, props, 'point' AS probe
    FROM events WHERE event_id = 42
    """,
    doc="Listing-read suite: page 2 of size 10 newest-first — DRF "
    "PageNumberPagination (settings.py:61-64) — UNION'd with the pk point "
    "lookup (projection/signal.go:99-108; predicate pushdown + row-group "
    "min/max skipping = the index-seek analogue), tagged by ``probe``. "
    "One driver row value-checks both read paths, freeing a catalog slot "
    "for q_bpe; the plan keeps TakeOrderedAndProject for the page side "
    "and a pushed event_id filter for the point side (tests/test_plans).",
)
def q_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    page = paginate(
        events, order_by=["ts", "event_id"], page=2, page_size=10
    ).withColumn("probe", F.lit("page"))
    point = events.filter(F.col("event_id") == 42).withColumn(
        "probe", F.lit("point")
    )
    return page.unionByName(point)


@register(
    "q_priority_encode",
    """
    SELECT event_id, event_type,
      CASE event_type WHEN 'signup' THEN 1 WHEN 'click' THEN 2
                      WHEN 'purchase' THEN 3 ELSE 0 END AS type_score,
      CASE CASE event_type WHEN 'signup' THEN 1 WHEN 'click' THEN 2
                           WHEN 'purchase' THEN 3 ELSE 0 END
        WHEN 1 THEN 'Low' WHEN 2 THEN 'Medium' WHEN 3 THEN 'High'
        ELSE NULL END AS type_display
    FROM events
    """,
    doc="Priority display↔score mapping incl. the unknown→0 quirk "
    "(models.py:16-19; projection/signal.go:21-25,85).",
)
def q_priority_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    score = priority_display_to_score(
        "event_type", {k: v for k, v in TYPE_SCORES.items()}
    )
    display = priority_score_to_display(
        score, {v: k for k, v in SCORE_DISPLAY.items()}
    )
    return events.select(
        "event_id",
        "event_type",
        score.alias("type_score"),
        display.alias("type_display"),
    )


@register(
    "q_ts_parse",
    f"""
    SELECT event_id,
      COALESCE(CAST(FLOOR(epoch(TRY_CAST(
        CASE WHEN event_type = '{DELETE_MARKER}' THEN 'not-a-timestamp'
             ELSE CAST(ts AS VARCHAR) END AS TIMESTAMP))) AS BIGINT), 0)
      AS ts_unix
    FROM events
    """,
    doc="RFC3339-ish string → unix seconds with unparseable→0 fallback "
    "(projection/signal.go:147-153). Malformed inputs are synthesized for "
    "one event_type since the testdata has no bad timestamps.",
)
def q_ts_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_event_stream_spark.functions.domain import rfc3339_to_unix

    events = load_table(spark, sf_dir, "events")
    s = F.when(F.col("event_type") == DELETE_MARKER, F.lit("not-a-timestamp")).otherwise(
        F.col("ts").cast("string")
    )
    return events.select("event_id", rfc3339_to_unix(s).alias("ts_unix"))


@register(
    "q_json_extract",
    "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k "
    "FROM events",
    doc="JSON envelope field extraction (domain/signal.go:27-31 analogue) "
    "over the semi-structured props column.",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@register(
    "q_denorm_join",
    """
    SELECT event_id, ts, event_type, value, c_name AS author
    FROM events JOIN customer ON user_id = c_custkey
    """,
    doc="Author denormalization at publish time (signals.py:52): events ⋈ "
    "small user dim. Broadcast join — no shuffle of the big side.",
)
def q_denorm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return (
        events.join(
            F.broadcast(customer), events.user_id == customer.c_custkey, "inner"
        )
        .select("event_id", "ts", "event_type", "value", F.col("c_name").alias("author"))
    )


# ===========================================================================
# X tier — relational coverage (star schema, aggs, windows, set ops)
# ===========================================================================


@register(
    "q_join_star",
    f"""
    SELECT r_name, n_name, COUNT(*) AS n_items,
      CAST(SUM({CENTS.format(c='l_extendedprice')} *
               (100 - {CENTS.format(c='l_discount')})) AS DOUBLE)/10000
        AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey  = o_orderkey
      JOIN customer ON o_custkey   = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    doc="Star-schema join + group agg (revenue per region/nation). Fact "
    "table shuffles once on l_orderkey→orders; all dims broadcast. "
    "Revenue is exact integer cents×(100-disc_cents) — deterministic.",
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue_units = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(revenue_units).cast("double") / 10000).alias("revenue"),
        )
    )


@register(
    "q_semi_anti",
    """
    SELECT o_orderkey, 'has_items' AS tag FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    UNION ALL
    SELECT o_orderkey, 'no_items' AS tag FROM orders
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    """,
    doc="Left-semi and left-anti joins (orders with / without lineitems).",
)
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    cond = orders.o_orderkey == li.l_orderkey
    has = orders.join(li, cond, "left_semi").withColumn("tag", F.lit("has_items"))
    not_has = orders.join(li, cond, "left_anti").withColumn("tag", F.lit("no_items"))
    return has.unionByName(not_has)


@register(
    "q_group_agg",
    f"""
    SELECT l_returnflag, l_linestatus,
      COUNT(*) AS n_rows,
      CAST(SUM({CENTS.format(c='l_quantity')}) AS DOUBLE)/100 AS sum_qty,
      CAST(SUM({CENTS.format(c='l_extendedprice')}) AS DOUBLE)/100 AS sum_price,
      CAST(SUM({CENTS.format(c='l_quantity')}) AS DOUBLE)/100/COUNT(*) AS avg_qty,
      MIN(l_shipdate) AS min_shipdate,
      MAX(l_shipdate) AS max_shipdate
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-Q1-style multi-key hash aggregate (count/sum/avg/min/max); "
    "partial (map-side) aggregation then one shuffle on the group keys.",
)
def q_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty_cents = F.sum(cents("l_quantity"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (qty_cents.cast("double") / 100).alias("sum_qty"),
        (F.sum(cents("l_extendedprice")).cast("double") / 100).alias("sum_price"),
        (qty_cents.cast("double") / 100 / F.count(F.lit(1))).alias("avg_qty"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


@register(
    "q_window_analytics",
    f"""
    SELECT event_id, user_id,
      CAST(SUM({CENTS.format(c='value')}) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS running_cents,
      LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        AS prev_value,
      CAST(SUM({CENTS.format(c='value')}) OVER (
        PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT)
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
        AS cents_last_hour
    FROM events
    """,
    doc="Per-user analytic windows: running sum (exact cents — window "
    "sums are order-of-association sensitive in float) + lag on a ROWS "
    "frame, plus a trailing-1-hour RANGE frame keyed on event time (the "
    "batch twin of a sliding stream aggregate; bounds are exact "
    "microsecond integers — whole-second truncation would shift "
    "boundary membership on sub-second data). Both window specs share "
    "the user_id partition: ONE shuffle, two sorts within partitions.",
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    trailing = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.sum(cents("value")).over(running).alias("running_cents"),
        F.lag("value").over(w).alias("prev_value"),
        F.sum(cents("value")).over(trailing).alias("cents_last_hour"),
    )


@register(
    "q_set_ops",
    """
    SELECT user_id, 'both' AS tag FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'error')
    UNION ALL
    SELECT user_id, 'only_purchase' AS tag FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'error')
    UNION ALL
    SELECT user_id, 'pair:' || event_type AS tag FROM (
      SELECT DISTINCT user_id, event_type FROM events)
    """,
    doc="Set-semantics suite over event partitions: INTERSECT / EXCEPT "
    "legs plus a DISTINCT leg (every distinct (user_id, event_type) pair "
    "tagged 'pair:<type>' — round 6 absorbed q_distinct; dropDuplicates "
    "→ hash aggregate is still fully value-checked here).",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchasers = events.filter(F.col("event_type") == "purchase").select("user_id")
    erring = events.filter(F.col("event_type") == "error").select("user_id")
    both = purchasers.intersect(erring).withColumn("tag", F.lit("both"))
    only = purchasers.subtract(erring).withColumn("tag", F.lit("only_purchase"))
    pairs = (
        events.select("user_id", "event_type")
        .distinct()
        .select("user_id", F.concat(F.lit("pair:"), "event_type").alias("tag"))
    )
    return both.unionByName(only).unionByName(pairs)


@register(
    "q_scd2",
    """
    SELECT event_id, user_id, ts AS valid_from,
      lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        AS valid_to,
      CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    """,
    doc="SCD2 dimension from the event history: each event becomes a "
    "version row with a validity interval [ts, next_ts); the reference's "
    "LWW view is exactly the is_current=1 slice of this (emulated MERGE "
    "history — the 'CDC/SCD2 without Delta' pattern).",
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return events.select(
        "event_id",
        "user_id",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@register(
    "q_tumbling_window",
    f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
      COUNT(*) AS n_events,
      CAST(SUM({CENTS.format(c='value')}) AS DOUBLE)/100 AS sum_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="Hourly tumbling-window aggregate — batch-equivalent of the "
    "streaming window(ts,'1 hour') group-by (SURVEY.md §2.9).",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")).cast("double") / 100).alias("sum_value"),
        )
    )
