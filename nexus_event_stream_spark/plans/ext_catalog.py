"""Extended relational coverage: as-of join, sessionization, grouping-set
breadth (subsumes rollup/cube), per-user pivot+map profile, top-k per
group, interval join, scalar-function breadth (string/regex/math/date),
subqueries (scalar + EXISTS), fuzzy join, array functions, aggregate
breadth (percentiles/string-agg/null semantics), TPC-H Q3 shape.

These go beyond the reference's surface (SURVEY.md §2 marks the categories
absent) but round out what users of a general analytics engine run daily —
each is a composition of built-in operators with a DuckDB oracle. Breadth
queries are consolidated suites (one catalog slot covering several
operator families) so the full catalog stays ≤ 50 entries and every query
gets a driver correctness row each round; the round-1 → round-2 id mapping
is recorded in SURVEY.md §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexus_event_stream_spark.io import load_table, spread
from nexus_event_stream_spark.operators.relational import (
    asof_join,
    band_join,
    sessionize,
    topk_per_group,
)
from nexus_event_stream_spark.plans.catalog import CENTS, cents, register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q_asof_join",
    """
    WITH r AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        SELECT *, row_number() OVER (
          PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1)
    SELECT event_id, ts, user_id, o_orderkey, o_totalprice
    FROM events ASOF LEFT JOIN r
      ON user_id = r.o_custkey AND ts >= r.o_orderdate
    """,
    doc="Backward as-of join: each event matched to the customer's latest "
    "order at-or-before its timestamp. Spark has no native as-of join; "
    "implemented as tagged union + running last() over one key window "
    "(operators/relational.py) — one shuffle, no range explosion. The "
    "right side is deduped to one row per (key, date) so tie semantics "
    "are engine-independent.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    r = topk_per_group(
        orders,
        ["o_custkey", "o_orderdate"],
        [F.col("o_orderkey").desc()],
        1,
    )
    return asof_join(
        events,
        r,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
        right_tiebreak="o_orderkey",
    ).select("event_id", "ts", "user_id", "o_orderkey", "o_totalprice")


@register(
    "q_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
        CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, session_id, COUNT(*) AS n_events,
      MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM (
      SELECT user_id, ts,
        CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS session_id
      FROM flagged)
    GROUP BY user_id, session_id
    """,
    doc="Gap-based sessionization (30-min gap): lag → boundary flag → "
    "running sum; the batch twin of session_window(ts, gap).",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sessionize(events, gap_seconds=1800)


@register(
    "q_grouping_breadth",
    f"""
    SELECT l_returnflag, l_linestatus,
      CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
      COUNT(*) AS n_rows,
      CAST(SUM({CENTS.format(c='l_quantity')}) AS DOUBLE)/100 AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus), ())
    """,
    doc="Multi-dimensional aggregate via explicit GROUPING SETS over all "
    "four combos of (returnflag, linestatus) — the general form that "
    "subsumes ROLLUP (its prefix sets) and CUBE (all combos), with "
    "GROUPING() markers disambiguating subtotal rows from genuine NULL "
    "groups. Spark plans ONE Expand + hash aggregate: a single shuffle "
    "computes every grouping set (never a union of group-bys). The "
    "rollup()/cube() API shorthands are pinned result-equivalent to "
    "their grouping-set expansions in tests/test_relational.py. "
    "Subsumes round-1's q_rollup/q_cube/q_grouping_sets.",
)
def q_grouping_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(cents("l_quantity")).cast("double") / 100).alias("sum_qty"),
    )


@register(
    "q_user_profile",
    """
    SELECT user_id,
      CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      CAST(COUNT(DISTINCT event_type) AS INTEGER) AS n_types,
      CASE WHEN COUNT(CASE WHEN event_type='click' THEN 1 END) > 0
           THEN COUNT(CASE WHEN event_type='click' THEN 1 END) END AS n_clicks,
      COUNT(CASE WHEN event_type='purchase' THEN 1 END) > 0 AS has_purchase
    FROM events GROUP BY user_id
    """,
    doc="Per-user profile: pivot event_type → static count columns via "
    "conditional aggregation — the SINGLE-shuffle pivot plan (the "
    "groupBy().pivot() shorthand plans two-phase aggregation with an "
    "extra exchange; it is pinned result-equivalent to this form in "
    "tests/test_relational.py) — then a map-typed view of the same "
    "counts exercises the map surface: map_from_arrays + map_filter to "
    "present types, size (n_types), element_at with missing-key→NULL "
    "(n_clicks), map_contains_key (has_purchase). The map is an "
    "engine-side representation; the oracle computes the same scalars "
    "relationally. Subsumes round-1's q_pivot/q_map_funcs.",
)
def q_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pivoted = events.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"n_{t}")
            for t in EVENT_TYPES
        ]
    )
    m = F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(t) for t in EVENT_TYPES]),
            F.array(*[F.col(f"n_{t}") for t in EVENT_TYPES]),
        ),
        lambda _, v: v > 0,
    )
    return pivoted.select(
        "user_id",
        *[f"n_{t}" for t in EVENT_TYPES],
        F.size(m).alias("n_types"),
        F.element_at(m, "click").alias("n_clicks"),
        F.map_contains_key(m, "purchase").alias("has_purchase"),
    )


@register(
    "q_topk_per_group",
    """
    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        row_number() OVER (PARTITION BY l_returnflag
          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem) WHERE rn <= 3
    """,
    doc="Top-3 most expensive lineitems per return flag — ranking window, "
    "per-group heap semantics.",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return topk_per_group(
        li,
        ["l_returnflag"],
        [F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
        3,
    ).select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")


@register(
    "q_range_join",
    """
    SELECT event_id, value, band FROM events
    LEFT JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0),
                      ('high', 150.0, 1000000.0)) AS b(band, lo, hi)
      ON value >= lo AND value < hi
    """,
    doc="Interval/range join against a tiny band dimension — broadcast "
    "non-equi (BroadcastNestedLoopJoin), the right plan for a 3-row side.",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return band_join(
        events,
        [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1e6)],
    ).select("event_id", "value", "band")


@register(
    "q_scalar_breadth",
    """
    SELECT event_id,
      upper(event_type) AS type_upper,
      substring(event_type, 1, 3) AS type_prefix,
      concat_ws('-', event_type, CAST(user_id AS VARCHAR)) AS type_user,
      length(props) AS props_len,
      replace(event_type, 'e', '3') AS type_leet,
      lpad(CAST(user_id AS VARCHAR), 6, '0') AS user_padded,
      regexp_extract(props, '[0-9]+') AS first_number,
      regexp_matches(props, '[0-9]{2}') AS has_2digits,
      regexp_replace(event_type, '[aeiou]', '_', 'g') AS type_devoweled,
      abs(value - 100.0) AS dist_from_100,
      floor(value) AS value_floor,
      ceil(value) AS value_ceil,
      CAST(round(value, 0) AS DOUBLE) AS value_round,
      greatest(value, 50.0) AS value_floor50,
      CAST(year(ts) AS INTEGER) AS y,
      CAST(month(ts) AS INTEGER) AS m,
      CAST(dayofmonth(ts) AS INTEGER) AS d,
      CAST(hour(ts) AS INTEGER) AS h,
      CAST(quarter(ts) AS INTEGER) AS qtr,
      CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
      CAST(dayofyear(ts) AS INTEGER) AS doy,
      strftime(last_day(CAST(ts AS DATE)), '%Y-%m-%d') AS month_end,
      strftime(ts, '%Y-%m') AS ym,
      date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS days_since
    FROM events
    """,
    doc="Scalar-function breadth in one projection: string built-ins, "
    "regex extract/match/global-replace (patterns inside the Java-regex "
    "∩ RE2 common dialect), exact math on positive 2-decimal doubles "
    "(floor/ceil/round), and the date library — extraction fields, "
    "quarter/day-of-week/day-of-year, last_day, yyyy-MM bucketing, "
    "datediff from an epoch anchor. DuckDB's dayofweek is 0-based "
    "Sunday vs Spark's 1-based — normalized in the oracle, not the "
    "engine. Pure map-side projection, no shuffle. Subsumes round-1's "
    "q_scalar_funcs/q_regex/q_date_funcs.",
)
def q_scalar_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    return events.select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.substring("event_type", 1, 3).alias("type_prefix"),
        F.concat_ws("-", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "type_user"
        ),
        F.length("props").cast("long").alias("props_len"),
        F.replace(F.col("event_type"), F.lit("e"), F.lit("3")).alias("type_leet"),
        F.lpad(F.col("user_id").cast("string"), 6, "0").alias("user_padded"),
        F.regexp_extract("props", "[0-9]+", 0).alias("first_number"),
        F.col("props").rlike("[0-9]{2}").alias("has_2digits"),
        F.regexp_replace("event_type", "[aeiou]", "_").alias("type_devoweled"),
        F.abs(F.col("value") - 100.0).alias("dist_from_100"),
        F.floor("value").cast("double").alias("value_floor"),
        F.ceil("value").cast("double").alias("value_ceil"),
        F.round("value", 0).cast("double").alias("value_round"),
        F.greatest(F.col("value"), F.lit(50.0)).alias("value_floor50"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.quarter("ts").alias("qtr"),
        F.dayofweek("ts").alias("dow"),
        F.dayofyear("ts").alias("doy"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format("ts", "yyyy-MM").alias("ym"),
        F.datediff(d, F.to_date(F.lit("2024-01-01"))).cast("long").alias(
            "days_since"
        ),
    )


@register(
    "q_subqueries",
    """
    SELECT o_orderkey, o_totalprice,
      (SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
      AND NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08)
    """,
    doc="Subquery surface through the SQL API: a correlated scalar "
    "subquery in the projection (decorrelated by Catalyst into an "
    "aggregate + outer join) plus correlated EXISTS / NOT EXISTS "
    "predicates (decorrelated into left-semi and left-anti joins on "
    "l_orderkey — the same physical shape q_semi_anti reaches "
    "directly). Subsumes round-1's q_scalar_subquery/q_exists_subquery.",
)
def q_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_event_stream_spark.io import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
          (SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey)
            AS n_items
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_quantity >= 45)
          AND NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_discount > 0.08)
        """
    )


@register(
    "q_fuzzy_join",
    """
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
      levenshtein(a.c_name, b.c_name) AS edit_dist
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
    doc="Fuzzy self-join: blocked customer pairs within edit distance 2 "
    "(levenshtein is identically defined in both engines).",
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spread(load_table(spark, sf_dir, "customer"))
    a, b = c.alias("a"), c.alias("b")
    dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
    # the distance predicate lives in the JOIN condition so it's evaluated
    # once per blocked pair; the projection recomputes it only for the few
    # surviving pairs (vs. filter-after-project = 2× per pair)
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey"))
            & (dist <= 2),
        )
        .select(
            F.col("a.c_custkey").alias("cust_a"),
            F.col("b.c_custkey").alias("cust_b"),
            dist.cast("long").alias("edit_dist"),
        )
    )


@register(
    "q_array_funcs",
    """
    SELECT vec_id,
      CAST(len(embedding) AS INTEGER) AS n_dims,
      list_max(list_transform(embedding,
        x -> CAST(ROUND(CAST(x AS DOUBLE)*10000,0) AS BIGINT))) AS q_max,
      list_min(list_transform(embedding,
        x -> CAST(ROUND(CAST(x AS DOUBLE)*10000,0) AS BIGINT))) AS q_min,
      CAST(list_sum(list_slice(list_transform(embedding,
        x -> CAST(ROUND(CAST(x AS DOUBLE)*10000,0) AS BIGINT)), 1, 3))
        AS BIGINT) AS q_head_sum,
      CAST(len(list_filter(list_transform(embedding,
        x -> CAST(ROUND(CAST(x AS DOUBLE)*10000,0) AS BIGINT)),
        x -> x > 0)) AS INTEGER) AS n_positive
    FROM embeddings
    """,
    doc="Array-function breadth over the embedding column: size, min/max, "
    "slice+reduce, filter — all on quantized integers for parity.",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_event_stream_spark.functions.vectors import quantize

    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize("embedding")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.array_max(q).alias("q_max"),
        F.array_min(q).alias("q_min"),
        F.aggregate(
            F.slice(q, 1, 3), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("q_head_sum"),
        F.size(F.filter(q, lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "q_shipping_priority",
    f"""
    SELECT o_orderkey, o_orderdate,
      CAST(SUM({CENTS.format(c='l_extendedprice')} *
               (100 - {CENTS.format(c='l_discount')})) AS DOUBLE)/10000
        AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): selective dim filter + "
    "two-level join + group + top-10 — filters push to every scan, "
    "customer broadcasts, ordering ties broken by key.",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15"
    )
    revenue = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg((F.sum(revenue).cast("double") / 10000).alias("revenue"))
        .select("o_orderkey", "o_orderdate", "revenue")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q_agg_breadth",
    """
    SELECT event_type,
      quantile_cont(value, 0.5) AS med,
      quantile_cont(value, 0.9) AS p90,
      MIN(value) AS vmin, MAX(value) AS vmax,
      string_agg(DISTINCT CAST(user_id AS VARCHAR), ','
                 ORDER BY CAST(user_id AS VARCHAR)) AS users,
      COUNT(*) AS n_total,
      COUNT(CASE WHEN user_id % 3 = 0 THEN NULL ELSE value END) AS n_nonnull,
      CAST(SUM(CASE WHEN COALESCE(
        CASE WHEN user_id % 3 = 0 THEN NULL ELSE value END, -1.0) = -1.0
        THEN 1 ELSE 0 END) AS BIGINT) AS n_defaulted
    FROM events GROUP BY event_type
    """,
    doc="Aggregate-function breadth in ONE hash aggregate per group: "
    "exact interpolated percentiles (Spark percentile() ≡ DuckDB "
    "quantile_cont, bit-identical on equal inputs; percentile_approx is "
    "the sketch twin, pytest-only), ordered string aggregation "
    "(deterministic: distinct + sorted), and null semantics — "
    "null-generating CASE, null-skipping COUNT, COALESCE defaulting "
    "(the tolerant-reader value rules in aggregate form). One shuffle "
    "on event_type computes all nine aggregates. Subsumes round-1's "
    "q_percentiles/q_string_agg/q_null_handling.",
)
def q_agg_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v_null = F.when(F.col("user_id") % 3 == 0, F.lit(None)).otherwise(F.col("value"))
    return events.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med"),
        F.percentile("value", 0.9).alias("p90"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.array_join(
            F.array_sort(F.collect_set(F.col("user_id").cast("string"))), ","
        ).alias("users"),
        F.count(F.lit(1)).alias("n_total"),
        F.count(v_null).alias("n_nonnull"),
        F.sum(
            F.when(F.coalesce(v_null, F.lit(-1.0)) == -1.0, 1).otherwise(0)
        ).alias("n_defaulted"),
    )
