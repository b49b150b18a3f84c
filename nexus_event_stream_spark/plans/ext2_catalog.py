"""Second extension wave: analytic-window breadth (ntile family),
histograms, the behavioral-analytics suite (funnel / cohort retention /
first-touch attribution — the event-analytics queries a stream-projection
engine like the reference would serve next), skew-salted join
equivalence, corpus top-k tokens, positional explode, and deterministic
hash sampling.

All oracled against DuckDB. Determinism follows plans/catalog.py's rules:
monetary doubles fold as integer cents; doubles exposed in outputs are
computed from identical integer operands with textually-parallel
expressions on both engines (IEEE ops on equal operands are bit-equal).

Registered into the same CATALOG as plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.operators.partitioning import skew_salted_join
from nexus_event_stream_spark.plans.catalog import CENTS, cents, register

# ---------------------------------------------------------------------------
# Relational breadth
# ---------------------------------------------------------------------------


@register(
    "q_window_ntile",
    """
    SELECT c_custkey, c_mktsegment,
      CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      percent_rank() OVER w AS pct_rank,
      cume_dist() OVER w AS cdist,
      first_value(c_custkey) OVER w AS richest_key
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="Analytic-window breadth beyond §2.5's ranking set: ntile / "
    "percent_rank / cume_dist / first_value over one shared window spec "
    "(single sort-within-partition, no extra shuffle per function). "
    "Unique (acctbal, custkey) ordering makes peer groups singleton, so "
    "percent_rank/cume_dist are integer ratios — engine-identical doubles.",
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
        F.first("c_custkey").over(w).alias("richest_key"),
    )


@register(
    "q_histogram",
    """
    SELECT bin,
      CAST(bin*10000 AS DOUBLE) AS bin_lo,
      COUNT(*) AS n,
      MIN(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS min_cents,
      MAX(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS max_cents
    FROM (
      SELECT *, CAST(LEAST(FLOOR(l_extendedprice/10000.0), 7) AS INT) AS bin
      FROM lineitem)
    GROUP BY bin
    """,
    doc="Fixed-width histogram (8 bins of 10k, open-ended top bin) via "
    "floor arithmetic — a width_bucket that needs no UDF and folds "
    "map-side. floor(x/w) on equal doubles is engine-identical.",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bin_col = F.least(
        F.floor(F.col("l_extendedprice") / 10000.0), F.lit(7)
    ).cast("int")
    return (
        li.withColumn("bin", bin_col)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(cents("l_extendedprice")).alias("min_cents"),
            F.max(cents("l_extendedprice")).alias("max_cents"),
        )
        .select(
            "bin",
            (F.col("bin") * 10000).cast("double").alias("bin_lo"),
            "n",
            "min_cents",
            "max_cents",
        )
    )


# ---------------------------------------------------------------------------
# Event-stream analytics — the queries the reference's serving tier would
# grow into (its view is exactly a per-entity event fold; these ask
# cross-entity questions of the same stream).
# ---------------------------------------------------------------------------


@register(
    "q_behavioral",
    """
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.s_ts GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id),
    first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id),
    ret AS (
      SELECT cohort_day,
        CAST(date_diff('day', cohort_day, CAST(e.ts AS DATE)) AS INTEGER)
          AS day_offset,
        COUNT(DISTINCT e.user_id) AS n
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
      WHERE date_diff('day', cohort_day, CAST(e.ts AS DATE)) BETWEEN 0 AND 7
      GROUP BY cohort_day, day_offset),
    ft AS (
      SELECT user_id, event_type AS first_touch FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events) WHERE rn = 1),
    fta AS (
      SELECT ft.first_touch,
        COUNT(*) AS n_purchases,
        COUNT(DISTINCT e.user_id) AS n_buyers
      FROM events e JOIN ft ON e.user_id = ft.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY ft.first_touch)
    SELECT 'funnel' AS analysis, 'signup' AS k,
           (SELECT COUNT(*) FROM s) AS n
    UNION ALL SELECT 'funnel', 'click_after', (SELECT COUNT(*) FROM c)
    UNION ALL SELECT 'funnel', 'purchase_after', (SELECT COUNT(*) FROM p)
    UNION ALL SELECT 'retention',
      concat(strftime(cohort_day, '%Y-%m-%d'), '+',
             CAST(day_offset AS VARCHAR)), n
    FROM ret
    UNION ALL SELECT 'first_touch', first_touch, n_purchases FROM fta
    UNION ALL SELECT 'first_touch_buyers', first_touch, n_buyers FROM fta
    """,
    doc="Behavioral-analytics suite in long format (analysis, k, n): "
    "(a) ordered 3-step funnel (signup → later click → later purchase) "
    "— each stage folds to one row per qualifying user before feeding "
    "the next, so the stage⋈events joins broadcast the shrinking stage "
    "side (AQE falls back to SMJ on user_id at extreme cardinality); "
    "(b) cohort retention — users bucketed by first-seen day, distinct "
    "actives per (cohort '+' day-offset) for the first week; the "
    "first_seen aggregate leaves its output hash-partitioned on "
    "user_id, so the SMJ-regime join back to events adds no exchange "
    "on that side; (c) first-touch attribution — every purchase "
    "credited to the user's earliest event type (rn=1 is "
    "q_latest_state's fold reversed; ties by event_id). Subsumes "
    "round-1's q_funnel/q_retention/q_first_touch.",
)
def q_behavioral(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # ONE user_id exchange for the whole suite (r15, guide §2.4). The old
    # formulation shuffled events by user_id FIVE times (three funnel
    # stage aggregates, the first-seen cohort aggregate, the first-touch
    # window) plus five joins and two countDistinct expansions — 15
    # Exchange nodes for a breadth query. Every per-user quantity the
    # three analyses need is computable from windows over the SAME
    # user_id partitioning, chained so they share one exchange + sort:
    #   s_ts  = min ts of the user's signups,
    #   c_ts  = min ts of clicks after s_ts (references the s_ts window
    #           column — same partition spec, no new exchange),
    #   p_ts  = min ts of purchases after c_ts,
    #   cohort_day / day-offset set (collect_set is bounded: offsets are
    #           confined to 0..7, so the per-user array holds ≤8 ints —
    #           no giant-user skew hazard),
    #   n_purch, and first_touch via row_number over (ts, event_id).
    # One row per user survives (rn = 1); the three analyses then reduce
    # per-user rows with plain counts — the countDistinct expansions
    # disappear because users are already unique. Values are pinned
    # identical to the old join formulation by the DuckDB oracle (the
    # SQL twin above is unchanged).
    w = Window.partitionBy("user_id")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.col("event_type")
    off = F.datediff(F.to_date("ts"), F.col("cohort_day"))
    base = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("s_ts", F.min(F.when(t == "signup", F.col("ts"))).over(w))
        .withColumn(
            "c_ts",
            F.min(
                F.when(
                    (t == "click") & (F.col("ts") > F.col("s_ts")), F.col("ts")
                )
            ).over(w),
        )
        .withColumn(
            "p_ts",
            F.min(
                F.when(
                    (t == "purchase") & (F.col("ts") > F.col("c_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn("cohort_day", F.min(F.to_date("ts")).over(w))
        .withColumn(
            "offs",
            F.collect_set(F.when(off.between(0, 7), off)).over(w),
        )
        .withColumn(
            "n_purch",
            F.sum(F.when(t == "purchase", 1).otherwise(0)).over(w),
        )
        .withColumn("rn", F.row_number().over(wo))
    )
    per_user = base.filter(F.col("rn") == 1).select(
        "user_id",
        "s_ts",
        "c_ts",
        "p_ts",
        "cohort_day",
        "offs",
        F.col("n_purch").cast("long").alias("n_purch"),
        F.col("event_type").alias("first_touch"),
    )

    def unpivot(agg_df, pairs) -> DataFrame:
        legs = F.array(
            *[
                F.struct(
                    a.alias("analysis"), k.alias("k"), n.alias("n")
                )
                for a, k, n in pairs
            ]
        )
        return agg_df.select(F.explode(legs).alias("r")).select(
            "r.analysis", "r.k", "r.n"
        )

    # -- funnel: one global aggregate over per-user rows → 3 rows --------
    funnel = unpivot(
        per_user.agg(
            F.count("s_ts").alias("ns"),
            F.count("c_ts").alias("nc"),
            F.count("p_ts").alias("np"),
        ),
        [
            (F.lit("funnel"), F.lit("signup"), F.col("ns")),
            (F.lit("funnel"), F.lit("click_after"), F.col("nc")),
            (F.lit("funnel"), F.lit("purchase_after"), F.col("np")),
        ],
    )

    # -- retention: per-user distinct day offsets → plain count ----------
    retention = (
        per_user.select(
            "cohort_day", F.explode("offs").alias("day_offset")
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            F.lit("retention").alias("analysis"),
            F.concat_ws(
                "+",
                F.date_format("cohort_day", "yyyy-MM-dd"),
                F.col("day_offset").cast("string"),
            ).alias("k"),
            F.col("n_active").alias("n"),
        )
    )

    # -- first-touch attribution: buyers are unique per-user rows --------
    first_touch = unpivot(
        per_user.filter(F.col("n_purch") > 0)
        .groupBy("first_touch")
        .agg(
            F.sum("n_purch").alias("n_purchases"),
            F.count(F.lit(1)).alias("n_buyers"),
        ),
        [
            (F.lit("first_touch"), F.col("first_touch"), F.col("n_purchases")),
            (
                F.lit("first_touch_buyers"),
                F.col("first_touch"),
                F.col("n_buyers"),
            ),
        ],
    )

    return funnel.unionByName(retention).unionByName(first_touch)


# ---------------------------------------------------------------------------
# Scale techniques with result-equivalence oracles
# ---------------------------------------------------------------------------


@register(
    "q_salted_join",
    f"""
    SELECT o_orderpriority, COUNT(*) AS n,
      CAST(SUM({CENTS.format(c='l_extendedprice')}) AS DOUBLE)/100 AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Skew-salted fact⋈dim join (operators/partitioning.py "
    "skew_salted_join: fact keys salted n-ways, dim replicated n×, join "
    "on (key, salt)) proven RESULT-IDENTICAL to the plain join the oracle "
    "runs. This is the manual remedy for hot keys that AQE's skew split "
    "can't fix (e.g. one key larger than a single reducer); the oracle "
    "pins that salting never changes semantics. The dim is hinted "
    "shuffle_hash: salting targets the shuffle-join regime (if the dim "
    "were broadcast-size you wouldn't salt), and broadcasting the n×-"
    "replicated dim is the one strictly-worse plan — measured 2.4× "
    "slower at sf0.1.",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    dim = orders.select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    ).hint("shuffle_hash")
    joined = skew_salted_join(
        li,
        dim,
        on="l_orderkey",
        unique_col=F.concat_ws("-", "l_orderkey", "l_linenumber"),
        n=8,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(cents("l_extendedprice")).cast("double") / 100).alias(
            "revenue"
        ),
    )


@register(
    "q_token_topk",
    """
    SELECT 'topk' AS suite, CAST(NULL AS BIGINT) AS doc_id,
      CAST(NULL AS INTEGER) AS pos, tok, n
    FROM (
      SELECT tok, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text,' ')) AS tok FROM documents)
      GROUP BY tok ORDER BY n DESC, tok LIMIT 20)
    UNION ALL
    SELECT 'posexplode' AS suite, doc_id, CAST(u.pos AS INTEGER) AS pos,
      u.tok AS tok, CAST(NULL AS BIGINT) AS n
    FROM (
      SELECT doc_id,
        unnest(list_transform(string_split(text,' '),
               (tok, i) -> struct_pack(pos := i-1, tok := tok))) AS u
      FROM documents)
    WHERE u.pos < 5
    """,
    doc="Token-generator suite (r13 merge, the r6 pattern — frees a "
    "catalog slot for q_dedup_paragraphs while keeping both shapes "
    "value-checked): suite='topk' is the corpus-wide top-20 token "
    "frequencies (explode → map-side-combined count → "
    "TakeOrderedAndProject bounded per-task heap, never a full "
    "vocabulary sort); suite='posexplode' is the positional explode "
    "(token + 0-based position, first 5 per doc) — the LATERAL "
    "VIEW/table-generator surface, one Generate node, no shuffle; the "
    "DuckDB leg builds (pos, tok) structs with an indexed lambda since "
    "its lateral table functions can't correlate.",
)
def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_event_stream_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    topk = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
        .select(
            F.lit("topk").alias("suite"),
            F.lit(None).cast("long").alias("doc_id"),
            F.lit(None).cast("int").alias("pos"),
            "tok",
            "n",
        )
    )
    posex = (
        docs.select(
            "doc_id", F.posexplode(tokens("text")).alias("pos", "tok")
        )
        .filter(F.col("pos") < 5)
        .select(
            F.lit("posexplode").alias("suite"),
            "doc_id",
            "pos",
            "tok",
            F.lit(None).cast("long").alias("n"),
        )
    )
    return topk.unionByName(posex)


# ---------------------------------------------------------------------------
# Wave 3: lateral / deterministic-sampling breadth
# ---------------------------------------------------------------------------


@register(
    "q_hash_sample",
    """
    SELECT COUNT(*) AS n_sampled,
      CAST(SUM(CAST(ROUND(value*100,0) AS BIGINT)) AS BIGINT) AS sum_cents,
      COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE (((event_id % 2147483648) * 2654435761) % 4294967296) % 100 < 10
    """,
    doc="Deterministic ~10% sample via multiplicative (Knuth) hashing of "
    "the unique key — replayable across engines, retries, and restarts, "
    "unlike rand()-based TABLESAMPLE. The predicate is pure int64 "
    "arithmetic, evaluated map-side (the key folds mod 2^31 first so the "
    "multiply can never overflow int64 — see operators/sampling.py); "
    "this is the debugging/sampling primitive a 100 TB pipeline uses to "
    "iterate on 10 TB.",
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_event_stream_spark.operators.sampling import hash_sample

    ev = load_table(spark, sf_dir, "events")
    return hash_sample(ev, "event_id", percent=10).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(cents("value")).alias("sum_cents"),
        F.countDistinct("user_id").alias("n_users"),
    )
