"""Partitioning strategies for scale: bucketing and skew salting.

These are the knobs the 100 TB deployment turns (SURVEY.md §4): bucketing
co-locates repeated joins/aggregations on a key so they run shuffle-free;
salting splits pathological hot keys across reducers when AQE's skew-join
handling isn't applicable (e.g. skewed *aggregations*).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str | Sequence[str], buckets: int = 32
) -> None:
    """Persist as a bucketed (+ sorted) table: subsequent equi-joins and
    group-bys on ``key`` between tables bucketed the same way plan with NO
    exchange — the shuffle is paid once at write time.
    """
    keys = [key] if isinstance(key, str) else list(key)
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables (shuffle-free when bucket specs match)."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on_cols, how)


def salt_col(unique_col: str | Column, n: int) -> Column:
    """Deterministic salt in [0, n) derived from a unique column — stable
    across retries/replays (never use rand() in a restartable pipeline)."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c), F.lit(n)).cast("int")


def salted_sum_count(
    df: DataFrame,
    key: Sequence[str],
    sum_cols: dict[str, Column],
    unique_col: str,
    n: int = 16,
) -> DataFrame:
    """Skew-resistant grouped sum/count: pre-aggregate on (key, salt) —
    splitting any hot key across ``n`` reducers — then finalize on key.

    Only algebraic aggregates (sum/count here) decompose this way; that is
    exactly why the engine keeps its money-sums in exact integer cents.
    Output: key..., n_rows, <name> per sum_cols entry.
    """
    keys = list(key)
    partial = (
        df.withColumn("__salt", salt_col(unique_col, n))
        .groupBy(*keys, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            *[expr.alias(f"__s_{name}") for name, expr in
              ((nm, F.sum(c)) for nm, c in sum_cols.items())],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__cnt").alias("n_rows"),
        *[F.sum(f"__s_{name}").alias(name) for name in sum_cols],
    )


def replicate_dim_for_salt(dim: DataFrame, n: int) -> DataFrame:
    """Explode a dimension n× with a __salt column so a salted fact can
    equi-join on (key, __salt) — the manual skew-join for cases AQE can't
    rewrite (e.g. when the skewed side feeds a co-grouped operation)."""
    return dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))


def skew_salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    unique_col: str,
    n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``fact`` has hot keys: fact rows get a deterministic
    salt, the dim is replicated n×, and the join key becomes (on, salt) —
    each hot key now spreads over n reducer partitions."""
    f = fact.withColumn("__salt", salt_col(unique_col, n))
    d = replicate_dim_for_salt(dim, n)
    return f.join(d, [on, "__salt"], how).drop("__salt")
