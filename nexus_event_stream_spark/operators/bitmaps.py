"""Exact distinct counting via bucketed roaring-style bitmaps.

The exact counterpart to the KMV sketches (operators/sketches.py): where
KMV trades exactness for constant size on arbitrary types, this tier keeps
integer-keyed distinct counts EXACT and still mergeable — the question it
answers at 100 TB is "how many distinct user/doc ids, today ∪ yesterday ∪
last month" without ever re-scanning old data or shuffling distinct rows.

Built on Spark 3.5+'s bitmap expression family (``bitmap_bucket_number`` /
``bitmap_bit_position`` / ``bitmap_construct_agg`` / ``bitmap_or_agg`` /
``bitmap_count``), which maps every BIGINT injectively to a (bucket,
bit-position) pair over fixed 4096-byte bucket bitmaps (verified: bucket
⌈v/32768⌉ for v ≥ 1, non-positives mirror into bucket ≤ 0 — all longs are
representable, no sign restriction).

Scale shape:
- **build**: ONE aggregation — map-side partial ``bitmap_construct_agg``
  compresses each task's keys into per-bucket bitmaps before the exchange,
  so shuffle bytes are bounded by (occupied buckets × 4 KB), ~1 bit per
  possible id in the occupied range — for dense id spaces that is far
  below a ``count_distinct`` shuffle (8+ bytes per distinct value).
- **merge**: bitmaps OR — associative, idempotent, exact. Per-day/-source
  bucket tables are plain parquet (bucket BIGINT, bmp BINARY); rollups of
  any subset need only the bitmap tables, never the data.
- **algebra**: |A∩B| = |A| + |B| − |A∪B| by inclusion-exclusion, all
  exact, so Jaccard between sources is exact too.

When NOT to use it: sparse/hashed domains (e.g. ``xxhash64`` of strings)
occupy ~one bucket per key — 4 KB each — and the KMV sketch is the right
tool there. This tier is for genuine integer id spaces.

Reference parity: no analogue — the reference counts with Postgres
``COUNT(DISTINCT)`` at toy scale. North-star corpus-profiling tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Schema every bitmap-bucket table shares; parquet-writable as-is.
BUCKETS_SCHEMA = "bucket bigint, bmp binary"


def _key(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def bitmap_buckets(df: DataFrame, col: Column | str) -> DataFrame:
    """One aggregation over ``df`` → the exact membership bitmap of
    ``col``, bucketed: (bucket, bmp) with 32768 bits per bucket. NULL keys
    are excluded (NULL is "no value", matching COUNT(DISTINCT))."""
    k = _key(col)
    return (
        df.where(k.isNotNull())
        .select(k.cast("long").alias("__k"))
        .groupBy(F.expr("bitmap_bucket_number(__k)").alias("bucket"))
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(__k))").alias("bmp"))
    )


def bitmap_buckets_by(
    df: DataFrame, group_col: str, col: Column | str
) -> DataFrame:
    """Per-group bitmaps in the same single aggregation:
    (group, bucket, bmp) — the grain for per-source/per-day rollups."""
    k = _key(col)
    return (
        df.where(k.isNotNull())
        .select(F.col(group_col).alias("grp"), k.cast("long").alias("__k"))
        .groupBy("grp", F.expr("bitmap_bucket_number(__k)").alias("bucket"))
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(__k))").alias("bmp"))
    )


def bitmap_union(*bucket_tables: DataFrame) -> DataFrame:
    """OR-merge bitmap tables (idempotent, associative): the union's exact
    bitmap. Cost is proportional to occupied buckets, not to data."""
    if not bucket_tables:
        raise ValueError("need at least one bucket table")
    out = bucket_tables[0].select("bucket", "bmp")
    for t in bucket_tables[1:]:
        out = out.unionAll(t.select("bucket", "bmp"))
    return (
        out.groupBy("bucket").agg(F.expr("bitmap_or_agg(bmp)").alias("bmp"))
    )


def bitmap_cardinality(buckets: DataFrame) -> int:
    """Exact distinct count from a bucket table: Σ bitmap_count(bmp)."""
    row = buckets.agg(
        F.coalesce(F.sum(F.expr("bitmap_count(bmp)")), F.lit(0)).alias("n")
    ).collect()[0]
    return int(row["n"])


def bitmap_distinct_count(df: DataFrame, col: Column | str) -> int:
    """Exact COUNT(DISTINCT col) in one bitmap aggregation."""
    return bitmap_cardinality(bitmap_buckets(df, col))


def bitmap_intersection_count(a: DataFrame, b: DataFrame) -> int:
    """Exact |A ∩ B| from two bucket tables by inclusion-exclusion —
    no AND aggregate exists in the expression family, and |A|+|B|−|A∪B|
    needs only the OR we already have."""
    return (
        bitmap_cardinality(a)
        + bitmap_cardinality(b)
        - bitmap_cardinality(bitmap_union(a, b))
    )


def bitmap_jaccard(a: DataFrame, b: DataFrame) -> float:
    """Exact Jaccard |A∩B|/|A∪B| between two bucket tables."""
    na, nb = bitmap_cardinality(a), bitmap_cardinality(b)
    nu = bitmap_cardinality(bitmap_union(a, b))
    if nu == 0:
        return 0.0
    return (na + nb - nu) / nu


def write_bitmap_index(buckets: DataFrame, path: str) -> None:
    """Persist a bucket table next to its snapshot — later runs union
    against it without touching the snapshot's data files."""
    buckets.select("bucket", "bmp").write.mode("overwrite").parquet(path)


def read_bitmap_index(spark, path: str) -> DataFrame:
    return spark.read.schema(BUCKETS_SCHEMA).parquet(path)
