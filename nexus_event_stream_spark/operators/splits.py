"""Leakage-safe train/eval splits: held-out data the training set cannot see.

Benchmark decontamination (quality.decontaminate) protects OTHER people's
eval suites; this protects YOUR OWN held-out split. A random split of a
web-scale corpus leaks: near-duplicate pages (mirrors, boilerplate
rewrites, syndicated articles) land on both sides, and the model "memorizes"
its eval set through the train-side twins — eval loss reads better than
reality. The fix is structural: after the deterministic hash split, any
train document NEAR-DUPLICATE of an eval document is quarantined.

Built from the package's dedup machinery (operators/dedup.py), reused not
reimplemented — ONE MinHash signature pass over the corpus, LSH banding,
and a CROSS-SIDE bucket join (train×eval within a bucket, never the full
self-join the dedup path needs), then exact-Jaccard verification on the
hashed shingle sets.

Skew/adversarial defense, same philosophy as `max_bucket_size` in
minhash_lsh_candidates but with the safety inverted: a degenerate
boilerplate bucket (thousands of docs sharing one band key) would make
train×eval quadratic — with the cap set, hot buckets SKIP verification
and every train member is quarantined outright. For a leakage guard the
conservative direction is to DROP more train data, never to leak; a few
thousand boilerplate docs are no loss to a 100 TB corpus.

Scale shape: signature pass is a narrow map (no shuffle); the bucket join
shuffles (doc, bucket) pairs — bounded by bands·|docs|; verification
touches candidate pairs only. Quarantine is one broadcast-ready anti-join
on the (small) leaked-id set.

Determinism: the split is a pure function of the id (Knuth hash, same
convention as operators/sampling.py), so re-running the pipeline
reproduces the same split; growing ``eval_permille`` keeps the old eval
set a strict subset (monotone membership, the sampling-tier property).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from nexus_event_stream_spark.operators.dedup import (
    band_key_array,
    jaccard,
    minhash_signatures,
)
from nexus_event_stream_spark.operators.sampling import hash_bucket

TRAIN, EVAL, QUARANTINED = "train", "eval", "quarantined"

#: Quarantined-id sets at or below this size are collected and embedded
#: into the split plan as a local relation (zero residual cache); larger
#: sets stay as a persisted relation the caller can clear. Sized off the
#: ACTUAL driver cost, not raw value bytes (ADVICE r7): collect
#: materializes Python Row objects (~100s of bytes each, worse for
#: string/UUID ids) and the local relation re-serializes into the plan —
#: 100k ids ≈ tens of MB transiently, safely under any sane driver heap;
#: 1M was hundreds of MB.
_LEAKED_COLLECT_CAP = 100_000


def hash_split(
    df: DataFrame, id_col: str = "doc_id", eval_permille: int = 100
) -> DataFrame:
    """Append ``split`` ∈ {train, eval}: deterministic, id-pure, monotone
    in ``eval_permille`` (a 5 % eval set is a subset of the 10 % one).

    Non-numeric ids (UUIDs, URLs) are pre-hashed with ``xxhash64`` —
    ``hash_bucket`` is integer arithmetic, and a string fed to it would
    cast to NULL and silently land EVERY row in train.

    NULL ids are an explicit EXECUTION-TIME error (``raise_error`` inside
    the split expression — distributed, no extra validation job): for
    integer ids ``hash_bucket(NULL)`` is NULL so every NULL-id row would
    silently land in train, while ``xxhash64(NULL)`` is the seed constant
    so all NULL-id rows would collide into one bucket and could all land
    in eval — either way a silent bias a leakage-safety primitive must
    refuse, the same rationale as the empty-shingle exclusion in
    ``leakage_pairs``. Assign surrogate ids first if NULLs are expected."""
    if not (0 < eval_permille < 1000):
        raise ValueError("eval_permille must be in 1..999")
    key: Column = F.col(id_col)
    if dict(df.dtypes)[id_col] not in (
        "tinyint", "smallint", "int", "bigint",
    ):
        key = F.xxhash64(key)
    return df.withColumn(
        "split",
        F.when(
            F.col(id_col).isNull(),
            F.raise_error(
                F.lit(
                    f"hash_split: NULL {id_col} — a NULL id cannot be "
                    "deterministically assigned a side; filter or assign "
                    "surrogate ids first"
                )
            ).cast("string"),
        )
        .when(hash_bucket(key, 1000) < eval_permille, F.lit(EVAL))
        .otherwise(F.lit(TRAIN)),
    )


def leakage_pairs(
    split_df: DataFrame,
    threshold: float = 0.5,
    num_perm: int = 16,
    shingle_n: int = 3,
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-side near-duplicate pairs: (train_id, eval_id, jaccard ≥
    threshold) — plus, when ``max_bucket_size`` is set, hot-bucket train
    members as (train_id, eval_id=NULL, jaccard=NULL) rows, quarantined
    WITHOUT verification (the conservative direction for a leakage guard).

    One signature pass over both sides together (the split column rides
    along, the relation is persisted — it feeds banding and the verify
    join, and AQE never reuses exchanges across broadcast joins, the
    minhash_dedup lesson), then a train×eval bucket join carrying IDS
    ONLY (shingle arrays re-join for candidate verification, never ride
    through explode/window/distinct) — never a self-join.

    Docs with EMPTY shingle sets (text shorter than ``shingle_n`` tokens,
    NULL text) are excluded before banding: minhash_signatures gives them
    all one identical sentinel signature, which would collapse every
    short doc on both sides into a single degenerate bucket — quadratic
    without the cap, blanket false quarantine with it — yet an empty
    shingle set cannot leak (its Jaccard with anything is 0)."""
    sigs = (
        minhash_signatures(
            split_df, num_perm, shingle_n, id_col=id_col, text_col=text_col
        )
        .filter(F.size("__shingles") > 0)
        .join(
            split_df.select(F.col(id_col).alias("doc_id"), "split"), "doc_id"
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    keyed = sigs.select(
        "doc_id",
        "split",
        F.explode(band_key_array(bands, rows_per_band)).alias("bucket"),
    )
    hot_rows = None
    if max_bucket_size is not None:
        from pyspark.sql import Window

        wb = Window.partitionBy("bucket")
        sized = keyed.withColumn("__bsz", F.count(F.lit(1)).over(wb))
        # hot buckets: quarantine their TRAIN members outright — the
        # bucket join below never sees them, so train×eval cannot go
        # quadratic on boilerplate
        hot_rows = (
            sized.filter(
                (F.col("__bsz") > max_bucket_size)
                & (F.col("split") == TRAIN)
            )
            .select(
                F.col("doc_id").alias("train_id"),
                F.lit(None)
                .cast(dict(split_df.dtypes)[id_col])
                .alias("eval_id"),
                F.lit(None).cast("double").alias("jaccard"),
            )
            .distinct()
        )
        keyed = sized.filter(F.col("__bsz") <= max_bucket_size).drop("__bsz")
    t = keyed.filter(F.col("split") == TRAIN).alias("t")
    e = keyed.filter(F.col("split") == EVAL).alias("e")
    cand = (
        t.join(e, F.col("t.bucket") == F.col("e.bucket"))
        .select(
            F.col("t.doc_id").alias("train_id"),
            F.col("e.doc_id").alias("eval_id"),
        )
        .distinct()
    )
    shing = sigs.select("doc_id", "__shingles")
    verified = (
        cand.join(shing.alias("st"), F.col("train_id") == F.col("st.doc_id"))
        .join(shing.alias("se"), F.col("eval_id") == F.col("se.doc_id"))
        .select(
            "train_id",
            "eval_id",
            jaccard(F.col("st.__shingles"), F.col("se.__shingles")).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    if hot_rows is not None:
        verified = verified.unionAll(hot_rows)
    # Materialize the (small — leaked pairs only) result NOW so the big
    # cached relation (full-corpus signatures + shingles) can be released
    # before returning: repeated calls in a long-lived session must not
    # accumulate corpus-sized cached partitions (ADVICE r6). The caller
    # owns `result.unpersist()` on the returned handle; unpersisting is
    # always safe (Spark recomputes on touch).
    verified = verified.persist(StorageLevel.MEMORY_AND_DISK)
    verified.count()
    sigs.unpersist()
    return verified


def leakage_safe_split(
    df: DataFrame,
    eval_permille: int = 100,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    **lsh_kwargs,
) -> DataFrame:
    """The composed recipe: hash split, find train-side leaks, relabel
    them ``quarantined``. Output = input columns + ``split`` ∈
    {train, eval, quarantined}; eval is NEVER touched (the held-out set
    must stay stable across reprocessing — only train shrinks).

    Cache hygiene: ``leakage_pairs``'s persisted result is released before
    returning. When the quarantined-id set is small (the designed regime)
    it is collected and embedded into the plan as a local relation — the
    returned DataFrame then references NO cached state at all; past
    ``_LEAKED_COLLECT_CAP`` ids it stays a persisted relation (documented
    residual — the caller may ``spark.catalog.clearCache()`` after
    materializing the split)."""
    split_df = hash_split(df, id_col=id_col, eval_permille=eval_permille)
    pairs = leakage_pairs(
        split_df,
        threshold=threshold,
        id_col=id_col,
        text_col=text_col,
        **lsh_kwargs,
    )
    leaked = pairs.select(F.col("train_id").alias(id_col)).distinct()
    n_leaked = leaked.count()
    if n_leaked <= _LEAKED_COLLECT_CAP:
        import pandas as pd

        # plain values in an Arrow-backed pandas frame, not a list of Row
        # objects: createDataFrame(pandas) ships one Arrow batch into the
        # local relation instead of pickling per-row (ADVICE r7)
        vals = [r[0] for r in leaked.collect()]
        pairs.unpersist()
        leaked = split_df.sparkSession.createDataFrame(
            pd.DataFrame({id_col: vals}), schema=leaked.schema
        )
    else:
        leaked = leaked.persist(StorageLevel.MEMORY_AND_DISK)
        leaked.count()
        pairs.unpersist()
    return (
        split_df.join(leaked.withColumn("__leak", F.lit(1)), id_col, "left")
        .withColumn(
            "split",
            F.when(
                (F.col("split") == TRAIN) & F.col("__leak").isNotNull(),
                F.lit(QUARANTINED),
            ).otherwise(F.col("split")),
        )
        .drop("__leak")
    )
