"""Stage decomposition + runtime-partition-count probes for the stress
entries the r14 verdict flags as core-insensitive (corpus_pipeline_25x,
phash_audio_dedup, warc_corpus_e2e) — guide §1: measure first, find WHERE
the wall time goes and at what parallelism each stage actually runs.

Usage: python tools/r15_decompose.py <probe> [sf_dir]
Probes: parts | pipeline | warc | audio | lm | bloom
Env: SPARK_GRAFT_CPUS (default 32).

Runtime partition counts are read from the RDD that an executed (persisted
+ counted) DataFrame caches — the AQE-final counts, not the pre-execution
plan's — because that is what decides how many cores a downstream stage
can use.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nexus_event_stream_spark.session import get_spark  # noqa: E402


def runtime_parts(df) -> int:
    """AQE-final partition count of a materialized relation: persist,
    run, and count the cached RDD's partitions."""
    df = df.persist()
    df.count()
    n = df.rdd.getNumPartitions()
    df.unpersist()
    return n


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.2f}s")
    return out, dt


def probe_parts(spark, sf_dir):
    """Runtime partition counts after the shuffles the stress tier relies
    on — the AQE-coalesce question."""
    import bench

    from nexus_event_stream_spark.operators.dedup import (
        exact_dedup_annotate,
        minhash_dedup,
        minhash_signatures,
    )

    docs = bench._replicate_docs(spark, sf_dir).persist()
    n = docs.count()
    print(f"docs(25x): rows={n} parts={docs.rdd.getNumPartitions()}")

    ex = exact_dedup_annotate(docs).filter(
        F.col("doc_id") == F.col("exact_keep_id")
    ).drop("exact_keep_id", "n_copies")
    print(f"post-exact-dedup parts={runtime_parts(ex)}")

    sigs = minhash_signatures(docs)
    print(f"signatures parts={runtime_parts(sigs)}")

    pairs = minhash_dedup(docs, max_bucket_size=200)
    print(f"verified pairs parts={runtime_parts(pairs)}")

    # CC internals: seed labels partitioning
    from nexus_event_stream_spark.operators.dedup import connected_components

    rounds = []
    comp = connected_components(pairs, rounds_out=rounds)
    print(f"cc labels parts={comp.rdd.getNumPartitions()} rounds={rounds}")
    spark.catalog.clearCache()


def probe_pipeline(spark, sf_dir):
    """Wall-clock decomposition of the corpus_pipeline_25x timed region."""
    import bench

    from nexus_event_stream_spark.operators.dedup import (
        dedup_groups,
        minhash_dedup,
    )
    from nexus_event_stream_spark.pipeline import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    docs = bench._replicate_docs(spark, sf_dir).persist()
    docs.count()
    sources = [r.source for r in docs.select("source").distinct().collect()]
    recipe = CorpusRecipe(
        minhash_params={"threshold": 0.05, "max_bucket_size": 200},
        benchmark=docs.filter(F.col("doc_id") % 50 == 0),
        decontaminate_n=3,
        passage_dedup_n=3,
        mixture={s: 1.5 for s in sources},
        seq_len=512,
        persist_deduped=True,
    )
    for run in range(2):
        base = bench._pinned_ids(spark)
        total0 = time.perf_counter()
        (corpus_stages, dt_prepare) = t(
            f"[run {run}] prepare_training_corpus (eager: CC + guard jobs)",
            lambda: prepare_training_corpus(docs, recipe),
        )
        _, stages = corpus_stages
        _, dt_pack = t(
            f"[run {run}] packing noop write (lazy tail)",
            lambda: stages["packing"].write.format("noop").mode("overwrite").save(),
        )
        print(f"  [run {run}] TOTAL {time.perf_counter() - total0:.2f}s")
        stages["near_dedup"].unpersist()
        stages["exact_dedup"].unpersist()
        bench._isolate_entry(spark, base, (docs,))

    # inner decomposition of the eager part: minhash pairs vs CC
    base = bench._pinned_ids(spark)
    pairs, _ = t("minhash_dedup pairs materialize (count)", lambda: (
        lambda p: (p.persist(), p.count(), p)[2]
    )(minhash_dedup(docs, threshold=0.05, max_bucket_size=200)))
    t("dedup_groups (CC) on materialized pairs", lambda: dedup_groups(docs, pairs).count())
    bench._isolate_entry(spark, base, (docs,))


def probe_warc(spark, sf_dir):
    import shutil
    import tempfile

    import bench

    from nexus_event_stream_spark.io import load_table
    from nexus_event_stream_spark.pipeline import CorpusRecipe, warc_corpus

    warc_dir = tempfile.mkdtemp(prefix="r15_warc_")
    bench._write_bench_warc(spark, sf_dir, warc_dir, n_files=8)
    try:
        for run in range(2):
            base = bench._pinned_ids(spark)
            t0 = time.perf_counter()
            corpus, stages = warc_corpus(
                spark,
                warc_dir + "/*.warc",
                recipe=CorpusRecipe(),
                html_extract="main_content",
                dedup_urls=True,
            )
            print(f"  [run {run}] warc_corpus returned (eager part): "
                  f"{time.perf_counter() - t0:.2f}s")
            t(f"[run {run}] corpus noop write", lambda: corpus.write.format(
                "noop").mode("overwrite").save())
            print(f"  [run {run}] TOTAL {time.perf_counter() - t0:.2f}s")
            bench._isolate_entry(spark, base)
    finally:
        shutil.rmtree(warc_dir, ignore_errors=True)


def probe_audio(spark, sf_dir):
    import shutil
    import tempfile

    import bench

    from nexus_event_stream_spark.io import load_table
    from nexus_event_stream_spark.operators.dedup import connected_components
    from nexus_event_stream_spark.operators.phash import (
        perceptual_audio_hashes,
        phash_pairs,
    )

    audio_dir = tempfile.mkdtemp(prefix="r15_audio_")
    bench._write_bench_audio(
        spark, load_table(spark, sf_dir, "documents").select("doc_id"),
        audio_dir,
    )
    audio = spark.read.parquet(audio_dir)
    print(f"audio rows={audio.count()} parts={audio.rdd.getNumPartitions()}")
    try:
        for run in range(2):
            base = bench._pinned_ids(spark)
            hashes = perceptual_audio_hashes(audio).persist()
            t(f"[run {run}] fingerprint", hashes.count)
            print(f"    hashes parts={hashes.rdd.getNumPartitions()}")
            pairs = phash_pairs(
                hashes, max_hamming=3, max_bucket_size=200
            ).persist()
            t(f"[run {run}] banded pairs", pairs.count)
            print(f"    pairs parts={pairs.rdd.getNumPartitions()}")
            rounds = []
            comp, _ = t(f"[run {run}] CC", lambda: (
                lambda c: (c.count(), c)[1]
            )(connected_components(pairs, a_col="id_a", b_col="id_b",
                                   rounds_out=rounds)))
            print(f"    rounds={rounds} labels parts={comp.rdd.getNumPartitions()}")
            t(f"[run {run}] keeper join", lambda: (
                hashes.select("media_id", "decoded")
                .join(
                    comp.select(
                        F.col("node").alias("media_id"),
                        F.col("comp").alias("keep_id"),
                    ),
                    "media_id",
                    "left",
                )
                .write.format("noop").mode("overwrite").save()
            ))
            bench._isolate_entry(spark, base)
    finally:
        shutil.rmtree(audio_dir, ignore_errors=True)


def probe_lm(spark, sf_dir):
    import pickle

    import bench

    from nexus_event_stream_spark.io import load_table
    from nexus_event_stream_spark.operators.lm import (
        perplexity_score,
        train_char_lm,
    )

    docs = bench._replicate_docs(spark, sf_dir).persist()
    docs.count()
    lm_model = train_char_lm(
        load_table(spark, sf_dir, "documents"), n=3, min_count=2
    )
    blob = pickle.dumps(lm_model)
    print(f"model pickle bytes={len(blob)}")
    t0 = time.perf_counter()
    for _ in range(10):
        pickle.loads(blob)
    print(f"model unpickle: {(time.perf_counter()-t0)/10*1000:.1f} ms/task")
    for run in range(4):
        base = bench._pinned_ids(spark)
        t(f"[run {run}] lm_ppl 25x noop", lambda: perplexity_score(
            docs, lm_model).write.format("noop").mode("overwrite").save())
        bench._isolate_entry(spark, base, (docs,))


def probe_bloom(spark, sf_dir):
    import bench

    from nexus_event_stream_spark.io import load_table
    from nexus_event_stream_spark.operators.bloom_dedup import (
        bloom_dedup_paragraphs,
        reference_corpus_bloom,
    )

    docs = bench._replicate_docs(spark, sf_dir).persist()
    docs.count()
    ref = reference_corpus_bloom(
        load_table(spark, sf_dir, "documents"), grain="paragraph", fpr=1e-6
    )
    print(f"bloom words={ref.n_words} (~{ref.n_words*8/1024:.0f} KiB literal)")
    for run in range(4):
        base = bench._pinned_ids(spark)
        t(f"[run {run}] bloom_ref_dedup 25x noop", lambda: bloom_dedup_paragraphs(
            docs, ref).write.format("noop").mode("overwrite").save())
        bench._isolate_entry(spark, base, (docs,))


def main() -> int:
    probe = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name=f"r15-{probe}", master=f"local[{cpus}]")
    fn = globals()[f"probe_{probe}"]
    t0 = time.time()
    fn(spark, sf_dir)
    print(f"probe {probe} done in {time.time()-t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
