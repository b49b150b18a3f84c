"""Physical-plan regression tests — the scale properties are part of the
contract, not an accident: filters must reach the parquet scan, small dims
must broadcast, top-k must not global-sort. If a refactor breaks one of
these, correctness tests stay green but 100 TB behavior regresses; these
tests pin it.
"""

from __future__ import annotations

import pytest

from nexus_event_stream_spark.plans.catalog import CATALOG


def physical_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushed_to_scan(spark, sf_dir):
    plan = physical_plan(CATALOG["q_filter_priority"].build(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "EqualTo(event_type,purchase)" in plan


def test_point_lookup_pushdown(spark, sf_dir):
    # the point-lookup side of the merged listing-read suite still pushes
    # its pk predicate to the scan (index-seek analogue)
    plan = physical_plan(CATALOG["q_pagination"].build(spark, sf_dir))
    assert "EqualTo(event_id,42)" in plan


def test_star_join_broadcasts_dims_and_prunes_columns(spark, sf_dir):
    plan = physical_plan(CATALOG["q_join_star"].build(spark, sf_dir))
    # every dim side broadcast, fact side never shuffled before the agg
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # column pruning: the lineitem scan reads exactly the 3 needed columns
    li_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line and "l_orderkey" in line
    )
    assert (
        "struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"
        in li_schema
    )


def test_topk_uses_take_ordered_not_global_sort(spark, sf_dir):
    plan = physical_plan(CATALOG["q_list_newest"].build(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_denorm_join_broadcasts_user_dim(spark, sf_dir):
    plan = physical_plan(CATALOG["q_denorm_join"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_lww_fold_single_shuffle(spark, sf_dir):
    plan = physical_plan(CATALOG["q_latest_state"].build(spark, sf_dir))
    # one hash exchange on the entity key and no more ("(N) Exchange" is
    # the detail header, one per physical exchange node)
    assert plan.count(") Exchange") == 1
    # rank<=1 is pushed below the shuffle (WindowGroupLimit, Spark 3.5+):
    # each map task pre-drops rows that cannot be the per-key latest
    assert "WindowGroupLimit" in plan


def test_group_agg_partial_aggregation(spark, sf_dir):
    plan = physical_plan(CATALOG["q_group_agg"].build(spark, sf_dir))
    # map-side combine: HashAggregate appears before AND after the exchange
    assert plan.count(") HashAggregate") >= 2
    # map-side combine before the exchange
    assert "partial_sum" in plan and "partial_count" in plan


def test_pagination_take_ordered_with_offset_no_window(spark, sf_dir):
    plan = physical_plan(CATALOG["q_pagination"].build(spark, sf_dir))
    # offset+limit folds into TakeOrderedAndProject (bounded per-task
    # heap); a global ranking window would drag all rows to one partition
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_grouping_sets_single_expand_single_shuffle(spark, sf_dir):
    plan = physical_plan(CATALOG["q_grouping_breadth"].build(spark, sf_dir))
    # all four grouping sets computed in ONE pass: Expand + hash agg,
    # one exchange — not a union of four separate group-bys
    assert plan.count(") Expand") == 1
    assert plan.count(") Exchange") == 1
    assert "Union" not in plan


def test_window_ntile_shares_one_window_node(spark, sf_dir):
    plan = physical_plan(CATALOG["q_window_ntile"].build(spark, sf_dir))
    # ntile/percent_rank/cume_dist/first all share one window spec →
    # one Window node, one hash exchange, one sort
    assert plan.count(") Window") == 1
    assert plan.count(") Exchange") == 1


def test_scalar_breadth_pure_projection_no_shuffle(spark, sf_dir):
    plan = physical_plan(CATALOG["q_scalar_breadth"].build(spark, sf_dir))
    assert "Exchange" not in plan  # scalar projection stays map-side


def test_window_analytics_one_exchange_for_both_frames(spark, sf_dir):
    plan = physical_plan(CATALOG["q_window_analytics"].build(spark, sf_dir))
    # ROWS frame and trailing-hour RANGE frame share the user_id
    # partitioning: one hash exchange feeds both Window nodes
    assert plan.count(") Exchange") == 1


def test_histogram_partial_aggregation(spark, sf_dir):
    plan = physical_plan(CATALOG["q_histogram"].build(spark, sf_dir))
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_salted_join_joins_on_salt(spark, sf_dir):
    plan = physical_plan(CATALOG["q_salted_join"].build(spark, sf_dir))
    # the salt column must participate in the join key — that's the whole
    # mechanism (hot key split across n reducers)
    assert "__salt" in plan
    # and it must be a shuffle join: broadcasting the replicated dim would
    # defeat the purpose (and measured 2.4× slower at sf0.1)
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_sketch_stats_joins_broadcast(spark, sf_dir):
    plan = physical_plan(CATALOG["q_sketch_stats"].build(spark, sf_dir))
    # the 5-row per-group stats side and the 5-row KMV side must
    # broadcast, never sort-merge the facts
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ann_ivf_pure_catalyst_broadcast_sides(spark, sf_dir):
    plan = physical_plan(CATALOG["q_ann_ivf"].build(spark, sf_dir))
    # probe map and query vectors broadcast onto the single corpus scan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # seeded-codebook assignment is pure Catalyst — no Python stage
    assert "MapInPandas" not in plan and "EvalPython" not in plan


def test_token_topk_take_ordered(spark, sf_dir):
    plan = physical_plan(CATALOG["q_token_topk"].build(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_user_profile_single_shuffle(spark, sf_dir):
    plan = physical_plan(CATALOG["q_user_profile"].build(spark, sf_dir))
    # conditional-aggregation pivot: ONE exchange on user_id (the
    # groupBy().pivot() shorthand would plan two-phase agg = 2 exchanges)
    assert plan.count(") Exchange") == 1


def test_agg_breadth_single_shuffle(spark, sf_dir):
    plan = physical_plan(CATALOG["q_agg_breadth"].build(spark, sf_dir))
    # percentiles + collect_set + counts all in one aggregate pass
    assert plan.count(") Exchange") == 1


def test_text_analysis_one_expand_one_shuffle(spark, sf_dir):
    plan = physical_plan(CATALOG["q_text_analysis"].build(spark, sf_dir))
    # both grouping sets (lang)/(source) in one Expand + one exchange
    assert plan.count(") Expand") == 1
    assert plan.count(") Exchange") == 1


def test_doc_profile_map_only_after_spread(spark, sf_dir):
    plan = physical_plan(CATALOG["q_doc_profile"].build(spark, sf_dir))
    # exactly io.spread's round-robin fan-out of the one-row-group local
    # input (pass-through on real splits); NO key shuffle anywhere —
    # everything downstream is map-only
    assert plan.count(") Exchange") == 1
    assert "RoundRobinPartitioning" in plan
    assert "hashpartitioning" not in plan
    # token hashes are projected once, not inlined per SimHash bit
    assert plan.count("array_distinct") == 1


def test_binary_meta_two_python_stages_no_key_shuffle(spark, sf_dir):
    plan = physical_plan(CATALOG["q_binary_meta"].build(spark, sf_dir))
    assert plan.count(") MapInPandas") == 2  # synthesize + decode
    # same contract as q_doc_profile: spread's fan-out only
    assert plan.count(") Exchange") == 1
    assert "RoundRobinPartitioning" in plan
    assert "hashpartitioning" not in plan


def test_bpe_two_python_stages_no_shuffle(spark, sf_dir):
    plan = physical_plan(CATALOG["q_bpe"].build(spark, sf_dir))
    # BPE encode + unigram Viterbi encode are two CHAINED Arrow-batched
    # stages over one corpus scan; both token tables ride in closures,
    # so no join and no exchange anywhere
    assert plan.count(") MapInPandas") == 2
    assert "Exchange" not in plan


def test_connected_components_one_action_per_round_and_cached_labels(
    spark, monkeypatch
):
    """The scale shape of q_dedup_groups' closure step: exactly ONE driver
    action (the label-sum materialization) per propagation round — a
    refactor that sneaks in a second action (e.g. a separate
    localCheckpoint job or a change-count) doubles the per-round cost at
    100 TB. Counted at the DataFrame-API level so AQE's per-stage jobs
    can't skew the number. (r15: one extra isEmpty edge-consistency
    probe runs after the seed — the clique fast path below — it is
    JVM-side and take(1)-bounded, deliberately NOT a per-round cost.)"""
    from nexus_event_stream_spark.operators.dedup import connected_components

    # a 4-node chain: diameter forces exactly 3 propagation rounds
    # (labels: seed → r1 → r2 reach the fixpoint, r3 confirms it)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    # patch the CONCRETE DataFrame class (pyspark 4: pyspark.sql.DataFrame
    # is an ABC; instance methods resolve on the classic subclass)
    cls = type(pairs)
    counts = {"first": 0, "collect": 0, "count": 0}
    for meth in counts:
        orig = getattr(cls, meth)
        monkeypatch.setattr(
            cls,
            meth,
            (
                lambda orig, meth: lambda self: (
                    counts.__setitem__(meth, counts[meth] + 1),
                    orig(self),
                )[1]
            )(orig, meth),
        )
    labels = connected_components(pairs)

    # 1 seed materialization + 3 rounds — and nothing else runs actions
    # (each first() delegates to exactly one internal collect(), so a
    # collect count above `first` would expose an extra hidden action)
    assert counts["first"] == 4
    assert counts["collect"] == counts["first"] and counts["count"] == 0
    # the returned labels are the checkpointed (already-materialized)
    # relation: downstream consumers (the dedup_groups join) read the
    # truncated ExistingRDD scan, not a replay of every round's lineage
    assert "ExistingRDD" in physical_plan(labels)
    got = {r["node"]: r["comp"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}

    # r15 clique fast path: a diameter-1 graph is already labeled by the
    # seed; the edge-consistency probe detects it and the confirm round
    # (join + union + groupBy + checkpoint) is skipped — ONE label
    # materialization total instead of two.
    for meth in counts:
        counts[meth] = 0
    clique = spark.createDataFrame(
        [(10, 11), (10, 12), (11, 12), (20, 21)], "doc_a long, doc_b long"
    )
    rounds: list = []
    labels2 = connected_components(clique, rounds_out=rounds)
    got2 = {r["node"]: r["comp"] for r in labels2.collect()}
    assert got2 == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert rounds == [1]
    assert counts["first"] == 1 and counts["count"] == 0


def test_ivf_pq_plan_broadcasts_and_prunes(spark, sf_dir):
    """IVF-PQ's scale shape, pinned: exactly two Arrow stages (index
    build + ADC scan), every join broadcast (probe map, shortlist,
    query vectors — never a sort-merge of the corpus), and both
    per-query windows WindowGroupLimit-pruned map-side before their
    shuffles, so shuffle bytes are bounded by shortlist·queries, not
    candidates."""
    from nexus_event_stream_spark.io import load_table
    from nexus_event_stream_spark.operators.similarity import (
        ivf_pq_topk,
        ivf_train_centroids,
        pq_train_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_train_centroids(emb, n_centroids=8, iters=1)
    books = pq_train_codebooks(emb, m=8, ksub=8, iters=1)
    rows = emb.select("vec_id", "embedding").filter("vec_id < 2").collect()
    queries = [(int(r.vec_id), list(r.embedding)) for r in rows]
    plan = physical_plan(
        ivf_pq_topk(emb, cents, books, queries, k=5, nprobe=2, shortlist=20)
    )
    assert plan.count(") MapInPandas") == 2
    assert plan.count(") BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan


def test_quality_signals_pure_projection_no_shuffle(spark, sf_dir):
    # every quality signal + PII count is a Catalyst expression in ONE
    # map-side projection: zero Exchange, zero Python stages — the shape
    # that stays embarrassingly parallel at 100 TB
    plan = physical_plan(CATALOG["q_quality_signals"].build(spark, sf_dir))
    assert plan.count(") Exchange") == 0
    assert "Python" not in plan


def test_corpus_hygiene_broadcasts_benchmark_grams(spark, sf_dir):
    # the decontamination probe must be a map-side broadcast join of the
    # (small) benchmark gram set — shuffling corpus grams against the
    # benchmark would move the whole corpus; no cartesian anywhere
    plan = physical_plan(CATALOG["q_corpus_hygiene"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_rollup_exact_partials_single_shuffle_mapside_combine(spark, sf_dir):
    """RollupStore exact-mode partials: one Exchange on (bucket_ts, dims)
    with partial aggregation riding the map side — the shape that keeps
    per-epoch shuffle bytes at bucket-grain, not event-grain."""
    from nexus_event_stream_spark.io import load_table
    from nexus_event_stream_spark.streaming.rollup import RollupStore

    store = RollupStore("/tmp/_plan_pin_unused")
    events = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    plan = physical_plan(store.partials(events))
    assert plan.count(") Exchange") == 1
    assert "partial_sum" in plan and "partial_count" in plan


def test_bm25_postings_single_term_shuffle(spark, sf_dir):
    """Posting build: the tf aggregation is the only exchange on the doc
    side, map-side combined; df/idf join adds its own term-keyed hash
    exchange, never a broadcast of the corpus-sized side."""
    from nexus_event_stream_spark.io import load_table
    from nexus_event_stream_spark.operators.search import build_bm25_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = build_bm25_index(docs, max_df_frac=0.98)
    plan = physical_plan(idx.postings)
    assert "partial_count" in plan  # tf and df both combine map-side
    # two actual doc scans — the tf leg and the df leg — and no more
    # (formatted mode prints each node twice: tree + details section)
    assert plan.count("Scan parquet") <= 4
