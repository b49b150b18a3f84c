"""Sequence-packing operator (operators/packing.py): the GPT-style
concatenate-and-split placement map, pinned against a pure-Python
reference and its own invariants on random corpora."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nexus_event_stream_spark.operators.packing import (
    global_prefix_sum,
    pack_sequences,
)


def _df(spark, counts, ids=None):
    ids = ids if ids is not None else range(len(counts))
    return spark.createDataFrame(
        list(zip(ids, counts)), "doc_id long, n_tokens long"
    )


def _ref_pack(counts, seq_len):
    """Pure-Python packing reference → {(doc, seq): (off, n, doc_start)}."""
    out = {}
    pos = 0
    for doc_id, c in enumerate(counts):
        start, end = pos, pos + c
        s = start
        while s < end:
            seq = s // seq_len
            e = min(end, (seq + 1) * seq_len)
            out[(doc_id, seq)] = (s - seq * seq_len, e - s, s - start)
            s = e
        pos = end
    return out


def test_prefix_sum_small_groups_exercise_offsets(spark):
    # group_size=2 forces MANY coarse groups → the cross-group offset
    # join is really exercised, not just the within-group window
    df = _df(spark, [5, 3, 7, 1, 4, 2, 6])
    rows = {
        r.doc_id: r.prefix_sum
        for r in global_prefix_sum(
            df, "n_tokens", "doc_id", group_size=2
        ).collect()
    }
    expect, acc = {}, 0
    for i, c in enumerate([5, 3, 7, 1, 4, 2, 6]):
        expect[i], acc = acc, acc + c
    assert rows == expect


def test_pack_sequences_closed_form(spark):
    # seq_len=10, docs 4+8+10+3: doc1 straddles seqs 0/1, doc2 straddles
    # 1/2, doc3 sits inside seq 2
    rows = {
        (r.doc_id, r.seq_id): (r.offset_in_seq, r.tokens_in_seq, r.doc_token_start)
        for r in pack_sequences(_df(spark, [4, 8, 10, 3]), 10).collect()
    }
    assert rows == {
        (0, 0): (0, 4, 0),
        (1, 0): (4, 6, 0),
        (1, 1): (0, 2, 6),
        (2, 1): (2, 8, 0),
        (2, 2): (0, 2, 8),
        (3, 2): (2, 3, 0),
    }


def test_pack_sequences_zero_token_docs_emit_nothing(spark):
    rows = pack_sequences(_df(spark, [3, 0, 2]), 4).collect()
    assert {r.doc_id for r in rows} == {0, 2}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(st.integers(min_value=0, max_value=17), min_size=1, max_size=20),
    seq_len=st.integers(min_value=1, max_value=11),
    group_size=st.sampled_from([1, 2, 5, 1_000_000]),
)
def test_pack_matches_reference_any_group_size(spark, counts, seq_len, group_size):
    got = {
        (r.doc_id, r.seq_id): (r.offset_in_seq, r.tokens_in_seq, r.doc_token_start)
        for r in pack_sequences(
            _df(spark, counts), seq_len, group_size=group_size
        ).collect()
    }
    assert got == _ref_pack(counts, seq_len)
    # invariants: every sequence but the last is exactly full; per-doc
    # token totals are preserved
    total = sum(counts)
    if total:
        per_seq = {}
        per_doc = {}
        for (doc, seq), (_, n, _) in got.items():
            per_seq[seq] = per_seq.get(seq, 0) + n
            per_doc[doc] = per_doc.get(doc, 0) + n
        last = max(per_seq)
        assert all(v == seq_len for s, v in per_seq.items() if s != last)
        assert per_doc == {i: c for i, c in enumerate(counts) if c > 0}


def test_pack_sequences_sparse_ids(spark):
    # order keys need not be dense — only unique and numeric
    df = _df(spark, [4, 5, 6], ids=[100, 250_007, 1_000_003])
    rows = {
        (r.doc_id, r.seq_id): r.tokens_in_seq
        for r in pack_sequences(df, 5, group_size=1000).collect()
    }
    assert rows == {(100, 0): 4, (250_007, 0): 1, (250_007, 1): 4,
                    (1_000_003, 1): 1, (1_000_003, 2): 5}


def test_packing_plan_two_level_not_single_partition_corpus(spark):
    # the corpus-side cumsum must be a hash-partitioned window on the
    # coarse group; the ONLY single-partition window runs over the tiny
    # per-group totals relation (|corpus|/group_size rows) which then
    # broadcasts — a global-order window over the corpus itself would
    # serialize 100 TB through one task
    df = _df(spark, [5] * 100)
    out = pack_sequences(df, 7, group_size=10)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastExchange" in plan  # offsets join the corpus broadcast
    # exactly one exchange keyed on the coarse group feeds the big window
    assert "hashpartitioning(__g" in plan


def test_curriculum_packing_by_quality_score(spark):
    # curriculum ordering: rank docs by a model score and pack in that
    # order — pack_sequences only needs a unique numeric order key, so a
    # row_number over (score desc, id) slots straight in
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, float((i * 37) % 100) / 100, 5 + i % 4) for i in range(40)],
        "doc_id long, score double, n_tokens long",
    )
    ranked = docs.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("score"), "doc_id")),
    )
    placed = pack_sequences(ranked, 16, order_col="rank")
    # rank order maps monotonically into sequence ids: the highest-scored
    # docs fill the earliest training sequences
    first_by_rank = {
        r.rank: r.seq_id
        for r in placed.groupBy("rank").agg(F.min("seq_id").alias("seq_id"))
        .collect()
    }
    ranks = sorted(first_by_rank)
    assert all(
        first_by_rank[a] <= first_by_rank[b]
        for a, b in zip(ranks, ranks[1:])
    )
    # and every doc's tokens are fully placed
    placed_tokens = placed.groupBy("rank").agg(
        F.sum("tokens_in_seq").alias("t")
    )
    joined = ranked.join(placed_tokens, "rank")
    assert joined.filter(F.col("t") != F.col("n_tokens")).count() == 0


from nexus_event_stream_spark.operators.packing import (  # noqa: E402
    sample_token_budget,
)


def test_token_budget_slice_deterministic_and_monotone(spark):
    df = _df(spark, [((i * 13) % 29) + 1 for i in range(300)])
    total = sum(((i * 13) % 29) + 1 for i in range(300))

    def slice_ids(budget):
        return {r.doc_id for r in sample_token_budget(df, budget).collect()}

    small, big = slice_ids(total // 10), slice_ids(total // 3)
    assert small == slice_ids(total // 10)  # replayable
    assert small < big                      # strict-prefix monotone growth
    assert slice_ids(total + 1) == set(range(300))  # budget ≥ total → all

    # realized tokens land within one doc of the budget (document-atomic)
    budget = total // 3
    rows = sample_token_budget(df, budget).collect()
    got = sum(r.n_tokens for r in rows)
    max_doc = max(r.n_tokens for r in rows)
    assert budget <= got < budget + max_doc


def test_token_budget_zero_and_columns(spark):
    df = _df(spark, [5, 7, 9])
    assert sample_token_budget(df, 0).count() == 0
    out = sample_token_budget(df, 100)
    assert out.columns == df.columns  # helper columns dropped


def test_materialize_packed_reassembles_the_stream(spark):
    """Packed sequences, materialized: concatenating the sequences in
    seq_id order reproduces the original doc-order token stream exactly;
    every sequence except the last is exactly seq_len tokens."""
    from nexus_event_stream_spark.operators.packing import (
        materialize_packed,
        pack_sequences,
    )

    from pyspark.sql import functions as F

    rows = [
        (i, " ".join(f"d{i}t{j}" for j in range(5 + (i * 7) % 13)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with_counts = docs.withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " "))
    )
    seq_len = 32
    placement = pack_sequences(with_counts, seq_len)
    seqs = sorted(
        materialize_packed(docs, placement).collect(),
        key=lambda r: r.seq_id,
    )
    # seq_len everywhere but the tail
    for r in seqs[:-1]:
        assert int(r.n_tokens) == seq_len
        assert len(r.seq_text.split(" ")) == seq_len
    # the concatenation is the original stream
    stream = " ".join(r.seq_text for r in seqs).split(" ")
    want = [t for _i, txt in rows for t in txt.split(" ")]
    assert stream == want
    # n_docs accounting: every (doc, seq) span counted once
    assert sum(int(r.n_docs) for r in seqs) == placement.count()


# ---------------------------------------------------------------------------
# document-atomic FFD packing (r11)
# ---------------------------------------------------------------------------


def _ffd_oracle(counts, seq_len, group_size):
    """Pure-Python spec of pack_documents_atomic: per-group FFD with the
    same ordering, truncation, and two-level global seq ids."""
    groups = {}
    for d, n in counts.items():
        if n and n > 0:
            groups.setdefault(d // group_size, []).append((n, d))
    placements, bins_per_group = {}, {}
    for g in sorted(groups):
        bins = []
        for n, d in sorted(groups[g], key=lambda x: (-x[0], x[1])):
            take = min(n, seq_len)
            placed = next(
                (b for b, room in enumerate(bins) if room >= take), None
            )
            if placed is None:
                bins.append(seq_len)
                placed = len(bins) - 1
            placements[d] = (g, placed, seq_len - bins[placed], take)
            bins[placed] -= take
        bins_per_group[g] = len(bins)
    goff, acc = {}, 0
    for g in sorted(bins_per_group):
        goff[g], acc = acc, acc + bins_per_group[g]
    return {
        d: (goff[g] + b, off, take)
        for d, (g, b, off, take) in placements.items()
    }


def test_atomic_packing_matches_python_oracle(spark):
    import random

    from nexus_event_stream_spark.operators.packing import (
        pack_documents_atomic,
    )

    for seed, group_size, seq_len in ((3, 10, 512), (11, 7, 100), (29, 1000, 64)):
        rng = random.Random(seed)
        counts = {
            d: rng.choice([0, rng.randint(1, seq_len + 40)])
            for d in range(120)
        }
        df = spark.createDataFrame(
            list(counts.items()), "doc_id long, n_tokens long"
        )
        got = {
            r.doc_id: (r.seq_id, r.offset_in_seq, r.tokens_in_seq)
            for r in pack_documents_atomic(
                df, seq_len, group_size=group_size
            ).collect()
        }
        assert got == _ffd_oracle(counts, seq_len, group_size), (
            seed, group_size,
        )


def test_atomic_packing_invariants(spark):
    from nexus_event_stream_spark.operators.packing import (
        pack_documents_atomic,
    )

    df = _df(spark, [300, 120, 120, 90, 700, 5, 0, 256])
    out = pack_documents_atomic(df, 256, group_size=1000).collect()
    rows = {r.doc_id: r for r in out}
    # one row per non-empty doc — nothing straddles, zero docs vanish
    assert sorted(rows) == [0, 1, 2, 3, 4, 5, 7]
    assert all(r.doc_token_start == 0 for r in out)
    # the oversized doc is alone in its sequence, truncated to seq_len
    big = rows[4]
    assert big.tokens_in_seq == 256 and big.offset_in_seq == 0
    assert sum(1 for r in out if r.seq_id == big.seq_id) == 1
    # per-sequence capacity holds and offsets tile without overlap
    by_seq = {}
    for r in out:
        by_seq.setdefault(r.seq_id, []).append(r)
    for seq, members in by_seq.items():
        members.sort(key=lambda r: r.offset_in_seq)
        pos = 0
        for r in members:
            assert r.offset_in_seq == pos
            pos += r.tokens_in_seq
        assert pos <= 256


def test_atomic_packing_efficiency_floor_vs_concat_split(spark):
    import random

    from nexus_event_stream_spark.operators.packing import (
        pack_documents_atomic,
        packing_efficiency,
    )

    rng = random.Random(17)
    counts = [rng.randint(1, 256) for _ in range(400)]
    df = _df(spark, counts)
    atomic = pack_documents_atomic(df, 512, group_size=100)
    eff = packing_efficiency(atomic, 512)
    # concat-split is 1.0 by construction; FFD with docs ≤ seq_len/2
    # fills bins to within the smallest-remaining-doc of full
    concat = pack_sequences(df, 512, group_size=100)
    assert packing_efficiency(concat, 512) > 0.99  # only the tail wastes
    assert 0.9 <= eff <= 1.0, eff
    # and total tokens are conserved exactly (no doc lost or split)
    total = atomic.groupBy().sum("tokens_in_seq").first()[0]
    assert total == sum(counts)


def test_atomic_packing_plan_two_level(spark):
    from nexus_event_stream_spark.operators.packing import (
        pack_documents_atomic,
    )

    df = _df(spark, [5] * 100)
    out = pack_documents_atomic(df, 7, group_size=10)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # the corpus shuffles ONCE on the coarse group into the FFD kernel;
    # the only single-partition window runs over the tiny per-group bin
    # counts which broadcast back
    assert "hashpartitioning(__g" in plan
    assert "BroadcastExchange" in plan
