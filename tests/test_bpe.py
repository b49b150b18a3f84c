"""Distributed BPE training: exact agreement with a single-machine
reference implementation on the same histogram, and encoder round-trip."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from nexus_event_stream_spark.operators.bpe import (
    EOW,
    _merge_symbols,
    bpe_encode,
    train_bpe,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "low lower newest",
]


def reference_bpe(texts: list[str], n_merges: int, min_freq: int = 2):
    """Pure-Python Sennrich BPE on the word histogram — the ground truth
    the distributed trainer must reproduce merge-for-merge."""
    hist = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {tuple(list(w) + [EOW]): f for w, f in hist.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # max count, ties broken lexicographically — same rule as Spark's
        # orderBy(desc(cnt), asc(pair))
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_freq:
            break
        merges.append(best)
        vocab = {
            tuple(_merge_symbols(list(s), best[0], best[1])): f
            for s, f in vocab.items()
        }
    return merges


def test_train_bpe_matches_reference(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    got = train_bpe(docs, n_merges=12, min_freq=2)
    want = reference_bpe(CORPUS, n_merges=12, min_freq=2)
    assert got == want
    assert len(got) > 3  # the corpus supports a non-trivial merge list


def test_bpe_encode_roundtrip_and_compression(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = train_bpe(docs, n_merges=12, min_freq=2)
    enc = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(docs, merges).collect()}
    for i, text in enumerate(CORPUS):
        toks = enc[i]
        # lossless: stripping EOW markers reconstructs the text
        rebuilt = "".join(toks).replace(EOW, " ").strip()
        assert rebuilt == text
        # learned merges compress: fewer symbols than raw chars
        n_chars = sum(len(w) + 1 for w in text.split(" "))
        assert len(toks) < n_chars


def test_train_bpe_matches_golden_fixture(spark, sf_dir):
    """Golden-corpus pin: the merge list learned from the sf0.001
    ``documents`` table must equal the frozen fixture committed in
    tests/fixtures/bpe_golden.json. Unlike the reference-twin test above,
    this catches a refactor that moves BOTH implementations in lockstep —
    the expected output is a committed artifact, not recomputed."""
    import json
    from pathlib import Path

    from nexus_event_stream_spark.io import load_table

    golden = json.loads(
        (Path(__file__).parent / "fixtures" / "bpe_golden.json").read_text()
    )
    docs = load_table(spark, sf_dir, "documents")
    got = train_bpe(
        docs, n_merges=golden["n_merges"], min_freq=golden["min_freq"]
    )
    assert got == [tuple(m) for m in golden["merges"]]


def test_distributed_trainer_matches_local(spark, sf_dir):
    """The Spark-job merge loop and the collected-histogram driver-local
    loop must agree merge-for-merge — on the tie-heavy toy corpus AND on
    the golden documents corpus (so the fixture pin transitively covers
    both paths)."""
    from nexus_event_stream_spark.operators.bpe import train_bpe_distributed

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    assert train_bpe_distributed(docs, n_merges=12, min_freq=2) == train_bpe(
        docs, n_merges=12, min_freq=2
    )

    from nexus_event_stream_spark.io import load_table

    real = load_table(spark, sf_dir, "documents")
    assert train_bpe_distributed(real, n_merges=8, min_freq=2) == train_bpe(
        real, n_merges=8, min_freq=2
    )


def test_local_trainer_per_merge_speedup(spark):
    """The reason train_bpe collects the histogram: per-merge cost must
    be >=10x cheaper driver-local than as Spark jobs (a 32k-merge vocab
    is 32k scheduler round-trips otherwise). Compared per-merge so the
    test stays fast: 1000 local merges vs 20 distributed merges on the
    same synthetic vocab, prefix equality asserted too."""
    import random
    import time

    from nexus_event_stream_spark.operators.bpe import train_bpe_distributed

    rng = random.Random(42)
    words = {
        "".join(rng.choice("abcdefghij") for _ in range(6))
        for _ in range(3000)
    }
    text = " ".join(sorted(words))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")

    t0 = time.perf_counter()
    local = train_bpe(docs, n_merges=1000, min_freq=1)
    t_local = time.perf_counter() - t0
    assert len(local) == 1000  # vocab genuinely supports the merge count

    t0 = time.perf_counter()
    dist = train_bpe_distributed(docs, n_merges=20, min_freq=1)
    t_dist = time.perf_counter() - t0

    assert local[:20] == dist
    per_merge_local = t_local / 1000
    per_merge_dist = t_dist / 20
    assert per_merge_dist / per_merge_local >= 10, (
        f"local {per_merge_local:.4f}s/merge vs "
        f"distributed {per_merge_dist:.4f}s/merge"
    )


def test_bpe_encode_unseen_words_fall_back_to_chars(spark):
    train = spark.createDataFrame([(0, "aa aa aa aa")], "doc_id long, text string")
    merges = train_bpe(train, n_merges=3, min_freq=2)
    test = spark.createDataFrame([(1, "zq")], "doc_id long, text string")
    (row,) = bpe_encode(test, merges).collect()
    assert row["bpe_tokens"] == ["z", "q", EOW]


# ---------------------------------------------------------------------------
# Oracle-equivalence property: greedy encoder == rank-ordered replace chain
# ---------------------------------------------------------------------------


def _replace_chain_encode(word: str, merges) -> list:
    """Python twin of q_bpe's SQL oracle: symbols as a brace-wrapped
    string, one str.replace per merge in rank order (str.replace scans
    left-to-right, non-overlapping — the same semantics as DuckDB's
    replace())."""
    s = "{" + "}{".join(list(word)) + "}{" + EOW + "}"
    for a, b in merges:
        s = s.replace("{" + a + "}{" + b + "}", "{" + a + b + "}")
    return s[1:-1].split("}{")


def _golden_merges():
    import json
    from pathlib import Path

    data = json.loads(
        (Path(__file__).parent / "fixtures" / "bpe_golden.json").read_text()
    )
    return [tuple(m) for m in data["merges"]]


def test_catalog_golden_merges_match_fixture():
    """The merge list embedded in the catalog (so the package never
    imports from tests/) is byte-identical to the pinned fixture."""
    from nexus_event_stream_spark.plans.llm_catalog import GOLDEN_MERGES

    assert GOLDEN_MERGES == _golden_merges()


# merge lists respecting the training invariant (every constituent is a
# single char or the product of a strictly earlier merge) — including the
# adversarial overlap/chain shapes where greedy-vs-sequential could
# plausibly diverge if the equivalence argument were wrong
_MERGE_LISTS = [
    _golden_merges(),
    [("a", "a"), ("aa", "a"), ("aa", "aa"), ("a", "b"), ("ab", EOW)],
    [("b", "a"), ("ba", "ba"), ("a", "ba"), ("b", "aba")],
    [("a", EOW), ("b", "a</w>"), ("b", "b"), ("bb", "ba</w>")],
]


@given(
    st.text(alphabet="ab", min_size=1, max_size=12),
    st.integers(min_value=0, max_value=len(_MERGE_LISTS) - 1),
)
@settings(max_examples=300, deadline=None)
def test_greedy_encoder_equals_replace_chain(word, merge_idx):
    """The equivalence q_bpe's value oracle rests on, checked on
    arbitrary words: the greedy lowest-rank-first encoder (the Spark
    side) produces exactly the sequence the rank-ordered exhaustive
    replace chain (the DuckDB side) produces."""
    from nexus_event_stream_spark.operators.bpe import encode_word

    merges = _MERGE_LISTS[merge_idx]
    rank = {pair: i for i, pair in enumerate(merges)}
    assert encode_word(word, rank) == _replace_chain_encode(word, merges)


@given(st.text(alphabet="abcdefgh", min_size=1, max_size=10))
@settings(max_examples=200, deadline=None)
def test_greedy_encoder_equals_replace_chain_golden(word):
    from nexus_event_stream_spark.operators.bpe import encode_word

    merges = _golden_merges()
    rank = {pair: i for i, pair in enumerate(merges)}
    assert encode_word(word, rank) == _replace_chain_encode(word, merges)
