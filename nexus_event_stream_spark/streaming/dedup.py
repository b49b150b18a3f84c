"""Streaming near-dup suppression — cross-batch MinHash-LSH in the
projection path.

A 100 TB training-data ingest cannot dedup after the fact: near-duplicate
documents must be suppressed AS THEY ARRIVE, against everything already
accepted, at per-batch cost O(|batch|) — never a rescan of the
accumulated corpus. This module composes the batch dedup operators
(operators/dedup.py) with the store/commit discipline of the projection
path (streaming/projection.py):

- beside the accepted corpus lives a ``SignatureStore``: the LSH posting
  relation (band-bucket key → doc, with the doc's hashed shingle set for
  exact-Jaccard verification), laid out in ``n_buckets`` key-hash bucket
  directories exactly like ``BucketedViewStore`` — a micro-batch probes
  ONLY the bucket directories its own band keys hash into;
- each ``foreachBatch``: signatures for the batch (narrow map) →
  within-batch LSH self-join (earlier id wins) → bucket-pruned equi-join
  against the store's touched buckets → exact-Jaccard verify → survivors
  registered back into the store (append-only bucket write + atomic
  pointer commit);
- the (run_token, epoch) guard from the projection path makes replayed
  micro-batches no-ops on the store, and the suppression decision itself
  is a deterministic recompute (same batch + same visible postings →
  same survivors), mirroring the reference's idempotent-apply contract
  (data-plane/internal/projection/signal_test.go:132-151) extended to
  near-duplicates.

Scale notes: the posting row carries the shingle set once per band
(bands× write amplification) so the verify join needs no second hop back
to a shingle table; at extreme scale store shingles once per doc and
verify via a doc-keyed join instead — the probe shape is unchanged.
Bucket directories accumulate one file per epoch; ``append`` schedules
``compact()`` automatically once any bucket's version list exceeds
``compact_threshold``, folding the history back to one directory per
bucket.

Exactly-once corpus: the survivor append shares the store's pointer
commit — survivors are written to ``corpus_root/v={version}`` BEFORE the
single atomic pointer rename that also publishes the postings, and
readers (``read_corpus``) union only pointer-referenced directories. A
crash between the data writes and the commit leaves unreferenced
directories that the replayed epoch deterministically overwrites; a
crash after the commit makes the replay a pure no-op — so a batch lands
in the corpus exactly once, never zero or two times.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nexus_event_stream_spark.streaming.commit import PosixRenameBackend
from nexus_event_stream_spark.streaming.replay import ReplayGuard
from nexus_event_stream_spark.operators.dedup import (
    band_key_array,
    jaccard,
    minhash_lsh_candidates,
    minhash_signatures,
)

POINTER = "_CURRENT"

#: On-disk posting schema. ``shingles`` is the doc's hashed shingle set
#: (the exact-Jaccard verify input); ``run``/``epoch`` scope replay.
POSTING_SCHEMA = T.StructType(
    [
        T.StructField("bucket_key", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("epoch", T.LongType()),
        T.StructField("run", T.StringType()),
        T.StructField("shingles", T.ArrayType(T.LongType())),
    ]
)


def _bucket_of(key_col, n_buckets: int):
    """Stable bucket-key → directory bucket (same recipe as the view
    store's key bucketing)."""
    return F.coalesce(
        F.pmod(F.xxhash64(key_col), F.lit(n_buckets)), F.lit(0)
    ).cast("int")


class SignatureStore:
    """Append-only bucketed LSH posting store with an atomic pointer.

    Layout: ``v={version}/__bucket={k}/*.parquet``. The pointer maps each
    bucket to the LIST of versions holding its postings (append-only: a
    bucket accumulates one entry per epoch that touched it); reading a
    bucket unions those directories and nothing else. Commit is a single
    atomic pointer rename; a crash between data write and commit leaves
    an unreferenced directory, never a corrupt store.

    The same pointer also publishes the survivor CORPUS (when ``append``
    is given one): corpus directories live under a caller-supplied root
    as ``v={version}`` and only pointer-listed versions are visible —
    that one rename is what makes the corpus append exactly-once.

    ``compact_threshold`` bounds manifest growth: once a bucket's version
    list exceeds it, ``append`` triggers a PARTIAL ``compact()`` of just
    the offending buckets (mirroring BucketedViewStore's fold-and-vacuum
    policy), so per-bucket file counts stay O(threshold) over unbounded
    epochs while compaction cost tracks the hot buckets, not the store.
    """

    def __init__(
        self,
        path: str,
        n_buckets: int = 64,
        compact_threshold: int | None = 8,
        backend=None,
        schema: T.StructType | None = None,
        max_tombstones: int = 512,
    ):
        self.path = path
        self.n_buckets = n_buckets
        self.compact_threshold = compact_threshold
        #: when the queued-takedown list carried by the pointer exceeds
        #: this, the next ``append`` escalates to a FULL compact (the
        #: only sweep that may clear the queue) — without it a
        #: long-running stream whose scheduled compactions are all
        #: PARTIAL would grow the queue (and every probe's anti-filter)
        #: without bound and never physically remove victims.
        self.max_tombstones = max_tombstones
        #: posting row schema — default is the lexical MinHash shape;
        #: other suppression tiers (streaming/phash_dedup.py) reuse the
        #: whole store with their own payload columns, as long as
        #: ``bucket_key`` (string) and ``doc_id`` (long) stay: bucketing,
        #: probes, tombstones, forget, and compaction key on those two.
        self.schema = schema or POSTING_SCHEMA
        self.backend = backend or PosixRenameBackend()
        #: idempotent replay discipline (streaming/replay.py): replayed
        #: signature registration self-suppresses (an exact replay has
        #: Jaccard 1), so cross-run re-applies are harmless and only
        #: positively-identified same-run replays skip the append.
        self.guard = ReplayGuard("idempotent")
        os.makedirs(path, exist_ok=True)
        #: paths touched by the most recent probe — lets tests pin the
        #: "no full rescan" contract.
        self.last_probe_paths: list[str] | None = None

    # -- pointer ------------------------------------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.path, POINTER)

    def current(self) -> dict | None:
        return self.backend.read(self._pointer_path())

    def _commit(self, pointer: dict, expected: dict | None = None) -> None:
        self.backend.commit(self._pointer_path(), pointer, expected)

    # -- read ---------------------------------------------------------------

    def read_buckets(self, spark: SparkSession, buckets) -> DataFrame | None:
        """Postings of ``buckets`` only — the probe path; never the whole
        store. Postings of queued-takedown docs (``tombstones`` in the
        pointer) are filtered HERE, so every consumer — the suppression
        probe, forget counting, compaction's fold — sees them as already
        gone the moment the forget pointer lands."""
        cur = self.current()
        if cur is None:
            self.last_probe_paths = []
            return None
        paths = [
            os.path.join(self.path, f"v={ver}", f"__bucket={b}")
            for b in buckets
            for ver in cur["buckets"].get(str(b), [])
        ]
        self.last_probe_paths = paths
        if not paths:
            return None
        df = spark.read.schema(self.schema).parquet(*paths)
        tomb = [int(d) for d in cur.get("tombstones", [])]
        if tomb:
            # literal-list filter: parquet-pushable, and the queue is
            # bounded by compaction cadence
            df = df.filter(~F.col("doc_id").isin(tomb))
        return df

    # -- write --------------------------------------------------------------

    def append(
        self,
        postings: DataFrame,
        epoch: int | None = None,
        run_token: str | None = None,
        corpus: DataFrame | None = None,
        corpus_root: str | None = None,
    ) -> int:
        """Append posting rows as a new version of their buckets — and,
        when ``corpus``/``corpus_root`` are given, the epoch's survivor
        rows as ``corpus_root/v={version}`` — then commit BOTH with one
        atomic pointer rename. Epoch metadata is recorded even when the
        batch produced no survivors, so the replay guard still engages.

        Exactly-once: every data write targets a directory named by the
        not-yet-committed version with ``mode("overwrite")``, so a replay
        after a crash-before-commit rewrites the identical directories
        instead of appending beside them.
        """
        cur = self.current()
        version = (cur["version"] + 1) if cur else 0
        out = os.path.join(self.path, f"v={version}")
        (
            postings.withColumn(
                "__bucket", _bucket_of(F.col("bucket_key"), self.n_buckets)
            )
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(out)
        )
        corpus_versions = list(cur.get("corpus_versions", [])) if cur else []
        if corpus is not None and corpus_root is not None:
            cdir = os.path.join(corpus_root, f"v={version}")
            corpus.write.mode("overwrite").parquet(cdir)
            # an all-suppressed batch writes no row groups; don't make
            # readers open an empty directory
            if any(n.endswith(".parquet") for n in os.listdir(cdir)):
                corpus_versions.append(version)
        buckets = dict(cur["buckets"]) if cur else {}
        written = [
            name.split("=", 1)[1]
            for name in os.listdir(out)
            if name.startswith("__bucket=")
        ]
        for b in written:
            buckets[b] = buckets.get(b, []) + [version]
        self._commit(
            {
                "version": version,
                "epoch": epoch,
                "run_token": run_token,
                "buckets": buckets,
                "corpus_versions": corpus_versions,
                # queued takedowns ride through every append
                "tombstones": (cur or {}).get("tombstones", []),
            },
            expected=cur,
        )
        if self.compact_threshold is not None:
            over = [
                b for b, v in buckets.items() if len(v) > self.compact_threshold
            ]
            if over:
                # fold ONLY the offending buckets: scheduled compaction
                # cost tracks the hot buckets' data, not the whole store,
                # keeping the per-epoch contract O(batch + touched)
                self.compact(postings.sparkSession, buckets=over)
        if (
            self.max_tombstones is not None
            and len((cur or {}).get("tombstones", [])) > self.max_tombstones
        ):
            # the takedown queue outgrew its budget: a FULL compact is
            # the one sweep that physically removes victims and clears
            # the queue — partial folds never may (victims can hold
            # postings in unfolded buckets). Amortized: at most one full
            # sweep per max_tombstones takedowns.
            self.compact(postings.sparkSession)
        return version

    def read_corpus(self, spark: SparkSession, corpus_root: str) -> DataFrame | None:
        """The committed survivor corpus — pointer-listed versions only,
        so uncommitted crash leftovers are invisible."""
        cur = self.current()
        if cur is None or not cur.get("corpus_versions"):
            return None
        return spark.read.parquet(
            *[
                os.path.join(corpus_root, f"v={v}")
                for v in cur["corpus_versions"]
            ]
        )

    def compact(self, spark: SparkSession, buckets=None) -> int | None:
        """Fold the version history of ``buckets`` (default: all) into one
        directory each (bounds per-bucket file counts after many epochs).

        Partial compaction is what ``append`` schedules: only buckets
        whose version list exceeded the threshold fold, so the cost is
        proportional to THOSE buckets' data — the store is never rescanned
        wholesale inside a micro-batch. Version directories are vacuumed
        only once no bucket references them. ``last_probe_paths`` (the
        batch-probe test pin) is preserved across the internal read.
        Single-writer, like view-store compaction; returns the new
        version or None if nothing to fold.
        """
        cur = self.current()
        if cur is None or not cur["buckets"]:
            return None
        targets = sorted(
            cur["buckets"] if buckets is None else
            [b for b in buckets if b in cur["buckets"]],
            key=int,
        )
        if not targets:
            return None
        saved_probe = self.last_probe_paths
        df = self.read_buckets(spark, targets)
        self.last_probe_paths = saved_probe
        if df is None:
            return None
        version = cur["version"] + 1
        out = os.path.join(self.path, f"v={version}")
        (
            df.withColumn("__bucket", _bucket_of(F.col("bucket_key"), self.n_buckets))
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(out)
        )
        written = {
            name.split("=", 1)[1]
            for name in os.listdir(out)
            if name.startswith("__bucket=")
        }
        new_buckets = dict(cur["buckets"])
        for b in targets:
            # folded buckets now live solely in the new version; a target
            # whose postings were all empty keeps an empty list
            new_buckets[b] = [version] if b in written else []
        # a FULL fold (every bucket rewritten through the tombstone-
        # filtered read) has physically removed every queued victim —
        # clear the queue; a partial fold keeps it (victims may still
        # have postings in unfolded buckets)
        full = set(targets) == set(cur["buckets"])
        self._commit(
            {
                "version": version,
                "epoch": cur.get("epoch"),
                "run_token": cur.get("run_token"),
                "buckets": new_buckets,
                # corpus dirs live under their own root and are NOT part
                # of posting compaction — carry the references through
                "corpus_versions": cur.get("corpus_versions", []),
                "tombstones": [] if full else cur.get("tombstones", []),
            },
            expected=cur,
        )
        _vacuum_with_grace(self.path, cur, new_buckets, version)
        return version


def _vacuum_with_grace(
    path: str, prev: dict, new_buckets: dict, version: int
) -> None:
    """Sweep version dirs no longer referenced — EXCEPT those the
    PREVIOUS pointer referenced (one-generation grace window, the
    BucketedViewStore._vacuum discipline): a concurrent reader that
    resolved its paths from the previous pointer must not fail
    mid-read. Previous-generation dirs fall out on the NEXT sweep,
    when no live pointer can still name them."""
    referenced = {ver for vs in new_buckets.values() for ver in vs} | {version}
    prev_refs = {ver for vs in prev["buckets"].values() for ver in vs}
    prev_refs.add(prev["version"])
    keep = referenced | prev_refs
    for name in os.listdir(path):
        if name.startswith("v=") and int(name.split("=", 1)[1]) not in keep:
            shutil.rmtree(os.path.join(path, name), ignore_errors=True)


def forget_signatures(
    spark: SparkSession, store: SignatureStore, doc_ids, mode: str = "tombstone"
) -> int:
    """Right-to-be-forgotten maintenance for the lexical suppression
    store: remove every LSH posting of ``doc_ids`` (the BM25/embedding
    stores' ``forget`` twin — a doc's band keys scatter across buckets,
    so the physical removal is a full-sweep compact-with-filter).

    ``mode='tombstone'`` (default) amortizes that sweep: victims queue
    in the pointer (one read-only counting job + one atomic pointer
    swing, zero data writes), ``read_buckets`` anti-filters the queue
    so every probe treats them as gone IMMEDIATELY, and the next FULL
    ``store.compact()`` folds the physical removal in for free — N
    takedowns between compactions cost one sweep. ``mode='sweep'``
    rewrites now, clearing the queue alongside.

    Returns how many distinct victim docs held postings. A forgotten
    doc stops suppressing future near-duplicates of itself; docs it
    already suppressed stay suppressed. Epoch/token/corpus references
    ride through unchanged (the survivor CORPUS dirs are the caller's
    to redact — this sweeps the signature index)."""
    import os

    if mode not in ("tombstone", "sweep"):
        raise ValueError(f"mode must be tombstone|sweep, got {mode!r}")
    cur = store.current()
    if cur is None or not cur["buckets"]:
        return 0
    ids = [int(d) for d in doc_ids]
    if not ids:
        return 0
    targets = sorted(cur["buckets"], key=int)
    # read_buckets already excludes previously-queued victims — a
    # repeated takedown request counts (and queues) nothing twice
    df = store.read_buckets(spark, targets)
    if df is None:
        return 0
    idf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    present = [
        int(r.doc_id)
        for r in df.join(F.broadcast(idf), "doc_id", "left_semi")
        .select("doc_id")
        .distinct()
        .collect()
    ]
    n_gone = len(present)
    if not n_gone:
        return 0
    if mode == "tombstone":
        queued = sorted(
            {int(d) for d in cur.get("tombstones", [])} | set(present)
        )
        store._commit({**cur, "tombstones": queued}, expected=cur)
        return n_gone
    kept = df.join(F.broadcast(idf), "doc_id", "left_anti")
    version = cur["version"] + 1
    out = os.path.join(store.path, f"v={version}")
    (
        kept.withColumn(
            "__bucket", _bucket_of(F.col("bucket_key"), store.n_buckets)
        )
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(out)
    )
    written = {
        name.split("=", 1)[1]
        for name in os.listdir(out)
        if name.startswith("__bucket=")
    }
    new_buckets = {
        b: ([version] if b in written else []) for b in cur["buckets"]
    }
    store._commit(
        {
            "version": version,
            "epoch": cur.get("epoch"),
            "run_token": cur.get("run_token"),
            "buckets": new_buckets,
            "corpus_versions": cur.get("corpus_versions", []),
            # the filtered read swept queued victims too — queue clears
            "tombstones": [],
        },
        expected=cur,
    )
    _vacuum_with_grace(store.path, cur, new_buckets, version)
    return int(n_gone)


def suppress_and_register(
    spark: SparkSession,
    store: SignatureStore,
    docs: DataFrame,
    epoch: int | None = None,
    run_token: str | None = None,
    num_perm: int = 16,
    shingle_n: int = 3,
    bands: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    corpus_path: str | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """One micro-batch of near-dup suppression: returns the surviving rows
    of ``docs`` and registers their signatures in the store. When
    ``corpus_path`` is given, the survivors are ALSO written there under
    the store's pointer commit — the exactly-once corpus append.

    Suppression rule (greedy, arrival-order): a doc is dropped iff a
    verified near-match (exact Jaccard of hashed shingle sets ≥
    ``threshold``) exists among (a) already-accepted docs in the store or
    (b) same-batch docs with a smaller ``id_col`` — the earliest-accepted
    copy wins, the streaming analogue of dedup_groups' min-id
    representative. An exact replay (same text, any id) has Jaccard 1 and
    is always suppressed.

    Replayed epochs (same run_token, epoch ≤ last committed) recompute the
    same survivor set — postings the replayed epoch itself wrote are
    filtered out of the probe — and skip the store append, so replay is a
    pure no-op on state. Per-batch cost: a narrow signature map + LSH
    self-join over the batch, plus a probe of only the store buckets the
    batch's band keys hash into (``store.last_probe_paths`` pins that).

    ``max_bucket_size`` caps the within-batch LSH self-join exactly like
    the batch operator (hot buckets → star on the min id; see
    operators/dedup.minhash_lsh_candidates) — a boilerplate-heavy
    micro-batch has the same quadratic risk as a batch corpus, and the
    star's suppression decisions are identical for mutually-similar
    copies (every non-hub member still pairs with the hub and loses).
    The cross-batch probe needs no cap: its traffic is |batch postings| ×
    |stored bucket|, linear in the batch.
    """
    cur = store.current()
    replay = store.guard.is_replay(cur, epoch, run_token)
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(
        docs, num_perm, shingle_n, id_col, text_col
    ).persist()
    shing = sigs.select("doc_id", "__shingles")

    # (a) within-batch: LSH candidates + verify; the larger id loses.
    cands = minhash_lsh_candidates(sigs, bands, rows_per_band, max_bucket_size)
    intra = (
        cands.join(shing.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(shing.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(
            jaccard(F.col("sa.__shingles"), F.col("sb.__shingles"))
            >= F.lit(threshold)
        )
        .select(F.col("doc_b").alias("doc_id"))
    )

    # (b) cross-batch: probe ONLY the store buckets this batch touches.
    posts = sigs.select(
        "doc_id",
        F.explode(band_key_array(bands, rows_per_band)).alias("bucket_key"),
        F.col("__shingles"),
    )
    touched = sorted(
        r[0]
        for r in posts.select(
            _bucket_of(F.col("bucket_key"), store.n_buckets).alias("b")
        )
        .distinct()
        .collect()
    )
    stored = store.read_buckets(spark, touched)
    if stored is not None and replay:
        # postings this very epoch wrote must not suppress its own docs
        stored = stored.filter(
            ~((F.col("run") == F.lit(run_token)) & (F.col("epoch") >= F.lit(epoch)))
        )
    if stored is not None:
        cross = (
            posts.join(
                stored.select(
                    "bucket_key", F.col("shingles").alias("__stored_sh")
                ),
                "bucket_key",
            )
            .filter(
                jaccard(F.col("__shingles"), F.col("__stored_sh"))
                >= F.lit(threshold)
            )
            .select("doc_id")
        )
        suppressed = intra.union(cross).distinct()
    else:
        suppressed = intra.distinct()

    survivors = docs.join(
        suppressed.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )
    if not replay:
        surv_posts = posts.join(suppressed, "doc_id", "left_anti").select(
            "bucket_key",
            "doc_id",
            F.lit(epoch).cast("long").alias("epoch"),
            F.lit(run_token).cast("string").alias("run"),
            F.col("__shingles").alias("shingles"),
        )
        store.append(
            surv_posts,
            epoch,
            run_token,
            corpus=survivors if corpus_path is not None else None,
            corpus_root=corpus_path,
        )
    # Release the per-batch cache unconditionally, or a long-running
    # caller accumulates one pinned relation per epoch. The posting
    # append (and corpus write, when configured) already materialized
    # everything this epoch commits; collecting the returned survivors
    # afterwards recomputes deterministically — the probe relation was
    # built from an explicit version-dir path list, so the recompute
    # cannot see this epoch's own postings.
    sigs.unpersist()
    return survivors


def run_token_for(checkpoint_path: str) -> str:
    """Run token tied to the checkpoint's LIFETIME, not just its path.

    A restart from the same checkpoint REDELIVERS the last possibly-
    uncommitted epoch with the same batch id; the replay guard only
    engages if the restarted run presents the same token, so the token
    must survive process restarts (a fresh uuid per process would let
    the crashed epoch's own committed postings suppress its redelivered
    docs — permanent data loss). But it must NOT survive a checkpoint
    RESET: wiping the checkpoint restarts epoch numbering at 0, and a
    path-derived token would make the guard discard every new batch as
    a "replay" until the counter caught up. So the token is a uuid
    minted once per checkpoint generation and persisted INSIDE the
    checkpoint directory — restart reuses it, reset mints a new one.
    """
    import uuid

    os.makedirs(checkpoint_path, exist_ok=True)
    marker = os.path.join(checkpoint_path, "__dedup_run_token")
    try:
        with open(marker) as fh:
            return fh.read().strip()
    except FileNotFoundError:
        pass
    token = uuid.uuid4().hex[:16]
    fd, tmp = tempfile.mkstemp(dir=checkpoint_path, prefix="._tok")
    with os.fdopen(fd, "w") as fh:
        fh.write(token)
    os.replace(tmp, marker)
    return token


def read_dedup_corpus(
    spark: SparkSession, store_path: str, corpus_path: str
) -> DataFrame | None:
    """Committed view of a ``start_dedup_ingest`` corpus (pointer-listed
    versions only; crash leftovers invisible)."""
    return SignatureStore(store_path).read_corpus(spark, corpus_path)


def start_dedup_ingest(
    spark: SparkSession,
    doc_stream: DataFrame,
    store_path: str,
    corpus_path: str,
    checkpoint_path: str,
    n_buckets: int = 64,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = None,
):
    """Wire a document stream into a dedup-suppressed corpus sink.

    Each micro-batch: suppress near-dups (within-batch + against all
    accepted history) → survivors land in ``corpus_path`` under the
    signature store's atomic pointer commit, so the corpus append is
    EXACTLY-ONCE across crashes and restarts: a replayed epoch either
    deterministically overwrites the uncommitted ``v={n}`` directory
    (crash before commit) or is skipped entirely (crash after). Read the
    corpus with ``read_dedup_corpus`` — only committed versions are
    visible. The run token derives from the checkpoint path so a restart
    presents the same identity to the replay guard (see run_token_for).
    Returns the StreamingQuery.
    """
    run_token = run_token_for(checkpoint_path)
    store = SignatureStore(store_path, n_buckets=n_buckets)

    def _apply(batch: DataFrame, epoch: int) -> None:
        if store.guard.is_replay(store.current(), epoch, run_token):
            return
        # the corpus write inside store.append materializes the survivors;
        # nothing further to execute here
        suppress_and_register(
            spark,
            store,
            batch,
            epoch,
            run_token,
            threshold=threshold,
            id_col=id_col,
            text_col=text_col,
            corpus_path=corpus_path,
            max_bucket_size=max_bucket_size,
        )

    return (
        doc_stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(_apply)
        .start()
    )


#: (node, comp) labeling relation — comp = min doc_id reachable through
#: verified near-dup pairs, the provenance record a training pipeline
#: keeps alongside the deduped corpus.
LABEL_SCHEMA = T.StructType(
    [
        T.StructField("node", T.LongType()),
        T.StructField("comp", T.LongType()),
    ]
)


def label_store(path: str, backend=None):
    """A ParquetViewStore carrying the cluster labeling instead of the
    LWW state — same versioned snapshots, pointer commit, replay guard
    and backend injection, different schema."""
    from nexus_event_stream_spark.streaming.projection import ParquetViewStore

    return ParquetViewStore(path, backend=backend, schema=LABEL_SCHEMA)


def update_cluster_labels(
    spark: SparkSession,
    store,
    pairs: DataFrame,
    epoch: int | None = None,
    run_token: str | None = None,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> None:
    """Maintain near-dup cluster labels ACROSS micro-batches: fold the
    epoch's verified pairs into the committed ``(node, comp)`` relation
    with ``operators.dedup.merge_edges`` — per-epoch cost scales with
    the DELTA (component-contracted CC + one relabel join), never a
    recompute over the accumulated pair graph — then commit a new
    snapshot under the projection path's replay guard (same
    (run_token, epoch) contract as ``apply_batch``; a redelivered epoch
    is a no-op, and labels are min-id so re-merging is idempotent
    anyway). Label-equivalence of the folded stream to a full
    ``connected_components`` over every pair ever seen is pinned in
    tests/test_streaming_dedup.py.
    """
    from nexus_event_stream_spark.operators.dedup import (
        connected_components,
        merge_edges,
    )

    cur = store.current()
    if store.guard.is_replay(cur, epoch, run_token):
        return  # already applied within this run
    labels = store.read(spark)
    if labels is None:
        new = connected_components(pairs, a_col, b_col)
    else:
        new = merge_edges(labels, pairs, a_col, b_col)
    store.write(new.select("node", "comp"), epoch, run_token)


def bucketed_label_store(path: str, n_buckets: int = 64, backend=None):
    """Labels bucketed BY COMPONENT LABEL (``comp``): a relabel rewrites
    only the buckets housing affected components — the write-cost shape
    ``update_cluster_labels_bucketed`` needs at scale."""
    from nexus_event_stream_spark.streaming.projection import BucketedViewStore

    return BucketedViewStore(
        path, n_buckets=n_buckets, backend=backend,
        schema=LABEL_SCHEMA, key_col="comp",
    )


def update_cluster_labels_bucketed(
    spark: SparkSession,
    store,
    pairs: DataFrame,
    epoch: int | None = None,
    run_token: str | None = None,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    mode: str = "auto",
    rewrite_frac: float = 0.6,
) -> None:
    """The at-scale shape of cluster-label maintenance: per-epoch WRITE
    cost is O(affected components), not O(all labels).

    ``update_cluster_labels`` computes the fold in O(delta) but rewrites
    the whole labels snapshot each epoch — fine for a small labeling,
    wrong at corpus scale. Here the labels live comp-bucketed
    (``bucketed_label_store``), and an epoch:

    1. looks up comp(node) for the delta's nodes with one broadcast join
       of the (tiny) node set against the label scan — a filter-scan,
       never a shuffle of the labels;
    2. runs the contracted CC (O(delta) rows, as merge_edges);
    3. rewrites ONLY the buckets of components whose label changes —
       rows move from bucket(old comp) to bucket(new comp), both of
       which are in the touched set; unchanged components' buckets are
       not read or written. A mega-merge epoch rewrites exactly the
       components it merges — unavoidable, their values changed.

    ``mode`` picks the rewrite strategy per epoch, the same
    touched-bucket-fraction dispatch ``apply_batch_bucketed`` uses (r13
    verdict #4 — the label store previously left the choice to the
    caller despite the measured replay800k crossover):

    - ``"bucketed"``: always rewrite only the touched buckets.
    - ``"full"``: relabel the whole store and rewrite every bucket
      (collapses the manifest to one version — compaction-style).
    - ``"auto"`` (default): bucketed below ``rewrite_frac`` of the
      buckets touched, full at or above it. The fraction comes from the
      touched-bucket collect the bucketed path pays anyway; a
      no-component-changed epoch never escalates (nothing to rewrite —
      the epoch marker alone commits).

    Same (run_token, epoch) replay guard as the other foreachBatch
    bodies; label-equivalence to full recompute pinned in
    tests/test_streaming_dedup.py alongside an untouched-bucket pin.
    """
    from nexus_event_stream_spark.operators.dedup import (
        connected_components,
        merge_edges,
    )
    from nexus_event_stream_spark.streaming.projection import _bucket_expr

    if mode not in ("auto", "bucketed", "full"):
        raise ValueError(f"mode must be auto|bucketed|full, got {mode!r}")
    cur = store.current()
    if store.guard.is_replay(cur, epoch, run_token):
        return  # already applied within this run

    edges = pairs.select(
        F.col(a_col).cast("long").alias("src"),
        F.col(b_col).cast("long").alias("dst"),
    ).localCheckpoint()
    delta_nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )

    labels_all = store.read(spark) if cur else None
    if labels_all is None:
        new = connected_components(pairs, a_col, b_col)
        touched = [
            r[0]
            for r in new.select(
                _bucket_expr(store.n_buckets, "comp").alias("b")
            ).distinct().collect()
        ]
        store.write_buckets(new.select("node", "comp"), touched, epoch, run_token)
        return

    # 1. contraction lookup: broadcast the delta's node set onto the label
    # scan — comp(node) for delta nodes only, no label shuffle
    node_comp = labels_all.join(F.broadcast(delta_nodes), "node").localCheckpoint()
    # 2. contracted CC over O(delta) rows (merge_edges recipe, against the
    # delta-restricted lookup instead of the full labeling)
    lab_a = node_comp.select(F.col("node").alias("__na"), F.col("comp").alias("__ca"))
    lab_b = node_comp.select(F.col("node").alias("__nb"), F.col("comp").alias("__cb"))
    contracted = (
        edges.join(lab_a, edges.src == lab_a.__na, "left")
        .join(lab_b, edges.dst == lab_b.__nb, "left")
        .select(
            F.coalesce("__ca", "src").alias("ca"),
            F.coalesce("__cb", "dst").alias("cb"),
        )
        .localCheckpoint()
    )
    groups = connected_components(contracted, "ca", "cb").select(
        F.col("node").alias("__gnode"), F.col("comp").alias("__gcomp")
    )
    # only genuinely-moving components force a rewrite
    changed = groups.filter(F.col("__gnode") != F.col("__gcomp")).localCheckpoint()
    new_nodes = delta_nodes.join(node_comp.select("node"), "node", "left_anti")
    new_rows = (
        new_nodes.join(groups, new_nodes.node == groups.__gnode, "left")
        .select("node", F.coalesce("__gcomp", "node").alias("comp"))
        .localCheckpoint()
    )
    # 3. touched buckets: old comps being renamed + their new labels +
    # new nodes' labels (rows MOVE between comp buckets)
    touched = [
        r[0]
        for r in changed.select(
            _bucket_expr(store.n_buckets, "__gnode").alias("b")
        )
        .unionByName(
            changed.select(_bucket_expr(store.n_buckets, "__gcomp").alias("b"))
        )
        .unionByName(
            new_rows.select(_bucket_expr(store.n_buckets, "comp").alias("b"))
        )
        .distinct()
        .collect()
    ]
    # touched can be empty (every delta edge lands inside an existing
    # component): still commit the epoch marker so the replay guard
    # engages — same contract as SignatureStore.append on an
    # all-suppressed batch. A non-empty dense epoch takes the full side
    # of the measured crossover: partial rewrite would re-read and
    # re-write ~every bucket anyway, plus per-bucket slice overhead.
    if touched and (
        mode == "full"
        or (mode == "auto" and len(touched) >= rewrite_frac * store.n_buckets)
    ):
        touched = list(range(store.n_buckets))
    full_rewrite = len(touched) == store.n_buckets
    slice_ = (
        store.read(spark, buckets=None if full_rewrite else touched)
        if touched
        else None
    )
    if slice_ is None:
        updated = new_rows
    else:
        relabeled = slice_.join(
            F.broadcast(changed), slice_.comp == changed.__gnode, "left"
        ).select("node", F.coalesce("__gcomp", "comp").alias("comp"))
        updated = relabeled.unionByName(new_rows)
    store.write_buckets(updated, touched, epoch, run_token)
