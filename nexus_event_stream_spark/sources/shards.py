"""Sharded training-corpus sink with a manifest-committed contract.

The last hop of a data pipeline: publish the prepared corpus as N
size-balanced parquet shards that training loaders consume shard-local,
plus a manifest a loader can trust — written with the SAME versioned
snapshot + atomic pointer discipline as the view stores
(streaming/projection.py, streaming/commit.py):

- each publish writes a fresh ``v=<n>`` directory nobody references yet
  (one shuffle, on the shard key);
- the manifest (per-shard row counts + file lists + the shard function,
  so a loader can re-derive placement) commits LAST via the pluggable
  pointer backend — ``PosixRenameBackend`` here, conditional-put on
  object stores, where a concurrent publisher surfaces as an explicit
  ``CommitConflictError`` instead of a silently mixed corpus;
- readers resolve the pointer first, so a crashed publish is invisible
  and the previous version stays readable (one-version time travel,
  same as the stores).

Shard assignment is the deterministic Knuth-hash bucket of the doc key —
replayable, engine-portable, and uniform (shard skew would starve
loader workers at epoch tails).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexus_event_stream_spark.operators.sampling import hash_bucket
from nexus_event_stream_spark.streaming.commit import PosixRenameBackend


class ShardedCorpusWriter:
    """Versioned sharded parquet corpus under ``root`` with an atomically
    committed manifest pointer (``manifest.json``)."""

    def __init__(self, root: str, n_shards: int = 16, backend=None) -> None:
        self.root = root
        self.n_shards = n_shards
        self.backend = backend or PosixRenameBackend()
        os.makedirs(root, exist_ok=True)

    def _pointer_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def current(self) -> dict | None:
        return self.backend.read(self._pointer_path())

    def write(self, df: DataFrame, key_col: str = "doc_id") -> dict:
        """Publish ``df`` as the next corpus version; returns the manifest.

        One shuffle (repartition on the shard id) then a partitioned
        write — shard subdirectories land as ``shard=<k>``. Row counts
        for the manifest come from reading the fresh version back
        (parquet footer counts — metadata, not data). The pointer commit
        carries the previously-read manifest as ``expected`` so two
        racing publishers cannot both win on a conditional-put backend.
        """
        cur = self.current()
        version = (cur["version"] + 1) if cur else 0
        out = os.path.join(self.root, f"v={version}")
        with_shard = df.withColumn(
            "shard", hash_bucket(key_col, self.n_shards).cast("int")
        )
        (
            with_shard.repartition("shard")
            .write.mode("errorifexists")
            .partitionBy("shard")
            .parquet(out)
        )
        spark = df.sparkSession
        counts = {
            int(r["shard"]): r["n"]
            for r in spark.read.parquet(out)
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        shards = {}
        for k in range(self.n_shards):
            d = os.path.join(out, f"shard={k}")
            files = sorted(
                f for f in (os.listdir(d) if os.path.isdir(d) else [])
                if f.endswith(".parquet")
            )
            shards[str(k)] = {"rows": counts.get(k, 0), "files": files}
        manifest = {
            "version": version,
            "created_unix": int(time.time()),
            "n_shards": self.n_shards,
            "shard_fn": f"knuth_hash({key_col}) % {self.n_shards}",
            "total_rows": sum(s["rows"] for s in shards.values()),
            "shards": shards,
        }
        self.backend.commit(self._pointer_path(), manifest, expected=cur)
        return manifest

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        """The committed corpus (or an explicit older ``version``); None
        before the first publish. Never reads an uncommitted directory."""
        cur = self.current()
        if cur is None:
            return None
        v = cur["version"] if version is None else version
        return spark.read.parquet(os.path.join(self.root, f"v={v}"))

    def read_shard(self, spark: SparkSession, shard: int) -> DataFrame | None:
        """One shard of the committed version — the loader-worker read
        path (partition-pruned: only that shard directory is listed)."""
        df = self.read(spark)
        return None if df is None else df.filter(F.col("shard") == shard)
