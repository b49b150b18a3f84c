"""Semantic deduplication over an embedding column (SemDeDup-style).

Implements the cluster-then-prune strategy of SemDeDup (Abbas et al. 2023,
arXiv:2303.09540): k-means-cluster the corpus embeddings, compare vectors
pairwise ONLY within a cluster, and from every group of semantic
near-duplicates (cosine ≥ eps) keep one representative — the paper's
policy keeps the member FARTHEST from its cluster centroid (prototypical
text is what gets over-represented in web corpora; the outlier carries the
information).

No reference counterpart (the reference is a CQRS event system with no
analytics tier) — this is part of the training-data-pipeline surface,
sitting beside the lexical near-dup chain in operators/dedup.py: MinHash
catches edit-level mirrors, semantic dedup catches paraphrases that share
no shingles.

Scale shape (the 100 TB argument):
- ONE shuffle, by ``centroid_id`` — the cluster assignment is an Arrow
  mapInPandas pass (no shuffle), and the pairwise stage is
  ``groupBy(centroid_id).applyInPandas``. With k clusters sized ~n/k the
  pairwise work is O(n²/k) spread over k independent tasks; k is the
  operator's scale knob (the paper uses 50k clusters at web scale).
- Skew cap: a degenerate cluster (boilerplate sinks everything into one
  centroid) would go quadratic, so clusters beyond ``max_pairwise``
  members fall back to a BANDED comparison — members sorted by a seeded
  1-d random projection (tie-break id), each compared to its
  ``max_pairwise`` sort-predecessors. Near-duplicate vectors project to
  near-equal values (within √(2(1−eps)) for unit vectors) while the
  corpus spreads over ~±1/√d, so the band catches dups while bounding
  any cluster at O(c·max_pairwise). Same discipline as
  ``minhash_lsh_candidates``'s ``max_bucket_size`` star fallback.
- Keeper selection is a window over duplicate COMPONENTS (tiny relative to
  the corpus: only docs that appear in some eps-pair), never over the
  whole corpus.
- Driver state is O(k·d) centroids — nothing corpus-sized is collected.

Approximation boundary (inherent to SemDeDup, documented not hidden):
pairs that straddle a cluster boundary are never compared, so recall
against an all-pairs oracle is < 1 by design; tests/test_semdedup.py
measures it on planted duplicates instead of assuming it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from ..io import spread
from .dedup import connected_components
from .similarity import ivf_assign, ivf_train_centroids

__all__ = [
    "semantic_dedup",
    "semantic_dedup_pairs",
    "centroid_distances",
    "derived_n_clusters",
]


def derived_n_clusters(
    n_vectors: int,
    avg_cluster_size: int = 4096,
    max_clusters: int = 1 << 20,
) -> int:
    """Scale-respecting cluster count: ``k ≈ n / avg_cluster_size``.

    The SemDeDup paper's regime — k grows LINEARLY with the corpus (50k
    clusters at web scale) so the per-cluster pairwise term n²/k stays
    O(n·avg_cluster_size), i.e. bounded per row as the corpus grows. A
    fixed k would go quadratic: at 100 TB the pairwise GEMM, not the
    clustering, dominates. The default ties the expected cluster size to
    ``semantic_dedup``'s ``max_pairwise`` GEMM cap (4096), so the exact
    path is the common case and the banded fallback stays the skew
    exception. ``max_clusters`` bounds driver state (centroids are O(k·d)
    on the driver) — 2^20 clusters × 64 dims × 8 B = 512 MB, the ceiling
    before a coarse quantizer must itself be sharded.
    """
    import math

    if n_vectors <= 0:
        return 1
    return max(1, min(int(max_clusters), math.ceil(n_vectors / float(avg_cluster_size))))

_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("cos", T.DoubleType()),
    ]
)


def _normalized(m):
    import numpy as np

    norms = np.linalg.norm(m, axis=1, keepdims=True)
    # zero vectors: cosine 0 against everything (never a duplicate)
    norms[norms == 0.0] = 1.0
    return m / norms


def semantic_dedup_pairs(
    embeddings: DataFrame,
    centroids,
    eps: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_pairwise: int = 4096,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: (id_a, id_b, cos) with
    ``id_a < id_b`` and ``cos >= eps``.

    ``centroids`` is a (k×d) ndarray (``ivf_train_centroids`` output — or
    ``seeded_codebook`` for a training-free layout). Each cluster arrives
    as one pandas group; ≤ ``max_pairwise`` members get the exact GEMM
    (c×c upper triangle), larger clusters the banded fallback described in
    the module docstring. The pair SET is partition-independent: grouped-
    map delivers whole clusters, and the canonical id_a<id_b orientation
    plus per-row float math make every emitted row identical across runs.
    """
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    assigned = ivf_assign(
        embeddings, cents, id_col=id_col, vec_col=vec_col, include_vec=True
    )

    def per_cluster(pdf):
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos": "float64"}
            )
        ids = pdf[id_col].to_numpy(dtype="int64")
        m = _normalized(np.array(pdf[vec_col].tolist(), dtype=np.float64))
        if n <= max_pairwise:
            sims = m @ m.T
            ia, ib = np.triu_indices(n, k=1)
            keep = sims[ia, ib] >= eps
            ia, ib, cos = ia[keep], ib[keep], sims[ia[keep], ib[keep]]
        else:
            # Band key: seeded random PROJECTION, not centroid distance —
            # distances concentrate in high dim (measured on the 64-dim
            # test corpus: distance order leaves near-dup mirrors up to 49
            # ranks apart vs ≤4 under projection order), so a JL-style 1-d
            # projection separates the corpus while keeping cos≥eps pairs
            # within ≈√(2(1−eps)) of each other. Deterministic: the
            # direction comes from the repo's seeded LCG hyperplanes.
            from .similarity import _hyperplanes

            u = np.asarray(
                _hyperplanes(m.shape[1], 1, seed=7)[0], dtype=np.float64
            )
            u /= np.linalg.norm(u)
            order = np.lexsort((ids, m @ u))
            ids, m = ids[order], m[order]
            parts_a, parts_b, parts_c = [], [], []
            for off in range(1, max_pairwise + 1):
                if off >= n:
                    break
                c = (m[off:] * m[:-off]).sum(axis=1)
                hit = c >= eps
                if hit.any():
                    lo = np.nonzero(hit)[0]
                    parts_a.append(lo)
                    parts_b.append(lo + off)
                    parts_c.append(c[hit])
            if parts_a:
                ia = np.concatenate(parts_a)
                ib = np.concatenate(parts_b)
                cos = np.concatenate(parts_c)
            else:
                ia = ib = np.array([], dtype=np.int64)
                cos = np.array([], dtype=np.float64)
        a, b = ids[ia], ids[ib]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos": cos})

    return assigned.groupBy("centroid_id").applyInPandas(
        per_cluster, _PAIR_SCHEMA
    )


def centroid_distances(
    embeddings: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id, cdist): nearest centroid + L2 distance to it.

    One Arrow pass, no shuffle — the keeper-policy input for
    ``semantic_dedup`` and a useful per-document "prototypicality" signal
    on its own (low distance = boilerplate-like).
    """
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("centroid_id", T.IntegerType()),
            T.StructField("cdist", T.DoubleType()),
        ]
    )

    def dists(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            c = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype="int64"),
                    "centroid_id": c.astype("int32"),
                    "cdist": np.sqrt(d2[np.arange(len(c)), c]),
                }
            )

    return (
        spread(embeddings)
        .select(id_col, vec_col)
        .mapInPandas(dists, out_schema)
    )


def semantic_dedup(
    embeddings: DataFrame,
    eps: float = 0.9,
    n_clusters: int | None = None,
    iters: int = 4,
    centroids=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_pairwise: int = 4096,
    keep: str = "farthest",
    avg_cluster_size: int = 4096,
) -> DataFrame:
    """Canonical-representative mapping (id, keep_id) for semantic dedup.

    ``embeddings.join(mapping, id_col).filter(id == keep_id)`` is the
    semantically deduplicated corpus; the mapping is the provenance record
    (same contract as ``dedup_groups`` for the lexical chain, so pipelines
    compose the two interchangeably).

    ``n_clusters=None`` (the default) derives k from the corpus size —
    ``derived_n_clusters(count, avg_cluster_size)`` — the paper's linear-k
    regime, keeping per-cluster pairwise work bounded as n grows. The
    count is one extra column-pruned job; pass an explicit ``n_clusters``
    (or prebuilt ``centroids``) to skip it.

    ``keep='farthest'`` is the SemDeDup paper policy: per duplicate
    component keep the member with the greatest distance to its cluster
    centroid (ties broken by smallest id). ``keep='min_id'`` keeps the
    smallest id — cheaper (skips the distance pass) and the right choice
    when ids encode priority (e.g. earliest crawl).
    """
    if keep not in ("farthest", "min_id"):
        raise ValueError(f"keep must be 'farthest' or 'min_id', got {keep!r}")
    if centroids is None:
        if n_clusters is None:
            n_clusters = derived_n_clusters(
                embeddings.count(), avg_cluster_size=avg_cluster_size
            )
        centroids = ivf_train_centroids(
            embeddings, n_centroids=n_clusters, iters=iters, vec_col=vec_col
        )
    pairs = semantic_dedup_pairs(
        embeddings,
        centroids,
        eps=eps,
        id_col=id_col,
        vec_col=vec_col,
        max_pairwise=max_pairwise,
    )
    comp = connected_components(pairs, a_col="id_a", b_col="id_b").select(
        F.col("node").alias(id_col), "comp"
    )
    ids = embeddings.select(id_col)
    if keep == "min_id":
        # component label IS the min id — reuse it directly
        mapping = ids.join(comp, id_col, "left").select(
            id_col, F.coalesce(F.col("comp"), F.col(id_col)).alias("keep_id")
        )
        return mapping
    from pyspark.sql import Window

    dist = centroid_distances(
        embeddings, centroids, id_col=id_col, vec_col=vec_col
    ).select(id_col, "cdist")
    members = comp.join(dist, id_col)
    w = Window.partitionBy("comp").orderBy(
        F.col("cdist").desc(), F.col(id_col).asc()
    )
    keepers = (
        members.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col("comp"), F.col(id_col).alias("keep_id"))
    )
    return (
        ids.join(comp, id_col, "left")
        .join(keepers, "comp", "left")
        .select(
            id_col,
            F.coalesce(F.col("keep_id"), F.col(id_col)).alias("keep_id"),
        )
    )
