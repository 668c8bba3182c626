"""Approximate nearest-neighbor search over embedding columns.

Two paths over ``embeddings(vec_id, embedding: array<float>, ...)``:

- EXACT brute force (queries.py emb_cosine_topk / emb_neardup_pairs):
  JVM-side zip_with/aggregate dot products — the correctness baseline,
  O(n) per query.
- LSH-bucketed (this module, the 100 TB path): random-hyperplane signs
  give every vector a B-bit bucket; a query probes its own bucket plus all
  hamming-1 neighbors (multi-probe), computes exact cosine only on the
  candidates, and returns top-k. Index build is one narrow map (no
  shuffle); queries touch ~ (B+1)/2^B of the data.

Determinism: hyperplane components are pure functions of (plane, dim) —
`sin(hash(plane, dim))`-free; we use the same 60-bit md5-derived hash as
the dedup suite mapped into [-1, 1), so index and query sides agree across
any partitioning, session, or engine.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-gaussian-ish component in [-1, 1)."""
    h = int(hashlib.md5(f"plane:{plane}:{dim}".encode()).hexdigest()[:15], 16)
    return (h / float(1 << 60)) * 2.0 - 1.0


def hyperplanes(n_planes: int, dim: int) -> np.ndarray:
    return np.array(
        [[_plane_component(p, d) for d in range(dim)] for p in range(n_planes)],
        dtype=np.float64,
    )


def _bucket_expr(vec_col, planes: np.ndarray):
    """JVM-side bucket id: sum of 2^p over planes with positive dot."""
    out = F.lit(0)
    for p, row in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in row]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out.cast("int")


def ann_index(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """(vec_id, unit-normalized vector, bucket) — one narrow map over the
    scan. At scale, write this partitioned/bucketed BY ``bucket`` so a
    probe is partition pruning, not a scan."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes = hyperplanes(n_planes, dim)
    v = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(v, lambda x: x / norm).alias("unit"),
        _bucket_expr(v, planes).alias("bucket"),
    )


def ann_query(
    index: DataFrame,
    query_vec,
    k: int = 10,
    n_planes: int = 6,
    multiprobe: bool = True,
    exclude_id=None,
) -> DataFrame:
    """Top-k by cosine among vectors in the query's bucket (+ hamming-1
    buckets when ``multiprobe``). Candidate filter is an IN over <= B+1
    bucket ids -> partition pruning at scale; exact cosine on candidates."""
    q = np.asarray(query_vec, dtype=np.float64)
    qu = q / np.linalg.norm(q)
    planes = hyperplanes(n_planes, len(q))
    qb = int(sum((1 << p) for p in range(n_planes) if planes[p] @ q > 0))
    buckets = [qb] + ([qb ^ (1 << p) for p in range(n_planes)] if multiprobe else [])
    qlit = F.array(*[F.lit(float(x)) for x in qu])
    cos = F.aggregate(
        F.zip_with(F.col("unit"), qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    out = index.filter(F.col("bucket").isin(buckets))
    if exclude_id is not None:
        out = out.filter(F.col("vec_id") != exclude_id)
    return (
        out.withColumn("cosine", F.round(cos, 6))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
        .select("vec_id", "cosine")
    )


def brute_force_topk(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id=None,
) -> DataFrame:
    """Exact top-k (the oracle for recall measurements)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qu = q / np.linalg.norm(q)
    v = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    qlit = F.array(*[F.lit(float(x)) for x in qu])
    cos = F.aggregate(
        F.zip_with(F.transform(v, lambda x: x / norm), qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    out = emb
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return (
        out.select(F.col(id_col).alias("vec_id"), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant: k-means coarse quantizer + probed lists
# ---------------------------------------------------------------------------

def ivf_index(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
    max_iter: int = 20,
):
    """IVF coarse index: k-means (pyspark.ml, seeded) partitions the
    corpus into ``n_lists`` inverted lists; returns (index_df, centroids).

    index_df = (vec_id, unit[array<double>], list_id) — at scale this is
    written partitioned/bucketed BY list_id, so a probe reads only
    n_probe/n_lists of the data (file pruning, same posture as the LSH
    bucket column). Centroids are an (n_lists, dim) numpy array — the
    driver-side routing table (tiny; broadcast implicitly via the query
    literal). Training cost is one ML job over the (sampled) corpus;
    assignment is one narrow map. Unlike the hyperplane index the lists
    adapt to the data distribution, which is what recovers recall on
    clustered real-world embeddings."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    v = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    unit = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(v, lambda x: x / norm).alias("unit"),
    )
    feat = unit.withColumn("features", array_to_vector(F.col("unit")))
    km = KMeans(k=n_lists, seed=seed, maxIter=max_iter).fit(feat)
    centroids = np.array([np.asarray(c) for c in km.clusterCenters()])
    index = (
        km.transform(feat)
        .select("vec_id", "unit", F.col("prediction").alias("list_id"))
    )
    return index, centroids


def ivf_query(
    index: DataFrame,
    centroids: np.ndarray,
    query_vec,
    k: int = 10,
    n_probe: int = 4,
    exclude_id=None,
) -> DataFrame:
    """Top-k by cosine among the ``n_probe`` lists whose centroids are
    closest to the query (driver-side argsort over the tiny routing
    table); exact cosine on the candidate lists only."""
    q = np.asarray(query_vec, dtype=np.float64)
    qu = q / np.linalg.norm(q)
    d = ((centroids - qu[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d)[:n_probe]]
    qlit = F.array(*[F.lit(float(x)) for x in qu])
    cos = F.aggregate(
        F.zip_with(F.col("unit"), qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    out = index.filter(F.col("list_id").isin(probe))
    if exclude_id is not None:
        out = out.filter(F.col("vec_id") != exclude_id)
    return (
        out.withColumn("cosine", F.round(cos, 6))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
        .select("vec_id", "cosine")
    )
