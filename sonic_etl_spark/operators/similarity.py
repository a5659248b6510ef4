"""Similarity search over embedding columns (array<float>).

- **Brute-force cosine top-k** — the correctness baseline: query-set × corpus
  join, cosine via ``F.zip_with`` + ``F.aggregate`` (sequential fold, so the
  DuckDB oracle's left-to-right accumulation produces bit-identical doubles),
  per-query ``row_number`` top-k. At scale the corpus side stays partitioned
  and the (small) query side is broadcast — Catalyst picks BHJ automatically
  when queries ≪ corpus.
- **Random-hyperplane LSH (SimHash-for-vectors)** — the scale path: sign of
  ⟨v, w_p⟩ for P deterministic ±1 hyperplanes gives a P-bit bucket; ANN
  candidates = same-bucket pairs, re-ranked by exact cosine. Hyperplane
  weights derive from md5 at module import (seeded, no RNG), so Spark and the
  SQL oracle share the exact same planes.

At 100 TB / billions of vectors: the LSH variant shuffles once on bucket id
(buckets are ~uniform by construction, no skew), and brute-force is reserved
for re-ranking candidate sets. An IVF variant would replace the bucket id
with a learned centroid id — same join shape.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

EMB_DIM = 64
N_PLANES = 8


def _plane_weights(n_planes: int = N_PLANES, dim: int = EMB_DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 — shared with the SQL oracle."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane{p}:{d}".encode()).hexdigest()
            row.append(1 if h[0] in "89abcdef" else -1)
        planes.append(row)
    return planes


PLANES = _plane_weights()


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns, computed in double precision.

    Sequential left-to-right folds → deterministic, oracle-reproducible.
    """
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def normalized(a: Column) -> Column:
    """Unit-normalized double vector: x / sqrt(Σx²), elementwise.

    Pairwise queries normalize each row ONCE (per stream/broadcast row)
    instead of recomputing two norms per pair — 3 array folds → 1 in the
    O(n·m) inner loop. The DuckDB oracles use the exact same per-element
    division + left-to-right dot, so rounded values match bit-for-bit.
    """
    d = F.transform(a, lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.transform(d, lambda x: x / norm)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def brute_force_topk(
    emb: DataFrame, query_ids: list[int], k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query id against the whole corpus."""
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), normalized(F.col(vec_col)).alias("qv")
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), normalized(F.col(vec_col)).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def top_pairs(
    emb: DataFrame, top_k: int = 50, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Most-similar distinct pairs by exact cosine (near-dup detection)."""
    a = emb.select(F.col(id_col).alias("vec_a"), normalized(F.col(vec_col)).alias("va"))
    b = emb.select(F.col(id_col).alias("vec_b"), normalized(F.col(vec_col)).alias("vb"))
    pairs = (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(dot(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
    )
    return pairs.orderBy(F.desc("cos_sim"), "vec_a", "vec_b").limit(top_k)


def lsh_bucket(vec_col: Column, planes: list[list[int]] | None = None) -> Column:
    """P-bit random-hyperplane bucket id for a vector column."""
    planes = planes or PLANES
    v = F.transform(vec_col, lambda x: x.cast("double"))
    bucket = None
    for p, row in enumerate(planes):
        w = F.array(*[F.lit(float(x)) for x in row])
        dot = F.aggregate(
            F.zip_with(v, w, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        bit = F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else (bucket + bit)
    return bucket.cast("int")


def lsh_buckets(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Per-vector LSH bucket assignment (the ANN index build)."""
    return emb.select(
        F.col(id_col).alias("vec_id"), lsh_bucket(F.col(vec_col)).alias("bucket")
    )


def ivf_assign(
    emb: DataFrame, n_centroids: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid.

    Deterministic centroid choice: the first ``n_centroids`` vectors by id
    (a seeded k-means would slot in identically — the assignment join shape
    is what matters at scale). Assignment = argmax cosine over the broadcast
    centroid set, ties broken by centroid id ascending. One broadcast join +
    one row_number per vector — no shuffle of the corpus.
    """
    cents = emb.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), normalized(F.col(vec_col)).alias("cv")
    )
    v = emb.select(F.col(id_col).alias("vec_id"), normalized(F.col(vec_col)).alias("nv"))
    scored = (
        v.join(F.broadcast(cents))
        .select(
            "vec_id",
            "centroid_id",
            F.round(dot(F.col("nv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "centroid_id", F.col("cos_sim").alias("centroid_cos"))
    )


def ann_topk_ivf(
    emb: DataFrame, query_ids: list[int], k: int = 5, n_centroids: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via IVF cells (single-probe): candidates share the query's
    centroid; exact cosine re-rank. Same join shape as the LSH variant —
    equi-join on a uniform-ish cell id instead of a hyperplane bucket."""
    assigned = ivf_assign(emb, n_centroids, id_col, vec_col).select(
        "vec_id", "centroid_id"
    )
    indexed = emb.select(
        F.col(id_col).alias("vec_id"), normalized(F.col(vec_col)).alias("nv")
    ).join(assigned, "vec_id")
    q = indexed.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("nv").alias("qv"),
        F.col("centroid_id"),
    )
    scored = (
        F.broadcast(q)
        .join(indexed, on="centroid_id")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot(F.col("qv"), F.col("nv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ann_topk_lsh(
    emb: DataFrame, query_ids: list[int], k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates from the query's LSH bucket, exact re-rank.

    Recall < 1 by design (single-probe); scale path for billion-row corpora —
    the bucket equi-join shuffles once on a uniform key instead of a cross
    join.
    """
    indexed = emb.select(
        F.col(id_col).alias("vec_id"),
        normalized(F.col(vec_col)).alias("vec"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    q = indexed.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qv"),
        F.col("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(indexed, on="bucket")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot(F.col("qv"), F.col("vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
