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


TOP_PAIRS_MAX_ROWS = 20_000


def top_pairs(
    emb: DataFrame, top_k: int = 50, id_col: str = "vec_id", vec_col: str = "embedding",
    allow_large: bool = False,
) -> DataFrame:
    """Most-similar distinct pairs by EXACT all-pairs cosine.

    O(n²) cross join — a re-rank/verification tool for small inputs only
    (≤ ``TOP_PAIRS_MAX_ROWS`` rows unless ``allow_large``); at corpus scale
    use :func:`near_dup_pairs`, which finds candidates through the LSH
    bucket equi-join and re-ranks only those. The guard is a driver-side
    count (O(1) control-plane aggregate, not a data collect)."""
    if not allow_large:
        n = emb.count()
        if n > TOP_PAIRS_MAX_ROWS:
            raise ValueError(
                f"top_pairs is all-pairs O(n²); input has {n} rows "
                f"(max {TOP_PAIRS_MAX_ROWS}). Use near_dup_pairs for the "
                "bucketed scale path, or pass allow_large=True."
            )
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


def near_dup_pairs(
    emb: DataFrame, threshold: float = 0.9, top_k: int | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs at scale: LSH-bucket candidates → exact cosine
    re-rank → threshold.

    Candidate generation is an equi-join on the P-bit hyperplane bucket
    (one shuffle on a ~uniform key; no cross join ever materializes), then
    only colliding pairs pay the exact dot product. Recall follows the LSH
    collision bound (near-identical vectors agree on every plane with
    prob → 1), precision is exact because of the re-rank. This is the
    production replacement for :func:`top_pairs` at 10^9 vectors.
    """
    indexed = emb.select(
        F.col(id_col).alias("vec_id"),
        normalized(F.col(vec_col)).alias("nv"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    a = indexed.alias("a")
    b = indexed.alias("b")
    pairs = (
        a.join(b, on="bucket")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot(F.col("a.nv"), F.col("b.nv")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
    if top_k is not None:
        pairs = pairs.orderBy(F.desc("cos_sim"), "vec_a", "vec_b").limit(top_k)
    return pairs


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


def lsh_probe_buckets(
    vec_col: Column, n_probes: int = 1, planes: list[list[int]] | None = None
) -> Column:
    """Multi-probe bucket list (array<int>): the vector's own bucket plus
    the buckets reached by flipping its (n_probes - 1) LEAST-CONFIDENT
    plane bits — the planes whose |⟨v, w_p⟩| is smallest, i.e. where a true
    neighbor most plausibly landed on the other side. Classic multi-probe
    LSH: recall of a (n_probes)×-larger index scan without rebuilding or
    widening the index itself. Pure column expressions (array_sort over
    (|dot|, p) structs), no UDF."""
    planes = planes or PLANES
    v = F.transform(vec_col, lambda x: x.cast("double"))
    dots = []
    for row in planes:
        w = F.array(*[F.lit(float(x)) for x in row])
        dots.append(
            F.aggregate(
                F.zip_with(v, w, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
            )
        )
    bucket = None
    for p, d in enumerate(dots):
        bit = F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else (bucket + bit)
    bucket = bucket.cast("int")
    # (|dot|, flipped-bucket) per plane, sorted by confidence ascending —
    # the flip is precomputed per plane so the sort carries the result
    confidence = F.array_sort(
        F.array(
            *[
                F.struct(
                    F.abs(d).alias("a"),
                    bucket.bitwiseXOR(F.lit(1 << p)).cast("int").alias("b"),
                )
                for p, d in enumerate(dots)
            ]
        )
    )
    flips = F.slice(confidence, 1, max(n_probes - 1, 0))
    probes = F.transform(flips, lambda s: s["b"])
    return F.concat(F.array(bucket), probes)


def seed_centroids(
    emb: DataFrame, n_centroids: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse centroids: the first ``n_centroids`` vectors by
    id, unit-normalized → (centroid_id, cv). The quick-start quantizer;
    :func:`ivf_train` refines it with spherical k-means."""
    return emb.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), normalized(F.col(vec_col)).alias("cv")
    )


def ivf_train(
    emb: DataFrame, n_centroids: int = 16, iters: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> DataFrame:
    """Learned IVF centroids: spherical k-means (Lloyd's), DataFrame-only.

    Deterministic end to end: init = :func:`seed_centroids` (no RNG), each
    iteration is (a) broadcast-join argmax-cosine assignment — no corpus
    shuffle — and (b) an element-wise mean via posexplode → per-(cell, dim)
    avg → re-assembled and re-normalized. Empty cells keep their previous
    centroid (left-join fallback), so the cell count never collapses.

    Scale path (the production defaults at 10^9 vectors):

    - ``sample_mod=S`` trains on the deterministic hash sample
      ``pmod(xxhash64(id), S) == 0`` (~1/S of the corpus). Assignment
      quality needs only a representative sample; the downstream
      :func:`ivf_assign` stage still covers every vector.
    - The k×dim centroids are **collected to the driver after every
      iteration** and re-emitted as a literal DataFrame (a few KB), so
      iteration i+1's broadcast join does not replay iterations 0..i and —
      critically — the RETURNED frame is a LocalRelation: any downstream
      action (``ivf_assign``, ``ann_topk_ivf``) scans the corpus exactly
      once instead of re-running the whole Lloyd's lineage per action.
    """
    v = emb.select(
        F.col(id_col).alias("vec_id"), normalized(F.col(vec_col)).alias("nv")
    )
    if sample_mod is not None and sample_mod > 1:
        v = v.where(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(sample_mod)) == 0)
    spark = emb.sparkSession
    cents = seed_centroids(emb, n_centroids, id_col, vec_col)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("centroid_id"))
    for _ in range(iters):
        assigned = (
            v.join(F.broadcast(cents))
            .select(
                "vec_id", "nv", "centroid_id",
                dot(F.col("nv"), F.col("cv")).alias("cos_sim"),
            )
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("centroid_id", "nv")
        )
        means = (
            assigned.select("centroid_id", F.posexplode("nv").alias("dim", "x"))
            .groupBy("centroid_id", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim"), F.col("m")))
                ).alias("pairs")
            )
            .select(
                "centroid_id",
                F.transform("pairs", lambda p: p["m"]).alias("mean_vec"),
            )
            .select("centroid_id", normalized(F.col("mean_vec")).alias("new_cv"))
        )
        merged = (
            cents.join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("new_cv"), F.col("cv")).alias("cv"),
            )
        )
        # k×dim doubles — collect() truncates the lineage so the next
        # iteration (and every downstream action) starts from a literal.
        cents = spark.createDataFrame(merged.collect(), schema=merged.schema)
    return cents


def ivf_assign(
    emb: DataFrame, n_centroids: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid.

    ``centroids`` defaults to the deterministic :func:`seed_centroids`
    (the oracle-checked convention); pass :func:`ivf_train` output for
    learned cells. Assignment = argmax cosine over the broadcast
    centroid set, ties broken by centroid id ascending. One broadcast join +
    one row_number per vector — no shuffle of the corpus.
    """
    cents = centroids if centroids is not None else seed_centroids(
        emb, n_centroids, id_col, vec_col
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
    n_probes: int = 1, id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k via IVF cells: candidates share one of the query's
    ``n_probes`` NEAREST centroids (multi-probe); exact cosine re-rank.
    Same join shape as the LSH variant — equi-join on a uniform-ish cell id
    instead of a hyperplane bucket; the probe fan-out multiplies only the
    (small, broadcast) query side, never the corpus. Pass
    ``centroids=ivf_train(emb)`` for learned cells."""
    cents = centroids if centroids is not None else seed_centroids(
        emb, n_centroids, id_col, vec_col
    )
    assigned = ivf_assign(
        emb, n_centroids, id_col, vec_col, centroids=cents
    ).select("vec_id", "centroid_id")
    indexed = emb.select(
        F.col(id_col).alias("vec_id"), normalized(F.col(vec_col)).alias("nv")
    ).join(assigned, "vec_id")
    qvecs = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), normalized(F.col(vec_col)).alias("qv")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("probe_cos"), F.asc("centroid_id")
    )
    probes = (
        qvecs.join(F.broadcast(cents))
        .select(
            "query_id",
            "qv",
            "centroid_id",
            dot(F.col("qv"), F.col("cv")).alias("probe_cos"),
        )
        .withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= n_probes)
        .select("query_id", "qv", "centroid_id")
    )
    scored = (
        F.broadcast(probes)
        .join(indexed, on="centroid_id")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot(F.col("qv"), F.col("nv")), 6).alias("cos_sim"),
        )
        .distinct()  # a neighbor reachable via 2 probes must score once
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ann_topk_lsh(
    emb: DataFrame, query_ids: list[int], k: int = 5, n_probes: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates from the query's LSH bucket(s), exact re-rank.

    ``n_probes`` > 1 enables multi-probe (see :func:`lsh_probe_buckets`):
    the query additionally searches the buckets across its least-confident
    hyperplanes, recovering most of the recall a single probe loses. The
    probe fan-out happens on the (small, broadcast) query side only — the
    corpus keeps exactly one bucket per vector and shuffles once.
    """
    indexed = emb.select(
        F.col(id_col).alias("vec_id"),
        normalized(F.col(vec_col)).alias("vec"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
    )
    q = (
        emb.where(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            normalized(F.col(vec_col)).alias("qv"),
            F.explode(lsh_probe_buckets(F.col(vec_col), n_probes)).alias("bucket"),
        )
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
        .distinct()  # probe buckets are distinct, but stay defensive
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
