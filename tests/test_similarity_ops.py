"""Similarity operator unit tests (cosine, brute-force top-k, LSH ANN)."""

import pyspark.sql.functions as F

from sonic_etl_spark.operators import similarity as sim_ops


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_cosine_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0], "same"), ([1.0, 0.0], [0.0, 1.0], "orth")],
        "a array<float>, b array<float>, tag string",
    )
    out = {
        r["tag"]: r["c"]
        for r in df.select(
            "tag", F.round(sim_ops.cosine(F.col("a"), F.col("b")), 6).alias("c")
        ).collect()
    }
    assert out["same"] == 1.0
    assert out["orth"] == 0.0


def test_brute_force_topk_ordering(spark):
    df = _emb(
        spark,
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),   # closest to 0
            (2, [0.5, 0.5, 0.0]),
            (3, [0.0, 1.0, 0.0]),   # farthest from 0
        ],
    )
    rows = sim_ops.brute_force_topk(df, query_ids=[0], k=3).collect()
    order = [r["neighbor_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert order == [1, 2, 3]
    assert all(r["query_id"] == 0 for r in rows)


def _expected_bucket(vec):
    b = 0
    for p, row in enumerate(sim_ops.PLANES):
        dot = sum(x * w for x, w in zip(vec, row))
        if dot > 0:
            b |= 1 << p
    return b


def test_lsh_bucket_matches_python_reference(spark):
    dim = sim_ops.EMB_DIM
    v = [0.25 + 0.01 * i for i in range(dim)]
    w = [-x for x in v]
    df = _emb(spark, [(1, v), (2, v), (3, w)])
    out = {r["vec_id"]: r["bucket"] for r in sim_ops.lsh_buckets(df).collect()}
    assert out[1] == out[2]
    assert 0 <= out[1] < (1 << sim_ops.N_PLANES)
    assert out[1] == _expected_bucket(v)
    assert out[3] == _expected_bucket(w)


def test_ann_lsh_finds_same_bucket_neighbor(spark):
    dim = sim_ops.EMB_DIM
    base = [1.0] + [0.1] * (dim - 1)
    near = [0.9 * x for x in base]  # same direction → provably same bucket
    df = _emb(spark, [(0, base), (1, near)])
    rows = sim_ops.ann_topk_lsh(df, query_ids=[0], k=5).collect()
    assert any(r["neighbor_id"] == 1 for r in rows)


def test_ivf_assign_and_ann(spark):
    dim = sim_ops.EMB_DIM
    # centroid 0 along e0, centroid 1 along e1; others cluster near them
    e0 = [1.0] + [0.0] * (dim - 1)
    e1 = [0.0, 1.0] + [0.0] * (dim - 2)
    near0 = [0.9, 0.05] + [0.0] * (dim - 2)
    near1 = [0.05, 0.9] + [0.0] * (dim - 2)
    df = _emb(spark, [(0, e0), (1, e1), (2, near0), (3, near1)])
    assign = {
        r["vec_id"]: r["centroid_id"]
        for r in sim_ops.ivf_assign(df, n_centroids=2).collect()
    }
    assert assign == {0: 0, 1: 1, 2: 0, 3: 1}
    rows = sim_ops.ann_topk_ivf(df, query_ids=[2], k=3, n_centroids=2).collect()
    # same-cell candidate (vec 0) found; other-cell vectors absent
    assert {r["neighbor_id"] for r in rows} == {0}


def _clustered_corpus(spark, n_clusters=8, per_cluster=40, dim=16, seed=7):
    """Deterministic clustered vectors — the regime ANN indexes are built
    for (random vectors are adversarial for any LSH/IVF: their neighbors
    are near-uniform over buckets, so 'recall' is meaningless there)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    # interleave clusters by id (vid % n_clusters) so the IVF convention of
    # 'first 16 ids are the coarse centroids' covers every cluster
    for vid in range(n_clusters * per_cluster):
        c = vid % n_clusters
        v = centers[c] + 0.15 * rng.normal(size=dim)
        rows.append((vid, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _recall(ann_rows, exact_rows):
    ann = {}
    for r in ann_rows:
        ann.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    exact = {}
    for r in exact_rows:
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(ann.get(q, set()) & s) for q, s in exact.items())
    total = sum(len(s) for s in exact.values())
    return hits / total


def test_multiprobe_lsh_recall(spark):
    df = _clustered_corpus(spark)
    qids = [0, 45, 90, 135, 180, 225, 270, 315]
    exact = sim_ops.brute_force_topk(df, qids, k=5).collect()
    single = sim_ops.ann_topk_lsh(df, qids, k=5, n_probes=1).collect()
    multi = sim_ops.ann_topk_lsh(df, qids, k=5, n_probes=4).collect()
    r1, r4 = _recall(single, exact), _recall(multi, exact)
    assert r4 >= r1
    assert r4 >= 0.9, f"multi-probe LSH recall {r4:.2f} < 0.9 (single {r1:.2f})"


def test_multiprobe_ivf_recall(spark):
    df = _clustered_corpus(spark)
    qids = [20, 60, 100, 140, 200, 260, 300]
    exact = sim_ops.brute_force_topk(df, qids, k=5).collect()
    single = sim_ops.ann_topk_ivf(df, qids, k=5, n_probes=1).collect()
    multi = sim_ops.ann_topk_ivf(df, qids, k=5, n_probes=4).collect()
    r1, r4 = _recall(single, exact), _recall(multi, exact)
    assert r4 >= r1
    assert r4 >= 0.9, f"multi-probe IVF recall {r4:.2f} < 0.9 (single {r1:.2f})"


def test_near_dup_pairs_finds_planted_dups(spark):
    df = _clustered_corpus(spark, n_clusters=4, per_cluster=10)
    # plant two exact near-dups of vector 0
    base = {r["vec_id"]: r["embedding"] for r in df.collect()}[0]
    extra = spark.createDataFrame(
        [(1000, [x * 1.001 for x in base]), (1001, [x * 0.999 for x in base])],
        "vec_id bigint, embedding array<float>",
    )
    out = sim_ops.near_dup_pairs(df.union(extra), threshold=0.999)
    got = {(r["vec_a"], r["vec_b"]) for r in out.collect()}
    assert {(0, 1000), (0, 1001), (1000, 1001)} <= got


def test_top_pairs_guard(spark):
    import pytest

    df = _clustered_corpus(spark, n_clusters=2, per_cluster=5)
    sim_ops.top_pairs(df, top_k=3)  # small input: fine
    old = sim_ops.TOP_PAIRS_MAX_ROWS
    sim_ops.TOP_PAIRS_MAX_ROWS = 5
    try:
        with pytest.raises(ValueError, match="near_dup_pairs"):
            sim_ops.top_pairs(df, top_k=3)
        sim_ops.top_pairs(df, top_k=3, allow_large=True)  # escape hatch
    finally:
        sim_ops.TOP_PAIRS_MAX_ROWS = old


def test_ivf_train_beats_seed_centroids_on_adversarial_layout(spark):
    """Sequential-id cluster layout puts every seed centroid inside ONE
    cluster (adversarial for first-N-by-id seeding). Spherical k-means must
    (a) be deterministic, (b) raise mean assignment cosine, and (c) restore
    multi-probe recall."""
    import numpy as np

    import pyspark.sql.functions as F

    rng = np.random.default_rng(11)
    n_clusters, per_cluster, dim = 8, 40, 16
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for vid in range(n_clusters * per_cluster):
        c = vid // per_cluster  # BLOCK layout: ids 0..39 all cluster 0
        v = centers[c] + 0.15 * rng.normal(size=dim)
        rows.append((vid, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>").cache()

    trained = sim_ops.ivf_train(df, n_centroids=8, iters=4).cache()
    # determinism
    t2 = sim_ops.ivf_train(df, n_centroids=8, iters=4)
    a = sorted((r["centroid_id"], tuple(round(x, 9) for x in r["cv"])) for r in trained.collect())
    b = sorted((r["centroid_id"], tuple(round(x, 9) for x in r["cv"])) for r in t2.collect())
    assert a == b

    def mean_cos(cents):
        out = sim_ops.ivf_assign(df, n_centroids=8, centroids=cents)
        return out.agg(F.avg("centroid_cos")).first()[0]

    seeded_cos = mean_cos(sim_ops.seed_centroids(df, 8))
    trained_cos = mean_cos(trained)
    assert trained_cos > seeded_cos + 0.05, (seeded_cos, trained_cos)

    qids = [10, 50, 90, 170, 250, 310]
    exact = sim_ops.brute_force_topk(df, qids, k=5).collect()
    seeded = sim_ops.ann_topk_ivf(df, qids, k=5, n_probes=2).collect()
    learned = sim_ops.ann_topk_ivf(
        df, qids, k=5, n_probes=2, centroids=trained
    ).collect()
    r_seed, r_learn = _recall(seeded, exact), _recall(learned, exact)
    assert r_learn >= r_seed
    assert r_learn >= 0.9, f"learned-centroid recall {r_learn:.2f} (seed {r_seed:.2f})"
    df.unpersist()


def test_ivf_train_truncates_lineage_and_supports_sampling(spark):
    """The 100TB contract for ivf_train: (a) the returned centroids are a
    LocalRelation — downstream actions (ivf_assign / ann_topk_ivf) must NOT
    replay the Lloyd's iterations, so the corpus is scanned once per action,
    not once per iteration per action; (b) sample_mod trains on the
    deterministic xxhash64 sample and stays reproducible; (c) sample_mod=1
    (or None) is the exact full-corpus path."""
    df = _clustered_corpus(spark, n_clusters=8, per_cluster=30)

    trained = sim_ops.ivf_train(df, n_centroids=8, iters=2)
    plan = trained._jdf.queryExecution().optimizedPlan().toString()
    # a driver-local leaf (LogicalRDD from createDataFrame / LocalRelation),
    # with no Lloyd's join lineage left to replay on downstream actions
    assert "LogicalRDD" in plan or "LocalRelation" in plan, plan
    assert "Join" not in plan, plan

    def key(frame):
        return sorted(
            (r["centroid_id"], tuple(round(x, 12) for x in r["cv"]))
            for r in frame.collect()
        )

    # sample_mod=1 keeps every row -> byte-equal to the default path
    assert key(sim_ops.ivf_train(df, n_centroids=8, iters=2, sample_mod=1)) == key(
        trained
    )

    # sampled training: deterministic, full cell count, unit-norm output
    s1 = sim_ops.ivf_train(df, n_centroids=8, iters=2, sample_mod=3)
    s2 = sim_ops.ivf_train(df, n_centroids=8, iters=2, sample_mod=3)
    assert key(s1) == key(s2)
    rows = s1.collect()
    assert len(rows) == 8
    for r in rows:
        norm = sum(x * x for x in r["cv"]) ** 0.5
        assert abs(norm - 1.0) < 1e-9

    # sampled centroids still assign every corpus vector (assign stage
    # unchanged) and remain usable for ANN
    assigned = sim_ops.ivf_assign(df, n_centroids=8, centroids=s1)
    assert assigned.count() == df.count()
