"""Dedup operator unit tests (exact, shingles, Jaccard, MinHash, SimHash)."""

import pyspark.sql.functions as F

from sonic_etl_spark.operators import dedup as dedup_ops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_shingles_short_doc_empty(spark):
    df = _docs(spark, [(1, "one two"), (2, "a b c d")])
    rows = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", dedup_ops.shingles(F.col("text")).alias("sh")
        ).collect()
    }
    assert rows[1] == []
    assert rows[2] == ["a b c", "b c d"]


def test_exact_duplicates_groups(spark):
    df = _docs(spark, [(1, "same text"), (2, "same text"), (3, "other")])
    out = {r["keep_doc_id"]: r for r in dedup_ops.exact_duplicates(df).collect()}
    assert out[1]["n_docs"] == 2
    assert out[3]["n_docs"] == 1


def test_jaccard_identical_is_one(spark):
    df = _docs(
        spark,
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w v")],
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ops.ngram_jaccard_pairs(df).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) not in pairs  # no shared shingles → no candidate pair


def test_minhash_identical_docs_same_signature(spark):
    df = _docs(spark, [(1, "a b c d e f"), (2, "a b c d e f"), (3, "q r s t u v")])
    sig = {r["doc_id"]: r for r in dedup_ops.minhash_signatures(df).collect()}
    for j in range(dedup_ops.MINHASH_K):
        assert sig[1][f"mh{j}"] == sig[2][f"mh{j}"]
    assert any(
        sig[1][f"mh{j}"] != sig[3][f"mh{j}"] for j in range(dedup_ops.MINHASH_K)
    )
    cand = {
        (r["doc_a"], r["doc_b"]) for r in dedup_ops.lsh_candidate_pairs(df).collect()
    }
    assert (1, 2) in cand


def test_simhash_deterministic_and_equal_for_dups(spark):
    df = _docs(spark, [(1, "merge into table"), (2, "merge into table")])
    out = {r["doc_id"]: r["simhash"] for r in dedup_ops.simhash16(df).collect()}
    assert out[1] == out[2]
    assert 0 <= out[1] < (1 << 16)
    # stable across runs (portable md5-based hashing, no RNG)
    out2 = {r["doc_id"]: r["simhash"] for r in dedup_ops.simhash16(df).collect()}
    assert out == out2


def test_jaccard_df_cap_bounds_hot_shingle_blowup(spark):
    """A stop-shingle shared by every doc must not make the self-join
    quadratic: with max_doc_freq it is cut from candidates AND sizes."""
    common = "the quick brown"  # one shingle all docs share
    rows = [(i, f"{common} unique{i} tail{i} end{i}") for i in range(30)]
    df = _docs(spark, rows)
    # uncapped: the shared shingle alone creates C(30,2)=435 candidate pairs
    uncapped = dedup_ops.ngram_jaccard_pairs(df, max_doc_freq=None)
    assert uncapped.count() == 435
    # capped at 10: the hot shingle is dropped; remaining shingles are
    # doc-unique, so NO candidate pairs survive
    capped = dedup_ops.ngram_jaccard_pairs(df, max_doc_freq=10)
    assert capped.count() == 0


def test_jaccard_df_cap_keeps_true_near_dups(spark):
    """Near-identical docs still pair under the cap (their shingles are
    rare); only corpus-wide stop-shingles are cut."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),  # near-dup of 1
    ] + [(i, f"filler{i} words{i} here{i} now{i}") for i in range(3, 20)]
    out = dedup_ops.ngram_jaccard_pairs(_docs(spark, rows), max_doc_freq=10)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.4


def test_duplicate_clusters_components_and_chains(spark):
    """Pairs -> connected components: A~B~C chains collapse to one cluster
    labeled by the smallest member; disjoint components stay separate; a
    long chain (diameter 5) still converges."""
    pairs = spark.createDataFrame(
        # component {1,2,3} (chain), component {10,11}, chain 20..25
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24),
         (24, 25)],
        "vec_a bigint, vec_b bigint",
    )
    got = {
        r["member_id"]: r["cluster_id"]
        for r in dedup_ops.duplicate_clusters(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20, 24: 20, 25: 20,
    }


def test_dedup_keep_canonical_drops_non_representatives(spark):
    docs = _docs(spark, [(i, f"doc {i}") for i in range(6)])
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5)], "vec_a bigint, vec_b bigint"
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_ops.dedup_keep_canonical(
            docs, pairs, id_col="doc_id"
        ).collect()
    )
    # cluster {0,3,5} keeps 0; singletons 1,2,4 pass through
    assert kept == [0, 1, 2, 4]


def test_duplicate_clusters_raises_past_max_iter(spark):
    """A 26-node path graph has diameter 25: at max_iter=20 labels are still
    moving, which must RAISE (silent partial labels under-dedup); warn mode
    returns the partial labels with a RuntimeWarning; a big-enough max_iter
    converges to one component labeled 0."""
    import warnings

    import pytest

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(25)], "vec_a bigint, vec_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_ops.duplicate_clusters(path, max_iter=20)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        partial = dedup_ops.duplicate_clusters(
            path, max_iter=20, on_max_iter="warn"
        ).collect()
    assert any("did not converge" in str(w.message) for w in caught)
    assert len(partial) == 26  # every node labeled, just not minimally
    got = {
        r["member_id"]: r["cluster_id"]
        for r in dedup_ops.duplicate_clusters(path, max_iter=30).collect()
    }
    assert got == {i: 0 for i in range(26)}


def test_duplicate_clusters_rejects_non_numeric_ids(spark):
    """String ids that don't cast to long must raise, not silently become
    NULL edges (which would make dedup_keep_canonical keep everything)."""
    import pytest

    pairs = spark.createDataFrame(
        [("docA", "docB")], "vec_a string, vec_b string"
    )
    with pytest.raises(ValueError, match="non-numeric"):
        dedup_ops.duplicate_clusters(pairs)
    # numeric strings are fine — the cast is exact
    ok = spark.createDataFrame([("1", "2")], "vec_a string, vec_b string")
    got = {
        r["member_id"]: r["cluster_id"]
        for r in dedup_ops.duplicate_clusters(ok).collect()
    }
    assert got == {1: 1, 2: 1}


def test_star_contraction_matches_hashmin_and_handles_deep_chains(spark):
    """algorithm='star' (large-star/small-star contraction) must produce
    exactly the hash-min labels on arbitrary graphs, and converge on a
    diameter-400 path in its O(log^2 n) rounds — where hash-min would need
    max_iter=400."""
    import random

    rng = random.Random(7)
    nodes = list(range(0, 120, 3))
    raw = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    pairs = spark.createDataFrame(raw, "vec_a bigint, vec_b bigint")
    hashmin = {
        (r["member_id"], r["cluster_id"])
        for r in dedup_ops.duplicate_clusters(pairs, max_iter=60).collect()
    }
    star = {
        (r["member_id"], r["cluster_id"])
        for r in dedup_ops.duplicate_clusters(pairs, algorithm="star").collect()
    }
    assert star == hashmin

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(400)], "vec_a bigint, vec_b bigint"
    )
    got = {
        r["member_id"]: r["cluster_id"]
        for r in dedup_ops.duplicate_clusters(path, algorithm="star").collect()
    }
    assert got == {i: 0 for i in range(401)}


def test_star_contraction_rejects_non_numeric_ids(spark):
    import pytest

    pairs = spark.createDataFrame(
        [("docA", "docB")], "vec_a string, vec_b string"
    )
    with pytest.raises(ValueError, match="non-numeric"):
        dedup_ops.duplicate_clusters(pairs, algorithm="star")
