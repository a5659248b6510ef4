"""KMV / HLL distinct-count sketch operator tests."""

import pyspark.sql.functions as F

from sonic_etl_spark.operators import sketch as sk


def _keys(spark, n, groups=1):
    return spark.range(n).select(
        (F.col("id") % groups).cast("string").alias("g"),
        F.col("id").cast("string").alias("key"),
    )


def test_kmv_exact_below_k(spark):
    df = _keys(spark, 100)
    out = sk.kmv_distinct(df, ["key"], k=256).collect()
    assert out[0]["est_distinct"] == 100  # < k -> exact by construction


def test_kmv_estimate_accuracy_and_determinism(spark):
    df = _keys(spark, 20_000)
    est = sk.kmv_distinct(df, ["key"], k=256).collect()[0]["est_distinct"]
    # deterministic sketch: the estimate is a fixed number; assert it's
    # within ~2.5 standard errors (SE ~ 1/sqrt(k-2) ~ 6.3%) of truth
    assert abs(est - 20_000) / 20_000 < 0.16, est
    est2 = sk.kmv_distinct(df, ["key"], k=256).collect()[0]["est_distinct"]
    assert est == est2


def test_kmv_salt_invariance(spark):
    """The two-level salted top-k is an execution detail: any salt_buckets
    setting must produce the identical k-smallest set and estimate."""
    df = _keys(spark, 5_000, groups=4)
    a = sorted(map(tuple, sk.kmv_distinct(
        df, ["key"], k=64, group_cols=["g"], salt_buckets=1).collect()))
    b = sorted(map(tuple, sk.kmv_distinct(
        df, ["key"], k=64, group_cols=["g"], salt_buckets=32).collect()))
    assert a == b


def test_kmv_grouped_matches_per_group(spark):
    df = _keys(spark, 3_000, groups=3)
    grouped = {
        r["g"]: r["est_distinct"]
        for r in sk.kmv_distinct(df, ["key"], k=128, group_cols=["g"]).collect()
    }
    for g in ("0", "1", "2"):
        solo = sk.kmv_distinct(
            df.where(F.col("g") == g), ["key"], k=128
        ).collect()[0]["est_distinct"]
        assert grouped[g] == solo


def test_kmv_matches_duckdb_oracle(spark, tmp_path):
    """The portability claim itself: same hashes, same estimator, same
    number out of DuckDB running kmv_distinct_sql on the same parquet."""
    import duckdb

    df = _keys(spark, 8_000, groups=2)
    p = str(tmp_path / "keys.parquet")
    df.write.parquet(p)
    back = spark.read.parquet(p)
    ours = sorted(map(tuple, sk.kmv_distinct(
        back, ["key"], k=64, group_cols=["g"]).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW keys_v AS SELECT * FROM '{p}/*.parquet'")
    theirs = sorted(map(tuple, con.execute(
        sk.kmv_distinct_sql("keys_v", ["key"], k=64, group_cols=["g"])
    ).fetchall()))
    assert ours == theirs


def test_approx_distinct_hll_bounded_error(spark):
    df = _keys(spark, 50_000)
    est = sk.approx_distinct(df, ["key"], rsd=0.05).collect()[0]["approx_distinct"]
    assert abs(est - 50_000) / 50_000 < 0.15, est


def test_kmv_set_overlap_accuracy_and_exact_branch(spark):
    """Union/intersection estimates land near truth in the estimator branch
    and are EXACT when both sketches are exhaustive (< k distinct)."""
    import pyspark.sql.functions as F

    # groups A/B with known overlap: A = 0..5999, B = 3000..8999
    df = spark.range(9000).select(
        F.col("id").cast("string").alias("key"),
        F.when(F.col("id") < 6000, F.lit("A")).otherwise(None).alias("ga"),
        F.when(F.col("id") >= 3000, F.lit("B")).otherwise(None).alias("gb"),
    )
    tall = df.select("key", F.col("ga").alias("g")).where("g IS NOT NULL").union(
        df.select("key", F.col("gb").alias("g")).where("g IS NOT NULL")
    )
    out = sk.kmv_set_overlap(tall, ["key"], group_col="g", k=256).collect()[0]
    assert abs(out["union_est"] - 9000) / 9000 < 0.2, out
    assert abs(out["intersection_est"] - 3000) / 3000 < 0.35, out
    assert 0.15 < out["jaccard_est"] < 0.55

    # exhaustive branch: tiny groups -> exact answers
    small = tall.where(F.col("key").cast("long") % 100 == 0)  # 90 keys
    o2 = sk.kmv_set_overlap(small, ["key"], group_col="g", k=256).collect()[0]
    assert o2["union_est"] == 90
    assert o2["intersection_est"] == 30  # 3000..5900 step 100
