"""Synthesis invariants (SURVEY.md §7.3 hard parts 4 & 5): determinism across
parallelism, zipf skew, faithful duplicate redelivery."""

import pyspark.sql.functions as F

from sonic_etl_spark.log import synthesize_change_events

N = 4000


def _agg_hash(df):
    return (
        df.select(
            F.sha2(
                F.concat_ws("|", *[F.col(c).cast("string") for c in df.columns]), 256
            ).alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10)).alias("s"))
        .first()["s"]
    )


def test_deterministic_across_parallelism(spark):
    a = synthesize_change_events(spark, N, num_slices=2)
    b = synthesize_change_events(spark, N, num_slices=7)
    assert _agg_hash(a) == _agg_hash(b)


def test_offsets_dense_and_monotonic_per_partition(spark):
    ev = synthesize_change_events(spark, N, n_partitions=4)
    per = (
        ev.groupBy("partition_id")
        .agg(
            F.min("offset").alias("lo"),
            F.max("offset").alias("hi"),
            F.count("*").alias("n"),
            F.count_distinct("offset").alias("nd"),
        )
        .collect()
    )
    assert len(per) == 4
    for r in per:
        assert r["lo"] == 0
        assert r["n"] == r["nd"] == r["hi"] + 1  # dense, unique


def test_duplicates_replay_identical_payload(spark):
    ev = synthesize_change_events(spark, N).cache()
    dups = ev.filter("event_id != base_id")
    assert dups.count() > 0
    joined = dups.alias("d").join(
        ev.filter("event_id = base_id").alias("o"),
        F.col("d.base_id") == F.col("o.event_id"),
    )
    mismatched = joined.filter(
        (F.col("d.repo") != F.col("o.repo"))
        | (F.col("d.path") != F.col("o.path"))
        | (F.col("d.commit") != F.col("o.commit"))
        | (F.col("d.content_raw") != F.col("o.content_raw"))
    )
    assert mismatched.count() == 0
    ev.unpersist()


def test_zipf_skew_present(spark):
    ev = synthesize_change_events(spark, N)
    top = (
        ev.groupBy("repo").count().orderBy(F.desc("count")).limit(1).first()["count"]
    )
    assert top > N * 0.08  # hot repo carries >8% of traffic
