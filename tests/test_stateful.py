"""Watermarked windowed aggregation + applyInPandasWithState operator."""

import pyspark.sql.functions as F
import pytest

from sonic_etl_spark.log import synthesize_change_events
from sonic_etl_spark.streaming.stateful import (
    stream_activity_windows,
    stream_repo_progress,
)

N = 3000


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("statelog") / "log")
    synthesize_change_events(spark, N, num_slices=6).write.parquet(d)
    return d


def test_windowed_counts_match_batch(spark, tmp_path, log_dir):
    q = stream_activity_windows(
        spark, log_dir,
        checkpoint_dir=str(tmp_path / "c"),
        queryName="aw_test",
        max_files_per_trigger=2,
    )
    q.awaitTermination()
    got = {
        (r["bucket_epoch"], r["repo"]): (r["n_changes"], r["n_deletes"])
        for r in spark.sql("SELECT * FROM aw_test").collect()
    }
    want = {
        (r["bucket_epoch"], r["repo"]): (r["n_changes"], r["n_deletes"])
        for r in (
            spark.read.parquet(log_dir)
            .groupBy(F.window("ts", "30 minutes").alias("w"), "repo")
            .agg(
                F.count(F.lit(1)).alias("n_changes"),
                F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias(
                    "n_deletes"
                ),
            )
            .select(
                F.unix_timestamp("w.start").alias("bucket_epoch"),
                "repo",
                "n_changes",
                "n_deletes",
            )
            .collect()
        )
    }
    # append mode emits only watermark-closed windows: subset equality, and
    # the synthesized log's time span guarantees most windows closed
    assert got
    assert all(got[k] == want[k] for k in got)
    assert len(got) >= len(want) * 0.5


def test_stateful_progress_accumulates(spark, tmp_path, log_dir):
    q = stream_repo_progress(
        spark, log_dir,
        checkpoint_dir=str(tmp_path / "c2"),
        queryName="rp_test",
        max_files_per_trigger=2,  # several triggers → state must carry over
    )
    q.awaitTermination()
    # update mode: last emission per repo is the final running value
    final = {
        r["repo"]: r
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER "
            "(PARTITION BY repo ORDER BY change_count DESC) rn FROM rp_test) "
            "WHERE rn = 1"
        ).collect()
    }
    want = {
        r["repo"]: r
        for r in (
            spark.read.parquet(log_dir)
            .groupBy("repo")
            .agg(
                F.count(F.lit(1)).alias("change_count"),
                F.max("offset").alias("max_offset"),
                F.countDistinct("path").alias("path_cardinality"),
            )
            .collect()
        )
    }
    assert set(final) == set(want)
    for repo, w in want.items():
        g = final[repo]
        assert g["change_count"] == w["change_count"]
        assert g["max_offset"] == w["max_offset"]
        assert g["path_cardinality"] == w["path_cardinality"]


def test_kmv_sketch_accuracy_and_bounded_state():
    """Pure-function check of the KMV fold: exact below k, ~3% beyond k,
    state bounded at k entries."""
    import pandas as pd

    from sonic_etl_spark.streaming import stateful as st

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    state = FakeState()
    # below k: exact
    pdf = pd.DataFrame({"offset": range(100), "path": [f"p{i}" for i in range(100)]})
    (out,) = st._progress_fn(("r",), [pdf], state)
    assert out["path_cardinality"][0] == 100
    # far beyond k, folded across several triggers: estimate within 10%
    n = 20_000
    for lo in range(100, n, 5000):
        hi = min(lo + 5000, n)
        pdf = pd.DataFrame(
            {"offset": range(lo, hi), "path": [f"p{i}" for i in range(lo, hi)]}
        )
        (out,) = st._progress_fn(("r",), [pdf], state)
    est = out["path_cardinality"][0]
    assert abs(est - n) / n < 0.10, f"KMV estimate {est} vs true {n}"
    assert len(state.get[2]) <= st.PROGRESS_SKETCH_K  # bounded state
    assert out["change_count"][0] == n


def test_session_windows_match_batch_sessionize(spark, tmp_path, log_dir):
    from sonic_etl_spark.operators.temporal import session_stats
    from sonic_etl_spark.streaming.stateful import stream_session_windows

    q = stream_session_windows(
        spark, log_dir,
        checkpoint_dir=str(tmp_path / "c3"),
        queryName="sw_test",
        # log spans ~2.5h: a tight watermark+gap closes most sessions so
        # append mode actually emits them (1h watermark closed only ~27%)
        watermark="10 minutes",
        gap="5 minutes",
        max_files_per_trigger=2,  # sessions must merge across triggers
    )
    q.awaitTermination()
    got = {
        (r["repo"], r["session_start_epoch"]): r["n_changes"]
        for r in spark.sql("SELECT * FROM sw_test").collect()
    }
    want = {
        (r["repo"], r["start_epoch"]): r["n_events"]
        for r in session_stats(
            spark.read.parquet(log_dir), ["repo"], "ts",
            gap_sec=300, order_cols=["offset"],
        )
        .select(
            "repo",
            F.unix_timestamp("start_ts").alias("start_epoch"),
            "n_events",
        )
        .collect()
    }
    # append mode emits only watermark-closed sessions → subset equality;
    # every emitted session must agree with the batch operator exactly
    assert got
    assert all(got[k] == want[k] for k in got)
    assert len(got) >= len(want) * 0.5
