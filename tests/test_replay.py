"""End-to-end convergence tests (SURVEY.md §5 test plan, item 2): replay with
duplicates, out-of-order application, overlapping ranges and crash/restart
must all converge to the same byte-identical table state."""

import pyspark.sql.functions as F
import pytest

from sonic_etl_spark.functions import decode_change_events
from sonic_etl_spark.log import synthesize_change_events
from sonic_etl_spark.operators import reduce_batch
from sonic_etl_spark.sources import TransactionalParquetTable
from sonic_etl_spark.streaming import replay

N = 4000


def _state_hash(df):
    cols = sorted(df.columns)
    return (
        df.select(
            F.sha2(F.concat_ws("|", *[F.col(c).cast("string") for c in cols]), 256).alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10)).alias("s"))
        .first()["s"]
    )


@pytest.fixture(scope="module")
def log_df(spark):
    df = synthesize_change_events(spark, N).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def oracle_hash(log_df):
    """One-shot LWW over the whole log — no batching, no table, no manifests."""
    direct = reduce_batch(decode_change_events(log_df)).filter("op != 'delete'")
    return _state_hash(direct)


def test_replay_converges_to_oracle(spark, tmp_path, log_df, oracle_hash):
    tab = TransactionalParquetTable(spark, str(tmp_path / "t"), n_buckets=8)
    res = replay(log_df, tab, chunk_size=200)
    assert res.batches_applied > 1 and res.rows_seen == N
    assert _state_hash(tab.read()) == oracle_hash


def test_batch_size_invariance(spark, tmp_path, log_df, oracle_hash):
    tab = TransactionalParquetTable(spark, str(tmp_path / "t2"), n_buckets=8)
    replay(log_df, tab, chunk_size=137)  # awkward batching
    assert _state_hash(tab.read()) == oracle_hash


def test_crash_restart_resumes_exactly_once(spark, tmp_path, log_df, oracle_hash):
    tab = TransactionalParquetTable(spark, str(tmp_path / "t3"), n_buckets=8)
    with pytest.raises(RuntimeError, match="injected crash"):
        replay(log_df, tab, chunk_size=200, crash_after_batches=2)
    committed_mid = len(tab.committed_ranges())
    assert committed_mid > 0
    res = replay(log_df, tab, chunk_size=200)  # resume
    assert res.batches_applied > 0
    assert _state_hash(tab.read()) == oracle_hash


def test_replay_is_idempotent(spark, tmp_path, log_df, oracle_hash):
    tab = TransactionalParquetTable(spark, str(tmp_path / "t4"), n_buckets=8)
    replay(log_df, tab, chunk_size=500)
    sid = tab.latest()["snapshot_id"]
    res = replay(log_df, tab, chunk_size=500)
    assert res.batches_applied == 0
    assert tab.latest()["snapshot_id"] == sid
    assert _state_hash(tab.read()) == oracle_hash


def test_checkpoint_carries_lineage_and_throughput(spark, tmp_path, log_df):
    tab = TransactionalParquetTable(spark, str(tmp_path / "t5"), n_buckets=8)
    replay(log_df, tab, chunk_size=2000)
    snaps = tab.history()
    merges = [s for s in snaps if s["metrics"].get("rows")]
    assert merges, "merge snapshots must carry metrics"
    for s in merges:
        assert s["metrics"]["events_per_sec"] > 0
        assert s["metrics"]["manifest"]
        assert s["parent_id"] is not None


def test_graceful_stop_between_batches(spark, tmp_path, log_df, oracle_hash):
    tab = TransactionalParquetTable(spark, str(tmp_path / "t6"), n_buckets=8)
    calls = iter([False, False, True, True, True, True, True, True, True, True])
    res = replay(log_df, tab, chunk_size=200, stop_requested=lambda: next(calls))
    assert res.batches_applied == 2  # stopped cleanly after 2 batches
    res2 = replay(log_df, tab, chunk_size=200)
    assert _state_hash(tab.read()) == oracle_hash


def test_inline_validation_fails_batch_without_committing(spark, tmp_path):
    """validate=True rides the merge write job (Observation, no second
    decode pass) and still aborts BEFORE the snapshot commit: a poison log
    raises fail-the-batch and the table advances nothing."""
    poisoned = synthesize_change_events(spark, 500, poison_fraction=0.1)
    tab = TransactionalParquetTable(spark, str(tmp_path / "tv"), n_buckets=4)
    with pytest.raises(ValueError, match="decode failed"):
        replay(poisoned, tab, chunk_size=1000, validate=True)
    assert tab.committed_ranges() == set()
    assert tab.read().count() == 0


def test_replay_with_inline_retention_converges_and_resumes(
    spark, tmp_path, log_df, oracle_hash
):
    """expire_keep bounds snapshot-log growth during long replays without
    touching convergence or crash-resume exactly-once (the latest snapshot
    carries the full manifest set)."""
    import os

    tab = TransactionalParquetTable(spark, str(tmp_path / "t7"), n_buckets=8)
    with pytest.raises(RuntimeError, match="injected crash"):
        replay(log_df, tab, chunk_size=200, crash_after_batches=2,
               expire_keep=2, compact_threshold=4)
    replay(log_df, tab, chunk_size=200, expire_keep=2, compact_threshold=4)
    assert _state_hash(tab.read()) == oracle_hash
    # retention actually bit: the snapshot dir holds ~expire_keep entries,
    # not one per commit (3 allows the final compaction snapshot)
    snaps = os.listdir(str(tmp_path / "t7" / "_snapshots"))
    assert len(snaps) <= 3, snaps
    # and a fresh re-replay still no-ops
    res = replay(log_df, tab, chunk_size=200, expire_keep=2)
    assert res.batches_applied == 0
