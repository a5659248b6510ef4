"""Streaming extras: watermarked windowed aggregation + custom stateful
operator (applyInPandasWithState).

Two Structured-Streaming surfaces the replay engine itself doesn't need
(the change log is offset-ordered, so exactly-once comes from manifests, not
watermarks) but that a production tail of the same log would use:

- ``stream_activity_windows`` — per-repo change counts in 30-minute
  event-time windows with a watermark bounding late data (the streaming
  upgrade of the reference's half-hour GCS bucketing, gcs.rs:99-115, and its
  hourly liveness window, mainnet_hourly_block_check.py:33-47).
- ``stream_repo_progress`` — custom stateful operator: per-repo running
  (change_count, max_offset, distinct_path_estimate) maintained with
  ``applyInPandasWithState`` — the analog of the reference worker's
  in-process running counters (event_count, common.rs:346; trace histograms,
  common.rs:618-645) lifted to fault-tolerant keyed state.

Both read the same change-log directory stream as stream.py.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sonic_etl_spark.streaming.stream import CHANGE_LOG_DDL

PROGRESS_OUTPUT_DDL = (
    "repo string, change_count bigint, max_offset bigint, path_cardinality bigint"
)
PROGRESS_STATE_DDL = "change_count bigint, max_offset bigint, path_hashes array<long>"


def _log_stream(spark: SparkSession, log_dir: str, max_files_per_trigger: int):
    return (
        spark.readStream.schema(CHANGE_LOG_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(log_dir)
    )


def stream_activity_windows(
    spark: SparkSession,
    log_dir: str,
    *,
    checkpoint_dir: str,
    queryName: str = "activity_windows",
    watermark: str = "1 hour",
    window: str = "30 minutes",
    max_files_per_trigger: int = 8,
    available_now: bool = True,
) -> StreamingQuery:
    """Windowed per-repo activity counts with late-data watermark.

    Append output mode: a window emits once the watermark passes its end —
    late events inside the watermark are counted, older ones dropped (the
    documented-and-bounded alternative to the reference's "repair at 2am").
    Results land in an in-memory sink table named ``queryName``.
    """
    agg = (
        _log_stream(spark, log_dir, max_files_per_trigger)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "repo")
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_deletes"),
        )
        .select(
            F.unix_timestamp("w.start").alias("bucket_epoch"),
            "repo",
            "n_changes",
            "n_deletes",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _progress_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful update: fold this trigger's rows for one repo into state.

    path_cardinality is exact-distinct over hashed paths kept in state —
    fine for per-repo path counts; at extreme cardinality swap the array for
    a serialized HLL sketch with the identical state schema shape.
    """
    (repo,) = key
    if state.exists:
        change_count, max_offset, path_hashes = state.get
        paths = set(path_hashes)
    else:
        change_count, max_offset, paths = 0, -1, set()
    for pdf in pdfs:
        change_count += len(pdf)
        if len(pdf):
            max_offset = max(max_offset, int(pdf["offset"].max()))
            paths.update(int(h) for h in pd.util.hash_array(
                pdf["path"].to_numpy(dtype=object)).astype("int64"))
    state.update((change_count, max_offset, list(paths)))
    yield pd.DataFrame(
        {
            "repo": [repo],
            "change_count": [change_count],
            "max_offset": [max_offset],
            "path_cardinality": [len(paths)],
        }
    )


def stream_repo_progress(
    spark: SparkSession,
    log_dir: str,
    *,
    checkpoint_dir: str,
    queryName: str = "repo_progress",
    max_files_per_trigger: int = 8,
    available_now: bool = True,
) -> StreamingQuery:
    """Custom stateful operator: running per-repo ingest progress."""
    prog = (
        _log_stream(spark, log_dir, max_files_per_trigger)
        .groupBy("repo")
        .applyInPandasWithState(
            _progress_fn,
            outputStructType=PROGRESS_OUTPUT_DDL,
            stateStructType=PROGRESS_STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        prog.writeStream.outputMode("update")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
