"""Fan-out replay: one decoded scan → N typed tables + quarantine,
atomically committed per batch.

Reference analogs being re-expressed Spark-first:

- one extraction pass feeding several typed tables
  (``PerBlockRecords``, mod.rs:305-314; per-table publish mod.rs:501-574;
  six named sinks streampublisher.rs:29-76) — here ONE
  ``decode_change_events`` scan is projected three ways and committed under
  one shared manifest (sources/multitable.py), closing the reference's
  crash-between-publishes inconsistency window;
- the dead-letter topic for rows that will never pass retry
  (iac/terraform/dataflow.tf:1-31, pubsub.tf): ``on_error='quarantine'``
  routes field-attributed bad rows (transformation/err.rs:1-31 error shape)
  to the ``quarantine`` table instead of wedging the partition on a poison
  row, while ``on_error='fail'`` keeps the reference's fail-the-batch
  semantics.

Fan-out tables:

- ``source_code``   — converged file state, key (repo, path), LWW
  (identical to the single-table replay output);
- ``file_versions`` — per-version history, key (repo, path, commit):
  at-least-once redeliveries of the same version collapse (dedup), but
  every distinct version survives — the raw append+dedupe table the
  reference converges nightly (daily_dedupe_mainnet.py:65-81);
- ``quarantine``    — dead-letter rows keyed by (partition_id, offset) with
  the field-attributed ``decode_error``.

Scale shape per batch: one parquet scan with pushed-down range predicates,
one Arrow decode stage, then three INDEPENDENT narrow projections + salted
LWW shuffles (each shuffles only its own key set; the quarantine projection
carries no content payload). Writes stay O(batch) via merge-on-read deltas.
"""

from __future__ import annotations

import time
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from sonic_etl_spark.functions.codec import decode_change_events
from sonic_etl_spark.operators.merge import (
    KEY_COLS,
    ORDER_COLS,
    SOURCE_CODE_FIELDS,
    observe_decode_errors,
    reduce_batch,
    salted_lww,
)
from sonic_etl_spark.plans.planner import filter_to_manifests, log_heads, plan_batches
from sonic_etl_spark.sources.multitable import TableSpec, TransactionalTableSet
from sonic_etl_spark.streaming.replay import ReplayResult

FILE_VERSION_FIELDS: list[tuple[str, str]] = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content_sha256", "string"),
    ("size_bytes", "bigint"),
    ("op", "string"),
    ("ts", "timestamp"),
    ("last_offset", "bigint"),
    ("last_partition_id", "int"),
]

QUARANTINE_FIELDS: list[tuple[str, str]] = [
    ("partition_id", "int"),
    ("offset", "bigint"),
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("decode_error", "string"),
    ("ts", "timestamp"),
    # dead-letter lifecycle: op='upsert' when quarantined, op='delete'
    # tombstone when a retry recovers the row; attempt orders them (0 =
    # original, retry tag >= 1 wins the LWW)
    ("op", "string"),
    ("attempt", "int"),
]

FANOUT_SPECS: dict[str, TableSpec] = {
    "source_code": TableSpec(
        fields=SOURCE_CODE_FIELDS, key_cols=KEY_COLS, order_cols=ORDER_COLS
    ),
    "file_versions": TableSpec(
        fields=FILE_VERSION_FIELDS,
        key_cols=["repo", "path", "commit"],
        order_cols=["last_offset", "last_partition_id"],
        # bucket by (repo, path) so version history co-locates with state
        bucket_cols=["repo", "path"],
        # zone maps on the offset: downstream tails read_changes with an
        # offset range and skip non-overlapping files at plan time (the
        # per-batch stats agg measured at ~2% of merge cost, BENCH.md)
        stats_cols=["last_offset"],
    ),
    "quarantine": TableSpec(
        fields=QUARANTINE_FIELDS,
        key_cols=["partition_id", "offset"],
        order_cols=["attempt"],
    ),
}


def project_file_versions(typed: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Decoded batch → one row per (repo, path, commit) version."""
    projected = typed.select(
        "repo",
        "path",
        "commit",
        "lang",
        "content_sha256",
        "size_bytes",
        "op",
        "ts",
        F.col("offset").alias("last_offset"),
        F.col("partition_id").alias("last_partition_id"),
    )
    return salted_lww(
        projected,
        ["repo", "path", "commit"],
        ["last_offset", "last_partition_id"],
        salt_col="last_offset",
        salt_buckets=salt_buckets,
    )


def project_quarantine(typed: DataFrame) -> DataFrame:
    """Bad rows → dead-letter shape. (partition_id, offset) is unique per
    event, so no reduction is needed beyond the projection."""
    return typed.filter(F.col("decode_error").isNotNull()).select(
        "partition_id",
        "offset",
        "repo",
        "path",
        "commit",
        "decode_error",
        "ts",
        F.lit("upsert").alias("op"),
        F.lit(0).alias("attempt"),
    )


def retry_quarantine(
    change_log: DataFrame,
    tables: TransactionalTableSet,
    *,
    tag: int = 1,
    salt_buckets: int = 16,
) -> dict:
    """Dead-letter REPLAY: re-decode the currently-quarantined offsets
    against ``change_log`` (after a decoder/catalog fix or an upstream
    payload repair — the reference's analog is re-publishing dead-letter
    messages back to the topic). Rows that now decode cleanly merge into
    ``source_code``/``file_versions`` AND tombstone their quarantine entry
    — all under ONE atomic commit. Rows that still fail stay quarantined.

    Idempotency: the commit is keyed by the ("retry", ``tag``) manifest
    mark; re-running the same tag no-ops. Use a fresh (higher) tag per
    operational retry wave — the tag also wins the quarantine LWW (order
    col ``attempt``), so later recoveries supersede earlier state.

    Scale shape: the quarantine key set is small by assumption (dead
    letters), so it broadcasts into an equi-join against the log — no log
    shuffle; decode and the merge reductions are the standard batch stages.
    """
    snap = tables.latest()
    if snap is None:
        raise FileNotFoundError(f"table set {tables.path} does not exist")
    if ("retry", tag) in tables.committed_marks():
        return {"status": "skipped", "snapshot_id": snap["snapshot_id"]}
    keys = tables.read("quarantine").select("partition_id", "offset")
    cand = change_log.join(F.broadcast(keys), ["partition_id", "offset"])
    typed = decode_change_events(cand)
    clean = typed.filter(F.col("decode_error").isNull())
    tombstones = clean.select(
        "partition_id",
        "offset",
        "repo",
        "path",
        "commit",
        F.lit(None).cast("string").alias("decode_error"),
        "ts",
        F.lit("delete").alias("op"),
        F.lit(tag).alias("attempt"),
    )
    return tables.merge_all(
        {
            "source_code": reduce_batch(clean, salt_buckets=salt_buckets),
            "file_versions": project_file_versions(clean, salt_buckets),
            "quarantine": tombstones,
        },
        [("retry", tag)],
        metrics={"retry_tag": tag},
    )


def stream_fanout(
    spark,
    log_dir: str,
    tables: TransactionalTableSet,
    *,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
    on_error: str = "quarantine",
    salt_buckets: int = 16,
    compact_threshold: int | None = 16,
    available_now: bool = True,
):
    """Structured-Streaming variant of :func:`replay_fanout`: tail the log
    directory, fan each micro-batch out to the three tables under one
    atomic manifest commit (foreachBatch + merge_all). Manifests are the
    per-partition observed spans (see streaming.stream.observed_manifests)
    — a restarted query that redelivers a processed batch no-ops."""
    from sonic_etl_spark.streaming.stream import CHANGE_LOG_DDL, observed_manifests

    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"on_error must be 'fail' or 'quarantine', got {on_error!r}")
    tables.create(FANOUT_SPECS)
    stream = (
        spark.readStream.schema(CHANGE_LOG_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(log_dir)
    )

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        manifests = observed_manifests(batch)
        if not manifests:
            return
        typed = decode_change_events(batch)
        check = None
        if on_error == "fail":
            typed, check = observe_decode_errors(typed)
            clean = typed
            quarantined = typed.sparkSession.createDataFrame(
                [], ", ".join(f"{n} {t}" for n, t in QUARANTINE_FIELDS)
            )
        else:
            clean = typed.filter(F.col("decode_error").isNull())
            quarantined = project_quarantine(typed)
        status = tables.merge_all(
            {
                "source_code": reduce_batch(clean, salt_buckets=salt_buckets),
                "file_versions": project_file_versions(clean, salt_buckets),
                "quarantine": quarantined,
            },
            manifests,
            metrics={"stream_batch_id": batch_id,
                     "manifest": [list(m) for m in manifests]},
            pre_commit_check=check,
        )
        if status["status"] == "committed" and compact_threshold is not None:
            tables.compact(max_files_per_bucket=compact_threshold)

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def replay_fanout(
    change_log: DataFrame,
    tables: TransactionalTableSet,
    *,
    chunk_size: int = 100_000,
    max_batches: int | None = None,
    on_error: str = "fail",
    salt_buckets: int = 16,
    stop_requested: Callable[[], bool] | None = None,
    crash_after_batches: int | None = None,
    compact_threshold: int | None = 16,
    expire_keep: int | None = None,
    monitor=None,
) -> ReplayResult:
    """Replay all uncommitted ranges into the fan-out table set.

    ``on_error``: 'fail' aborts the batch on any decode error (the
    reference's fail-the-batch, err.rs:1-31); 'quarantine' routes bad rows
    to the dead-letter table and applies the clean rows — both under the
    SAME atomic commit, so a poison row neither wedges its partition nor
    escapes the manifest's exactly-once accounting.

    ``expire_keep``: inline retention, as in ``replay()`` — one call per
    committed batch covers every table of the set (shared snapshot log).

    ``monitor``: optional ReplayMonitor — per-batch metrics push + liveness
    refresh, as in ``replay()``.
    """
    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"on_error must be 'fail' or 'quarantine', got {on_error!r}")
    tables.create(FANOUT_SPECS)
    heads = log_heads(change_log)
    batches = plan_batches(heads, tables.committed_ranges(), chunk_size)
    if max_batches is not None:
        batches = batches[:max_batches]

    res = ReplayResult()
    t0 = time.time()
    for i, manifest in enumerate(batches):
        if stop_requested is not None and stop_requested():
            break
        if crash_after_batches is not None and res.batches_applied >= crash_after_batches:
            raise RuntimeError("injected crash (test hook)")
        bt0 = time.time()
        raw = filter_to_manifests(change_log, manifest)
        typed = decode_change_events(raw)
        check = None
        n_rows = sum(e - s + 1 for (_p, s, e) in manifest)  # dense log
        if on_error == "fail":
            # fail-the-batch without an extra decode pass: the error counts
            # ride the source_code write job and abort the multi-table
            # commit before the pointer flip
            typed, check = observe_decode_errors(typed)
            clean = typed
            # fresh empty frame, NOT typed.limit(0): an empty action over the
            # observed lineage could satisfy the Observation with zero counts
            quarantined = typed.sparkSession.createDataFrame(
                [], ", ".join(f"{n} {t}" for n, t in QUARANTINE_FIELDS)
            )
        else:
            clean = typed.filter(F.col("decode_error").isNull())
            quarantined = project_quarantine(typed)
        updates = {
            "source_code": reduce_batch(clean, salt_buckets=salt_buckets),
            "file_versions": project_file_versions(clean, salt_buckets),
            "quarantine": quarantined,
        }
        bm = {
            "batch_index": i,
            "manifest": [list(m) for m in manifest],
            "rows": n_rows,
        }
        status = tables.merge_all(
            updates, manifest, metrics=bm, pre_commit_check=check
        )
        bm["elapsed_sec"] = round(time.time() - bt0, 3)
        bm["events_per_sec"] = round(n_rows / max(bm["elapsed_sec"], 1e-9), 1)
        bm["status"] = status["status"]
        res.batch_metrics.append(bm)
        if monitor is not None:
            monitor.record_batch(bm)
        if status["status"] == "committed":
            res.batches_applied += 1
            res.rows_seen += n_rows
            if compact_threshold is not None:
                tables.compact(max_files_per_bucket=compact_threshold)
            if expire_keep is not None:
                tables.expire_snapshots(keep_last=expire_keep)
        else:
            res.batches_skipped += 1
    res.elapsed_sec = round(time.time() - t0, 3)
    res.events_per_sec = round(res.rows_seen / max(res.elapsed_sec, 1e-9), 1)
    return res
