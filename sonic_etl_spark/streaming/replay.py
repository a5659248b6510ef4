"""Resumable micro-batch replay driver.

The analog of the reference's worker loop (src/sonic_config/mod.rs:54-170):
pull a range, extract+transform every offset, publish, ack — except that here
"ack" is a transactional snapshot commit that atomically records BOTH the new
table state and the (partition, offset-range) manifest, so a crash anywhere
leaves either a fully-applied batch or an untouched table. Resumption
(pick_up_from_previous_run, publish_ranges.py:148-203; ./indexed_blocks/
scan, src/main.rs:187-241) is just: plan ranges not in the committed set.

Graceful shutdown (mod.rs:70-98 SIGTERM flag checked between messages) maps to
``stop_requested()`` checked between micro-batches; state is always resumable
because there is no un-checkpointed progress by construction.

Scale: each micro-batch is one declarative plan — range-predicate scan
(pushed down) → vectorized decode (one pandas UDF, rest codegen) → salted
two-phase LWW shuffle → bucket-partitioned delta append (merge-on-read:
O(batch) writes, read-time LWW, periodic compaction). No driver-side loops
over rows, no collect of data (only per-batch counters).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from sonic_etl_spark.functions.codec import decode_change_events
from sonic_etl_spark.operators.merge import (
    KEY_COLS,
    ORDER_COLS,
    SOURCE_CODE_FIELDS,
    observe_decode_errors,
    reduce_batch,
)
from sonic_etl_spark.plans.planner import filter_to_manifests, log_heads, plan_batches
from sonic_etl_spark.sources.table import TransactionalParquetTable


@dataclass
class ReplayResult:
    batches_applied: int = 0
    batches_skipped: int = 0
    rows_seen: int = 0
    elapsed_sec: float = 0.0
    events_per_sec: float = 0.0
    batch_metrics: list[dict] = field(default_factory=list)


def replay(
    change_log: DataFrame,
    table: TransactionalParquetTable,
    *,
    chunk_size: int = 100_000,
    max_batches: int | None = None,
    validate: bool = True,
    salt_buckets: int = 16,
    stop_requested: Callable[[], bool] | None = None,
    crash_after_batches: int | None = None,
    compact_threshold: int | None = 16,
    expire_keep: int | None = None,
    monitor=None,
) -> ReplayResult:
    """Replay all uncommitted offset ranges of ``change_log`` into ``table``.

    ``monitor``: an optional :class:`~sonic_etl_spark.streaming.monitor.
    ReplayMonitor` — each batch's metrics dict is pushed to its /metrics
    tail and refreshes its /healthz liveness (ST6; ref main.rs:317-355's
    health+metrics servers beside the worker loop).

    ``crash_after_batches`` is a test hook: raise mid-replay to prove
    resumability (the crash/restart pytest required by SURVEY.md §7.1 M2).

    ``compact_threshold``: merge-on-read maintenance — after each committed
    batch, buckets whose delta chain exceeds this many files are folded back
    to one (bounds read amplification during long replays). None disables.

    ``expire_keep``: retention maintenance — after each committed batch,
    keep only the N most recent snapshots (expire_snapshots). A 10^10-event
    replay is ~10^4 commits; without this the snapshot log and superseded
    delta roots grow for the whole run. Resumability is unaffected: the
    LATEST snapshot carries the full committed-manifest set. None disables
    (keep full history — e.g. when downstream incremental readers are
    anchored to old snapshots).
    """
    table.create(SOURCE_CODE_FIELDS, KEY_COLS, ORDER_COLS)
    heads = log_heads(change_log)
    batches = plan_batches(heads, table.committed_ranges(), chunk_size)
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
        if validate:
            # fail-the-batch WITHOUT a second decode pass: the error counts
            # are observed during the merge's own write job, checked after
            # the files land but before the snapshot commit
            typed, check = observe_decode_errors(typed)
        n_rows = sum(e - s + 1 for (_p, s, e) in manifest)  # dense log
        updates = reduce_batch(typed, salt_buckets=salt_buckets)
        bm = {
            "batch_index": i,
            "manifest": [list(m) for m in manifest],
            "rows": n_rows,
        }
        status = table.merge(
            updates, manifest, KEY_COLS, ORDER_COLS, metrics=bm,
            pre_commit_check=check,
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
                table.compact(max_files_per_bucket=compact_threshold)
            if expire_keep is not None:
                table.expire_snapshots(keep_last=expire_keep)
        else:
            res.batches_skipped += 1
    res.elapsed_sec = round(time.time() - t0, 3)
    res.events_per_sec = round(res.rows_seen / max(res.elapsed_sec, 1e-9), 1)
    return res


def repair_gaps(
    change_log: DataFrame,
    table: TransactionalParquetTable,
    *,
    chunk_size: int = 100_000,
    salt_buckets: int = 16,
    validate: bool = True,
    compact_threshold: int | None = 16,
) -> ReplayResult:
    """Backfill offset gaps inside the committed manifest set (ST5 analog of
    the daily backfill DAG, daily_backfill_mainnet.py:102-160).

    The forward planner can't leave gaps by construction, but operational
    reality can (manual manifest surgery, a retired partition re-appearing,
    replaying a pruned table). Each gap run becomes its own micro-batch
    through the normal decode→reduce→merge path; LWW max-merge makes
    re-application of any overlapping rows harmless.

    Mirrors :func:`replay`'s merge-on-read maintenance and metrics: a large
    backfill would otherwise grow unbounded delta chains until the next
    forward replay, and its batch metrics would lack status/elapsed lineage.
    """
    from sonic_etl_spark.operators.audit import manifest_gap_audit
    from sonic_etl_spark.plans.planner import chunk_range

    gaps = manifest_gap_audit(None, table.committed_ranges())
    res = ReplayResult()
    t0 = time.time()
    for pid, lo, hi in gaps:
        for s, e in chunk_range(lo, hi, chunk_size):
            bt0 = time.time()
            manifest = [(pid, s, e)]
            raw = filter_to_manifests(change_log, manifest)
            typed = decode_change_events(raw)
            check = None
            if validate:
                # same fail-the-batch path as replay(): error counts ride
                # the merge's own write job (no second decode pass)
                typed, check = observe_decode_errors(typed)
            n_rows = e - s + 1  # dense log
            updates = reduce_batch(typed, salt_buckets=salt_buckets)
            bm = {"repair": True, "manifest": [list(m) for m in manifest], "rows": n_rows}
            status = table.merge(
                updates, manifest, KEY_COLS, ORDER_COLS, metrics=bm,
                pre_commit_check=check,
            )
            bm["elapsed_sec"] = round(time.time() - bt0, 3)
            bm["events_per_sec"] = round(n_rows / max(bm["elapsed_sec"], 1e-9), 1)
            bm["status"] = status["status"]
            res.batch_metrics.append(bm)
            if status["status"] == "committed":
                res.batches_applied += 1
                res.rows_seen += n_rows
                if compact_threshold is not None:
                    table.compact(max_files_per_bucket=compact_threshold)
            else:
                res.batches_skipped += 1
    res.elapsed_sec = round(time.time() - t0, 3)
    res.events_per_sec = round(res.rows_seen / max(res.elapsed_sec, 1e-9), 1)
    return res
