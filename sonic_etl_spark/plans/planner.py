"""Batch planner: offset-range manifests over the change log.

Re-expresses the reference coordinator (indexing_coordinator/
publish_ranges.py): poll the log head (S1, :68-83), chunk the new interval
into ≤chunk_size inclusive disjoint ranges (S2, :122-146), and resume from
the last committed position (ST2, :148-203). Here:

- the "head" is ``max(offset)`` per partition of the change-log table — a
  single partial-aggregated scan, no RPC loop;
- manifests are plain tuples ``(partition_id, offset_start, offset_end)``;
- resumption reads the sink's committed-manifest set instead of a Pub/Sub
  resumption topic — the checkpoint *is* the transactional table state, so
  there is no window where the checkpoint and the data disagree.

A batch groups one chunk per partition so every micro-batch touches all log
partitions (Spark parallelizes within the scan); chunk_size plays the role of
the coordinator's 1000-offset work unit.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def chunk_range(start: int, end: int, chunk_size: int = 1000) -> Iterator[tuple[int, int]]:
    """Split inclusive [start, end] into disjoint inclusive chunks ≤chunk_size.

    Same contract as publish_ranges.py:122-146 (not a copy: three lines of
    arithmetic have one shape).
    """
    s = start
    while s <= end:
        e = min(s + chunk_size - 1, end)
        yield (s, e)
        s = e + 1


def log_heads(change_log: DataFrame) -> dict[int, int]:
    """Per-partition max offset — the analog of eth_blockNumber (S1)."""
    rows = change_log.groupBy("partition_id").agg(F.max("offset").alias("head")).collect()
    return {r["partition_id"]: r["head"] for r in rows}


def plan_batches(
    heads: dict[int, int],
    committed: set[tuple[int, int, int]],
    chunk_size: int = 1000,
) -> list[list[tuple[int, int, int]]]:
    """Plan uncommitted (partition, start, end) manifests, grouped into
    micro-batches of one chunk per partition.

    Resumption: for each partition, planning starts after the highest
    committed offset_end (committed ranges are dense by construction; the
    gap audit in operators.audit catches violations, the analog of
    daily_backfill_mainnet.py:47-160).
    """
    per_partition: dict[int, list[tuple[int, int, int]]] = {}
    for pid, head in sorted(heads.items()):
        done_end = max((e for (p, _s, e) in committed if p == pid), default=-1)
        chunks = [(pid, s, e) for (s, e) in chunk_range(done_end + 1, head, chunk_size)]
        if chunks:
            per_partition[pid] = chunks
    n_rounds = max((len(v) for v in per_partition.values()), default=0)
    batches = []
    for i in range(n_rounds):
        batch = [v[i] for v in per_partition.values() if i < len(v)]
        batches.append(batch)
    return batches


def filter_to_manifests(change_log: DataFrame, manifests: list[tuple[int, int, int]]) -> DataFrame:
    """Scan predicate for one micro-batch: OR of per-partition offset ranges.

    Expressed as a disjunction of range predicates so it pushes down to the
    parquet row-group / Iceberg partition level (PushedFilters), instead of a
    driver-side collect-and-loop.
    """
    pred = None
    for pid, s, e in manifests:
        p = (F.col("partition_id") == pid) & F.col("offset").between(s, e)
        pred = p if pred is None else (pred | p)
    if pred is None:
        return change_log.limit(0)
    return change_log.filter(pred)
