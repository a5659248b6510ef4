"""Auxiliary sinks: time-bucketed JSONL export (S10 analog).

The reference's GCS sink buckets output files into ``YYYY-MM-DD/H/{00|30}/``
directories by record timestamp (src/output/gcs.rs:99-115), giving
time-pruned consumption downstream. Spark-first restatement: a partitioned
write on derived (date, half-hour) columns — partition pruning then serves
the same time-window reads the reference's directory layout served, and the
writer is one distributed job instead of a per-batch upload loop (the
infinite-retry upload loop, gcs.rs:127-156, becomes Spark task retries).

JSONL-per-fixture is also the reference's golden format
(save_range, mod.rs:577-616); ``write_jsonl_fixture`` mirrors that for test
goldens.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_time_bucketed_jsonl(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    max_records_per_file: int = 500_000,
) -> None:
    """Write df as JSONL partitioned by (date, half-hour bucket) of ts_col."""
    bucketed = df.withColumn("_d", F.date_format(F.col(ts_col), "yyyy-MM-dd")).withColumn(
        "_hh",
        F.concat(
            F.date_format(F.col(ts_col), "HH"),
            F.when(F.minute(F.col(ts_col)) < 30, F.lit("-00")).otherwise(F.lit("-30")),
        ),
    )
    (
        bucketed.write.partitionBy("_d", "_hh")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .mode("overwrite")
        .json(path)
    )


def read_time_bucketed_jsonl(spark, path: str) -> DataFrame:
    """Read back a bucketed export; partition columns restored as strings."""
    return spark.read.json(path)


def write_jsonl_fixture(df: DataFrame, path: str) -> None:
    """Single-file JSONL golden (deterministic order by all columns)."""
    df.orderBy(*df.columns).coalesce(1).write.mode("overwrite").json(path)


def write_json_record_files(
    df: DataFrame, path: str, name_cols: list[str], max_rows: int = 10_000
) -> int:
    """One ``.json`` file per record (S13, src/output/json.rs:72 — the
    reference's single-record fixture format, file named by key fields).

    Fixture-scoped BY DESIGN: record-per-file is an anti-pattern for data
    at scale (small-files problem), so this guards at ``max_rows`` and
    iterates driver-side (toLocalIterator — one partition in memory at a
    time). Returns the number of files written.
    """
    import json as _json
    import os

    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"write_json_record_files is a fixture sink (one file/record); "
            f"{n} rows > max_rows={max_rows}. Use a JSONL/parquet sink."
        )
    os.makedirs(path, exist_ok=True)
    written = 0
    for row in df.toLocalIterator():
        d = row.asDict(recursive=True)
        stem = "_".join(str(d[c]) for c in name_cols)
        with open(os.path.join(path, f"{stem}.json"), "w") as f:
            _json.dump(d, f, sort_keys=True, default=str)
        written += 1
    return written


# --------------------------------------------------------------------------
# Abstract batch-sink interface (S11-S14): the reference selects one of six
# publisher implementations behind a single trait (src/output/publish.rs:
# 14-26 — Pub/Sub, GCS, JSONL, JSON, Kafka, RabbitMQ×2). The engine's analog
# is one ``publish_batch(updates, manifest_entries, metrics)`` contract with
# concrete sinks below; the streaming driver (streaming/stream.py) takes any
# of them. Exactly-once is the SINK's duty in both designs: the table sink
# uses the snapshot manifest guard, the file sink uses deterministic
# manifest-named directories (gcs.rs's file-per-offset-range naming).


class TableSink:
    """Warehouse sink: transactional MERGE with the idempotent manifest
    guard (the Dataflow→BQ loader upgrade, S16)."""

    def __init__(self, table, key_cols=None, order_cols=None,
                 compact_threshold: int | None = 16):
        self.table = table
        self.key_cols = key_cols
        self.order_cols = order_cols
        self.compact_threshold = compact_threshold

    def publish_batch(self, updates: DataFrame, manifest_entries, metrics=None) -> dict:
        status = self.table.merge(
            updates, manifest_entries, self.key_cols, self.order_cols, metrics=metrics
        )
        if status["status"] == "committed" and self.compact_threshold is not None:
            self.table.compact(max_files_per_bucket=self.compact_threshold)
        return status


class JsonlChunkSink:
    """File-stream sink: chunked JSONL per batch, idempotent by OFFSET SPAN.

    The Kafka-less stand-in proving the sink abstraction: each batch writes
    to a directory DETERMINISTICALLY NAMED by its manifest entries (the
    reference's `{name}_{i}.jsonl`-per-offset-range naming, gcs.rs:99-115).
    ``chunk_records`` mirrors the Pub/Sub 900-message chunking
    (google_pubsub.rs:122) via maxRecordsPerFile.

    Exactly-once holds across RE-BATCHED redelivery, not just identical
    redelivery: a ``_published_spans.json`` ledger records every committed
    (partition, lo, hi) span; an incoming manifest is reduced to its
    UNCOVERED remainder (interval subtraction), rows are filtered to those
    spans via (last_partition_id, last_offset), and the ledger is advanced
    atomically (tmp + rename) only after the files land. A restart with a
    fresh checkpoint and a different ``max_files_per_trigger`` therefore
    re-publishes nothing that already reached the directory, regardless of
    how the offsets were re-chunked.
    """

    LEDGER = "_published_spans.json"

    def __init__(self, path: str, chunk_records: int = 900):
        import os

        self.path = path
        self.chunk_records = chunk_records
        os.makedirs(path, exist_ok=True)

    @staticmethod
    def _batch_dir(manifest_entries) -> str:
        return "batch_" + "_".join(
            f"p{p}-{s}-{e}" for p, s, e in sorted(tuple(m) for m in manifest_entries)
        )

    # ---------------------------------------------------------- span ledger
    def _ledger_path(self) -> str:
        import os

        return os.path.join(self.path, self.LEDGER)

    def _read_ledger(self) -> list[tuple[int, int, int]]:
        import json
        import os

        p = self._ledger_path()
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [tuple(x) for x in json.load(f)]

    def _write_ledger(self, spans: list[tuple[int, int, int]]) -> None:
        import json
        import os

        tmp = self._ledger_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted([list(s) for s in spans]), f)
        os.replace(tmp, self._ledger_path())  # atomic on POSIX

    @staticmethod
    def _subtract_covered(
        entries, covered: list[tuple[int, int, int]]
    ) -> list[tuple[int, int, int]]:
        """Incoming (p, lo, hi) entries minus already-published intervals."""
        by_part: dict[int, list[tuple[int, int]]] = {}
        for p, lo, hi in covered:
            by_part.setdefault(p, []).append((lo, hi))
        out = []
        for p, lo, hi in (tuple(m) for m in entries):
            pieces = [(lo, hi)]
            for clo, chi in sorted(by_part.get(p, [])):
                nxt = []
                for plo, phi in pieces:
                    if chi < plo or clo > phi:  # disjoint
                        nxt.append((plo, phi))
                        continue
                    if plo < clo:
                        nxt.append((plo, clo - 1))
                    if phi > chi:
                        nxt.append((chi + 1, phi))
                pieces = nxt
            out.extend((p, s, e) for s, e in pieces)
        return sorted(out)

    @staticmethod
    def _merge_spans(spans: list[tuple[int, int, int]]) -> list[tuple[int, int, int]]:
        merged: list[tuple[int, int, int]] = []
        for p, lo, hi in sorted(spans):
            if merged and merged[-1][0] == p and lo <= merged[-1][2] + 1:
                lp, llo, lhi = merged[-1]
                merged[-1] = (lp, llo, max(lhi, hi))
            else:
                merged.append((p, lo, hi))
        return merged

    def publish_batch(self, updates: DataFrame, manifest_entries, metrics=None) -> dict:
        import os

        covered = self._read_ledger()
        todo = self._subtract_covered(manifest_entries, covered)
        if not todo:
            return {"status": "skipped", "path": None}
        out = os.path.join(self.path, self._batch_dir(todo))
        # filter rows to the uncovered spans (no-op when nothing was covered)
        if len(todo) != len(list(manifest_entries)) or covered:
            cond = None
            for p, lo, hi in todo:
                c = (
                    (F.col("last_partition_id") == p)
                    & F.col("last_offset").between(lo, hi)
                )
                cond = c if cond is None else (cond | c)
            updates = updates.where(cond)
        (
            updates.write.option("maxRecordsPerFile", str(self.chunk_records))
            .mode("overwrite")
            .json(out)
        )
        # advance the ledger only after the files are fully on disk; a crash
        # in between makes the next delivery rewrite the SAME dir (same
        # uncovered spans -> same name, overwrite mode), still exactly-once
        self._write_ledger(self._merge_spans(covered + todo))
        return {"status": "committed", "path": out}
