"""Transactional parquet table — Iceberg-shaped sink fallback.

The north rule requires idempotent commits keyed by a (partition,
offset-range) manifest, MERGE INTO upserts, and schema-id-aware evolution.
No Iceberg runtime jar ships in this sandbox, so this module implements the
same *contract* on plain parquet (SURVEY.md §7.0/§7.3 hard part 1):

- **Snapshot log**: every commit writes an immutable ``snap-N.json`` plus an
  atomically-replaced ``_latest.json`` pointer (``os.rename`` is atomic on
  POSIX). A crash between data write and pointer flip leaves only orphan
  files; the batch replays idempotently.
- **Bucket-level copy-on-write**: table data lives in buckets keyed by
  ``hash(repo, path) % n_buckets`` (the merge key, so upserts are co-located
  and hot repos spread across buckets by path). A MERGE rewrites only the
  buckets that received updates; untouched buckets are referenced from the
  parent snapshot — exactly Iceberg's COW granularity, at bucket instead of
  file level.
- **Idempotent commit manifest**: each snapshot carries the cumulative set of
  committed (partition_id, offset_start, offset_end) ranges. ``merge``
  refuses ranges already committed — at-least-once delivery upstream becomes
  exactly-once table state (upgrade over the reference's
  append-then-nightly-MERGE convergence, daily_dedupe_mainnet.py:26-81, and
  its ack-after-publish duplicate window, mod.rs:140-164).
- **Schema evolution by field id**: snapshots record ``{id, name, type}`` per
  column; bucket files remember the schema id they were written under, and
  the reader renames/backfills columns by field id — Iceberg's
  add/rename-safe semantics (reference has only hand-reserved proto field
  numbers, schemas/proto/blocks.proto:144-146).

LWW semantics: the merged state for a key is the row with the maximum
``(offset, partition_id, commit)`` among all events ever applied plus the
current state. max is associative, commutative and idempotent, so replays,
overlapping ranges and duplicate redelivery all converge to byte-identical
state regardless of batching — the formal version of the reference's
natural-key convergence triple (SURVEY.md §0).

At 100 TB: buckets become Iceberg partitions (``bucket(N, repo||path)``),
the snapshot json becomes the Iceberg metadata tree, and the pointer flip
becomes a catalog swap. Nothing in the engine above this module would change.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

LATEST = "_latest.json"
SNAP_DIR = "_snapshots"
DATA_DIR = "data"


def _bucket_expr(n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col("repo"), F.col("path")), F.lit(n_buckets)).cast("int")


class CommitConflict(Exception):
    """Another writer advanced the table between our read and our commit."""


class TransactionalParquetTable:
    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 32):
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(path, SNAP_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, DATA_DIR), exist_ok=True)

    # ------------------------------------------------------------- snapshots
    def _latest_path(self) -> str:
        return os.path.join(self.path, LATEST)

    def latest(self) -> dict | None:
        p = self._latest_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            sid = json.load(f)["snapshot_id"]
        return self.snapshot(sid)

    def snapshot(self, snapshot_id: int) -> dict:
        with open(os.path.join(self.path, SNAP_DIR, f"snap-{snapshot_id}.json")) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        """All snapshots, oldest first — the table's lineage."""
        out = []
        snap = self.latest()
        while snap is not None:
            out.append(snap)
            pid = snap.get("parent_id")
            snap = self.snapshot(pid) if pid is not None else None
        return list(reversed(out))

    def _commit_snapshot(self, snap: dict, expected_parent: int | None) -> None:
        """Write snap json, then atomically flip the pointer (optimistic CC)."""
        cur = self.latest()
        cur_id = cur["snapshot_id"] if cur else None
        if cur_id != expected_parent:
            raise CommitConflict(f"expected parent {expected_parent}, found {cur_id}")
        sp = os.path.join(self.path, SNAP_DIR, f"snap-{snap['snapshot_id']}.json")
        with open(sp, "w") as f:
            json.dump(snap, f)
        tmp = self._latest_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"snapshot_id": snap["snapshot_id"]}, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._latest_path())  # atomic on POSIX

    # ---------------------------------------------------------------- create
    def create(self, fields: list[tuple[str, str]]) -> dict:
        """Create the table with an empty snapshot. fields = [(name, ddl_type)]."""
        if self.latest() is not None:
            return self.latest()
        schema = {
            "schema_id": 0,
            "fields": [
                {"id": i, "name": n, "type": t} for i, (n, t) in enumerate(fields)
            ],
        }
        snap = {
            "snapshot_id": 1,
            "parent_id": None,
            "schemas": [schema],
            "current_schema_id": 0,
            "n_buckets": self.n_buckets,
            "buckets": {},
            "manifests": [],
            "metrics": {},
            "committed_at": time.time(),
        }
        self._commit_snapshot(snap, expected_parent=None)
        return snap

    # ----------------------------------------------------------------- reads
    def _schema_by_id(self, snap: dict, schema_id: int) -> dict:
        for s in snap["schemas"]:
            if s["schema_id"] == schema_id:
                return s
        raise KeyError(f"schema_id {schema_id} not in snapshot {snap['snapshot_id']}")

    def _current_schema(self, snap: dict) -> dict:
        return self._schema_by_id(snap, snap["current_schema_id"])

    def _empty_df(self, snap: dict) -> DataFrame:
        cur = self._current_schema(snap)
        ddl = ", ".join(f"`{f['name']}` {f['type']}" for f in cur["fields"])
        return self.spark.createDataFrame([], ddl)

    def read(self, snap: dict | None = None, include_tombstones: bool = False) -> DataFrame:
        """Current table state, projected to the current schema (field-id aware)."""
        snap = snap or self.latest()
        if snap is None:
            raise FileNotFoundError(f"table {self.path} does not exist")
        df = self._read_buckets(snap, list(snap["buckets"].keys()))
        if not include_tombstones and "op" in df.columns:
            df = df.filter(F.col("op") != F.lit("delete"))
        return df

    def _read_buckets(self, snap: dict, bucket_ids: list[str]) -> DataFrame:
        cur = self._current_schema(snap)
        cur_names = [f["name"] for f in cur["fields"]]
        if not bucket_ids:
            return self._empty_df(snap)
        # group bucket entries by the schema they were written under, rename
        # columns by field id to current names, backfill added columns
        by_schema: dict[int, list[str]] = {}
        for b in bucket_ids:
            ent = snap["buckets"].get(str(b))
            if ent is None:
                continue
            by_schema.setdefault(ent["schema_id"], []).extend(ent["paths"])
        parts = []
        for schema_id, rels in by_schema.items():
            if not rels:
                continue
            raw = self.spark.read.parquet(*[os.path.join(self.path, r) for r in rels])
            written = self._schema_by_id(snap, schema_id)
            name_at_write = {f["id"]: f["name"] for f in written["fields"]}
            cols = []
            for f in cur["fields"]:
                old = name_at_write.get(f["id"])
                if old is not None and old in raw.columns:
                    cols.append(F.col(old).cast(f["type"]).alias(f["name"]))
                else:
                    cols.append(F.lit(None).cast(f["type"]).alias(f["name"]))
            parts.append(raw.select(*cols))
        if not parts:
            return self._empty_df(snap)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.select(*cur_names)

    # ------------------------------------------------------------- manifests
    def committed_ranges(self) -> set[tuple[int, int, int]]:
        snap = self.latest()
        if snap is None:
            return set()
        return {tuple(m) for m in snap["manifests"]}

    def is_committed(self, partition_id: int, start: int, end: int) -> bool:
        return (partition_id, start, end) in self.committed_ranges()

    # ----------------------------------------------------------------- merge
    def merge(
        self,
        updates: DataFrame,
        manifest_entries: list[tuple[int, int, int]],
        key_cols: list[str],
        order_cols: list[str],
        metrics: dict | None = None,
        affected_buckets: list[int] | None = None,
    ) -> dict:
        """MERGE INTO with LWW ordering and an idempotent manifest commit.

        ``updates`` must already be one-row-per-key (in-batch reduced by the
        caller; see operators.merge.reduce_batch). Returns a status dict.
        Skips (no-op) if every manifest entry is already committed — the
        exactly-once guard (ST3 upgrade, SURVEY.md §2.8).

        ``affected_buckets``: the COW bucket ids this batch touches. Pass it
        when the caller can compute it cheaply from the *raw* batch (a
        column-pruned scan of the key columns — see streaming.replay);
        deriving it here would run the full decode→reduce lineage twice
        (persisting the reduced batch instead was measured 5-20× slower than
        recomputing — wide string rows cache terribly).
        """
        t0 = time.time()
        parent = self.latest()
        if parent is None:
            raise FileNotFoundError(f"table {self.path} does not exist; create() first")
        committed = {tuple(m) for m in parent["manifests"]}
        entries = [tuple(e) for e in manifest_entries]
        fresh = [e for e in entries if e not in committed]
        if not fresh:
            return {"status": "skipped", "snapshot_id": parent["snapshot_id"]}
        if len(fresh) != len(entries):
            # partial overlap: re-applying the whole batch is still correct
            # (max-merge is idempotent) but we only record the fresh ranges.
            pass

        # schema-id-aware writer: project updates to the *current* schema,
        # backfilling columns the producer doesn't know yet (north rule:
        # added/renamed columns replayed mid-stream must route correctly).
        cur = self._current_schema(parent)
        cur_names = [f["name"] for f in cur["fields"]]
        # names each field id has ever had, newest schema first — lets a
        # producer still emitting a pre-rename column name route correctly
        historical: dict[int, list[str]] = {}
        for sch in sorted(parent["schemas"], key=lambda s: -s["schema_id"]):
            for f in sch["fields"]:
                historical.setdefault(f["id"], [])
                if f["name"] not in historical[f["id"]]:
                    historical[f["id"]].append(f["name"])
        proj = []
        for f in cur["fields"]:
            src = next((n for n in historical[f["id"]] if n in updates.columns), None)
            if src is not None:
                proj.append(F.col(src).cast(f["type"]).alias(f["name"]))
            else:
                proj.append(F.lit(None).cast(f["type"]).alias(f["name"]))
        updates = updates.select(*proj).withColumn("_bucket", _bucket_expr(self.n_buckets))

        if affected_buckets is not None:
            affected = list(affected_buckets)
        else:
            affected = [
                r["_bucket"] for r in updates.select("_bucket").distinct().collect()
            ]
        old = self._read_buckets(parent, [str(b) for b in affected]).withColumn(
            "_bucket", _bucket_expr(self.n_buckets)
        )
        old = old.filter(F.col("_bucket").isin(affected))

        # LWW: keep the max-order row per key among old state ∪ updates.
        # max_by gets map-side partial aggregation from Catalyst — no
        # row_number/full-sort shuffle (SURVEY.md §2.4 A7 upgrade).
        merged = (
            old.unionByName(updates)
            .groupBy(*key_cols)
            .agg(
                F.max_by(
                    F.struct(*[c for c in cur_names + ["_bucket"] if c not in key_cols]),
                    F.struct(*[F.col(c) for c in order_cols]),
                ).alias("_row")
            )
            .select(*key_cols, "_row.*")
        )

        new_id = parent["snapshot_id"] + 1
        rel = os.path.join(DATA_DIR, f"snap-{new_id}")
        out_dir = os.path.join(self.path, rel)
        (
            merged.withColumn("_pb", F.col("_bucket"))
            .repartition(max(len(affected), 1), F.col("_bucket"))
            .write.partitionBy("_pb")
            .mode("overwrite")
            .parquet(out_dir)
        )

        buckets = dict(parent["buckets"])
        written = 0
        for name in os.listdir(out_dir):
            if not name.startswith("_pb="):
                continue
            b = name.split("=", 1)[1]
            buckets[b] = {
                "paths": [os.path.join(rel, name)],
                "schema_id": parent["current_schema_id"],
            }
            written += 1

        snap = {
            "snapshot_id": new_id,
            "parent_id": parent["snapshot_id"],
            "schemas": parent["schemas"],
            "current_schema_id": parent["current_schema_id"],
            "n_buckets": self.n_buckets,
            "buckets": buckets,
            "manifests": parent["manifests"] + [list(e) for e in fresh],
            "metrics": {**(metrics or {}), "buckets_rewritten": written},
            "committed_at": time.time(),
        }
        # per-commit lineage + throughput (ST2/ST6: checkpoint carries metrics)
        elapsed = time.time() - t0
        snap["metrics"]["apply_sec"] = round(elapsed, 3)
        if snap["metrics"].get("rows"):
            snap["metrics"]["events_per_sec"] = round(snap["metrics"]["rows"] / elapsed, 1)
        self._commit_snapshot(snap, expected_parent=parent["snapshot_id"])
        return {"status": "committed", "snapshot_id": new_id, "buckets_rewritten": written}

    # ------------------------------------------------------------- evolution
    def evolve(
        self,
        add: list[tuple[str, str]] | None = None,
        rename: dict[str, str] | None = None,
    ) -> dict:
        """Schema-only snapshot: add columns and/or rename by field id.

        Existing data files are untouched; the reader maps them to the new
        schema by field id (Iceberg semantics). The reference's analog is
        manual proto field reservation (schemas/proto/blocks.proto:144-146).
        """
        parent = self.latest()
        cur = self._current_schema(parent)
        fields = [dict(f) for f in cur["fields"]]
        for old, new in (rename or {}).items():
            hit = [f for f in fields if f["name"] == old]
            if not hit:
                raise KeyError(f"rename: no column {old!r}")
            hit[0]["name"] = new
        next_id = max(f["id"] for f in fields) + 1 if fields else 0
        for name, typ in add or []:
            if any(f["name"] == name for f in fields):
                raise KeyError(f"add: column {name!r} exists")
            fields.append({"id": next_id, "name": name, "type": typ})
            next_id += 1
        new_schema = {"schema_id": cur["schema_id"] + 1, "fields": fields}
        snap = {
            "snapshot_id": parent["snapshot_id"] + 1,
            "parent_id": parent["snapshot_id"],
            "schemas": parent["schemas"] + [new_schema],
            "current_schema_id": new_schema["schema_id"],
            "n_buckets": self.n_buckets,
            "buckets": parent["buckets"],
            "manifests": parent["manifests"],
            "metrics": {"evolution": {"add": add or [], "rename": rename or {}}},
            "committed_at": time.time(),
        }
        self._commit_snapshot(snap, expected_parent=parent["snapshot_id"])
        return snap
