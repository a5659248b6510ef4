"""Incremental corpus curation over the CDC-out stream: curate newly
arrived documents against persisted signature state in O(new docs), never
O(corpus).

This ties the engine's two halves together — the transactional CDC tables
(sources/table.py) and the training-data operators (operators/dedup.py,
operators/text.py). The reference's analog is the daily batch dedupe DAG
(daily_qc_airflow/daily_dedupe_mainnet.py:26-81), which recomputes over the
whole table every day; here the same decisions are made per arrival batch
against two tiny persisted "minima" tables, so a day's new documents cost a
day's work regardless of corpus size.

## The order-independent curation rule

Rank every document by ``(offset, doc_id)`` — offsets are the change log's
monotone arrival order, so a document's rank is a stable fact. Then:

1. **quality**: below the word floor / above the punct ceiling → dropped
   (reason ``quality``); quality-failing docs occupy NO dedup state.
2. **exact**: among quality survivors sharing a normalized-content sha256
   (operators/text.fingerprint), only the minimum rank is canonical; the
   rest drop with ``exact_dup``.
3. **near**: every exact-canonical emits its MinHash-LSH band buckets
   (operators/dedup.lsh_band_buckets); a doc drops with ``near_dup`` iff
   ANY of its buckets contains an exact-canonical with smaller rank —
   whether or not that occupant was itself near-dup-dropped. Keeping
   near-dropped docs as bucket occupants makes the predicate
   NON-RECURSIVE, hence order-independent.
4. else ``kept``.

Because ranks only grow (arrival order), a decision made when a document
arrives can never be invalidated by later arrivals — verdicts are final
facts, and **the incremental 3-batch result is provably identical to one
global recompute of the same rule** (pytest-asserted by hash, and the
driver gate replays the global rule in DuckDB).

## Scale shape

Per batch: narrow quality/fingerprint maps, one MinHash aggregation over
the batch (output-∝ repartition inside), and TWO bucket-pruned state joins
via ``TransactionalParquetTable.read_for_keys`` — each reads only the
storage buckets the batch's keys hash into ((touched buckets / n_buckets)
of the state, O(batch) with n_buckets ∝ corpus). State updates are three
O(batch) LWW merges; the minima tables keep per-key MINIMUM rank under the
engine's max-by LWW by storing negated rank as the order columns. Nothing
reads O(corpus).

Crash contract: merges are ordered minima-first, verdicts last, each
manifest-idempotent; a crashed batch is simply redelivered (the same
resume-and-redeliver contract as streaming/replay) and every merge either
applies or no-ops.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from sonic_etl_spark.operators import dedup as dedup_ops
from sonic_etl_spark.operators import text as text_ops
from sonic_etl_spark.sources.table import TransactionalParquetTable

_MINIMA_FIELDS_TAIL = [
    ("off", "bigint"),
    ("doc_id", "bigint"),
    ("neg_off", "bigint"),
    ("neg_id", "bigint"),
]


def _rank(off_col: str = "off", id_col: str = "doc_id") -> F.Column:
    return F.struct(F.col(off_col), F.col(id_col))


class IncrementalCurator:
    """Persisted incremental curation state + the per-batch apply step.

    ``path`` holds three transactional tables: ``hash_minima`` (sha256 →
    min rank), ``bucket_minima`` ((band, bucket) → min exact-canonical
    rank) and ``verdicts`` (doc_id → kept/reason — the curated-corpus
    membership fact stream downstream consumers tail).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n_buckets: int = 32,
        min_words: int = 5,
        max_punct_ratio: float = 0.3,
    ):
        self.spark = spark
        self.path = path
        self.min_words = min_words
        self.max_punct_ratio = max_punct_ratio
        self.hash_minima = TransactionalParquetTable(
            spark, os.path.join(path, "hash_minima"), n_buckets
        )
        self.bucket_minima = TransactionalParquetTable(
            spark, os.path.join(path, "bucket_minima"), n_buckets
        )
        self.verdicts = TransactionalParquetTable(
            spark, os.path.join(path, "verdicts"), n_buckets
        )

    def create(self) -> "IncrementalCurator":
        self.hash_minima.create(
            [("fp_sha256", "string"), *_MINIMA_FIELDS_TAIL],
            key_cols=["fp_sha256"],
            order_cols=["neg_off", "neg_id"],
        )
        self.bucket_minima.create(
            [("band", "int"), ("bucket", "string"), *_MINIMA_FIELDS_TAIL],
            key_cols=["band", "bucket"],
            order_cols=["neg_off", "neg_id"],
        )
        self.verdicts.create(
            [
                ("doc_id", "bigint"),
                ("off", "bigint"),
                ("kept", "boolean"),
                ("reason", "string"),
            ],
            key_cols=["doc_id"],
            order_cols=["off"],
        )
        return self

    # ------------------------------------------------------------- per batch
    def apply(self, batch: DataFrame) -> dict:
        """Curate one arrival batch: (doc_id, text, off) rows whose offsets
        are strictly greater than every previously applied batch's (the
        change log's monotone order — :meth:`sync` guarantees it; direct
        callers must too, or ranks stop being stable facts).

        Idempotent per batch via the tables' (0, off_lo, off_hi) manifest
        range — a redelivered batch re-derives identical verdicts (the rule
        only ever compares against SMALLER ranks, and a partially-merged
        redelivery sees its own rows in state, which the min-union makes a
        no-op) and every merge skips or completes.

        Documents are treated as immutable facts keyed by (doc_id, off): if
        a CDC update RE-WRITES a doc_id with new text at a higher offset,
        the verdicts table keeps the latest offset's verdict (its LWW order
        is ``off``) while the minima tables retain BOTH versions' signature
        occupancy (occupancy is append-only — a retracted text's buckets
        are not vacated, the conservative choice for dedup).
        """
        b = batch.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("text").alias("text"),
            F.col("off").cast("long").alias("off"),
        )
        span = b.agg(
            F.min("off").alias("lo"), F.max("off").alias("hi"),
            F.count("*").alias("n"),
        ).first()
        if span["n"] == 0:
            return {"status": "no_data"}
        manifest = [(0, int(span["lo"]), int(span["hi"]))]

        q = text_ops.quality_features(b.select("doc_id", "text"))
        flags = b.join(
            q.select("doc_id", "n_words", "punct_ratio"), "doc_id"
        ).withColumn(
            "q_pass",
            (F.col("n_words") >= self.min_words)
            & (F.col("punct_ratio") <= self.max_punct_ratio),
        )
        qpass = flags.where("q_pass").select("doc_id", "text", "off")
        cand = qpass.join(
            text_ops.fingerprint(qpass).select("doc_id", "fp_sha256"), "doc_id"
        )

        # exact stage: min rank per sha across (persisted state ∪ batch)
        prior_h = self.hash_minima.read_for_keys(
            cand.select("fp_sha256")
        ).select(
            "fp_sha256",
            F.struct(F.col("off"), F.col("doc_id")).alias("_prior_rank"),
        )
        batch_h = cand.groupBy("fp_sha256").agg(
            F.min(_rank()).alias("_batch_min")
        )
        exact = (
            cand.join(batch_h, "fp_sha256")
            .join(prior_h, "fp_sha256", "left")
            .withColumn(
                # <= not <: after a crash between the minima merge and the
                # verdict merge, the redelivered batch sees ITSELF in prior
                # state (prior == own rank) and must still be canonical
                "is_exact_canon",
                (_rank() == F.col("_batch_min"))
                & (
                    F.col("_prior_rank").isNull()
                    | (_rank() <= F.col("_prior_rank"))
                ),
            )
        )
        canon = exact.where("is_exact_canon").select("doc_id", "text", "off")

        # near stage: bucket occupancy among exact canonicals
        bands = dedup_ops.lsh_band_buckets(
            dedup_ops.minhash_signatures(canon)
        ).join(canon.select("doc_id", "off"), "doc_id")
        prior_b = self.bucket_minima.read_for_keys(
            bands.select("band", "bucket")
        ).select(
            "band", "bucket",
            F.struct(F.col("off"), F.col("doc_id")).alias("_prior_rank"),
        )
        batch_b = bands.groupBy("band", "bucket").agg(
            F.min(_rank()).alias("_batch_min")
        )
        near_drop = (
            bands.join(batch_b, ["band", "bucket"])
            .join(prior_b, ["band", "bucket"], "left")
            .withColumn(
                "_dominated",
                (F.col("_batch_min") < _rank())
                | (
                    F.col("_prior_rank").isNotNull()
                    & (F.col("_prior_rank") < _rank())
                ),
            )
            .groupBy("doc_id")
            .agg(F.max("_dominated").alias("near_dup"))
        )

        verdicts = (
            flags.select("doc_id", "off", "q_pass")
            .join(
                exact.select("doc_id", "is_exact_canon"), "doc_id", "left"
            )
            .join(near_drop, "doc_id", "left")
            .select(
                "doc_id",
                "off",
                F.when(~F.col("q_pass"), F.lit("quality"))
                .when(~F.col("is_exact_canon"), F.lit("exact_dup"))
                .when(F.col("near_dup"), F.lit("near_dup"))
                .otherwise(F.lit("kept"))
                .alias("reason"),
            )
            .withColumn("kept", F.col("reason") == "kept")
            .select("doc_id", "off", "kept", "reason")
        )

        # minima first, verdicts last: a crash mid-apply is healed by
        # redelivering the batch (manifest-idempotent merges)
        h_rows = batch_h.select(
            "fp_sha256",
            F.col("_batch_min.off").alias("off"),
            F.col("_batch_min.doc_id").alias("doc_id"),
            (-F.col("_batch_min.off")).alias("neg_off"),
            (-F.col("_batch_min.doc_id")).alias("neg_id"),
        )
        b_rows = batch_b.select(
            "band", "bucket",
            F.col("_batch_min.off").alias("off"),
            F.col("_batch_min.doc_id").alias("doc_id"),
            (-F.col("_batch_min.off")).alias("neg_off"),
            (-F.col("_batch_min.doc_id")).alias("neg_id"),
        )
        r1 = self.hash_minima.merge(h_rows, manifest)
        r2 = self.bucket_minima.merge(b_rows, manifest)
        r3 = self.verdicts.merge(verdicts, manifest)
        return {
            "status": r3["status"],
            "n_docs": int(span["n"]),
            "off_range": (int(span["lo"]), int(span["hi"])),
            "merges": (r1["status"], r2["status"], r3["status"]),
        }

    # ------------------------------------------------------------ CDC tail
    def _frontier_path(self) -> str:
        return os.path.join(self.path, "_src_frontier.json")

    def sync(
        self,
        src: TransactionalParquetTable,
        id_col: str = "doc_id",
        text_col: str = "text",
        offset_col: str = "last_offset",
    ) -> dict:
        """Tail a source table's CDC-out stream: apply the rows appended
        since the last sync (``read_changes`` — O(new data) by file-identity
        diff) as one arrival batch, then advance the persisted frontier.

        Crash between apply and the frontier write → next sync redelivers
        the same delta and every merge no-ops (manifest idempotence). A
        compaction/expiry rewrite on the source raises inside read_changes
        (the documented boundary refusal) rather than replaying history.
        """
        snap = src.latest()
        if snap is None:
            raise FileNotFoundError(f"source table {src.path} does not exist")
        to_id = snap["snapshot_id"]
        last = None
        if os.path.exists(self._frontier_path()):
            with open(self._frontier_path()) as f:
                last = json.load(f)["snapshot_id"]
        if last == to_id:
            return {"status": "noop", "snapshot_id": to_id}
        ch = src.read_changes(from_snapshot_id=last, to_snapshot_id=to_id)
        res = self.apply(
            ch.select(
                F.col(id_col).alias("doc_id"),
                F.col(text_col).alias("text"),
                F.col(offset_col).alias("off"),
            )
        )
        tmp = self._frontier_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshot_id": to_id}, f)
        os.rename(tmp, self._frontier_path())
        return {**res, "snapshot_id": to_id}


class IncrementalIvfIndex:
    """Incrementally-maintained IVF (inverted-file) ANN index over an
    embedding stream: the similarity-search sibling of
    :class:`IncrementalCurator`.

    State: a ``postings`` table (vec_id → centroid cell + cosine, LWW by
    arrival offset) plus the centroid set PERSISTED at creation — the
    quantizer must be pinned, or per-batch-derived centroids would make
    the incremental index diverge from a full rebuild. Assignment per
    vector is a pure function of (vector, centroids) (broadcast argmax
    cosine, ``similarity.ivf_assign`` — no corpus shuffle), so the index
    after any batch sequence equals ``ivf_assign`` over the corpus
    (pytest + driver gate ``incremental_ivf``); a re-written vector's cell
    follows the latest offset via LWW, and deletes ride ``op='delete'``
    tombstones like any table. Per batch: O(batch × n_centroids) compute,
    one O(batch) merge. Serving reads (:meth:`cells`) feed the same
    multi-probe search shape as ``ann_topk_ivf``.
    """

    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 32):
        self.spark = spark
        self.path = path
        self.postings = TransactionalParquetTable(
            spark, os.path.join(path, "postings"), n_buckets
        )
        self._cent_path = os.path.join(path, "centroids")

    def create(self, centroids: DataFrame) -> "IncrementalIvfIndex":
        """``centroids``: (centroid_id, cv) — e.g. ``seed_centroids`` or
        ``ivf_train`` output over a bootstrap corpus. Written once;
        subsequent create() calls keep the existing quantizer (retraining
        is a REBUILD: new index dir, replay the stream)."""
        if not os.path.exists(os.path.join(self._cent_path, "_SUCCESS")):
            centroids.write.mode("overwrite").parquet(self._cent_path)
        self.postings.create(
            [
                ("vec_id", "bigint"),
                ("off", "bigint"),
                ("centroid_id", "bigint"),
                ("centroid_cos", "double"),
            ],
            key_cols=["vec_id"],
            order_cols=["off"],
        )
        return self

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(self._cent_path)

    def apply(self, batch: DataFrame) -> dict:
        """Assign one arrival batch of (vec_id, embedding, off) rows to
        cells and merge into postings (manifest-idempotent, same monotone
        offset contract as IncrementalCurator.apply)."""
        from sonic_etl_spark.operators import similarity as sim_ops

        b = batch.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("embedding"),
            F.col("off").cast("long").alias("off"),
        )
        span = b.agg(
            F.min("off").alias("lo"), F.max("off").alias("hi"),
            F.count("*").alias("n"),
        ).first()
        if span["n"] == 0:
            return {"status": "no_data"}
        assign = sim_ops.ivf_assign(
            b.select("vec_id", "embedding"), centroids=self.centroids()
        )
        rows = assign.join(b.select("vec_id", "off"), "vec_id").select(
            "vec_id", "off",
            F.col("centroid_id").cast("long").alias("centroid_id"),
            "centroid_cos",
        )
        res = self.postings.merge(
            rows, [(0, int(span["lo"]), int(span["hi"]))]
        )
        return {"status": res["status"], "n_vectors": int(span["n"])}

    def sync(
        self,
        src: TransactionalParquetTable,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        offset_col: str = "last_offset",
    ) -> dict:
        """Tail a source table's CDC-out stream (same frontier/redelivery
        contract as IncrementalCurator.sync)."""
        snap = src.latest()
        if snap is None:
            raise FileNotFoundError(f"source table {src.path} does not exist")
        to_id = snap["snapshot_id"]
        fp = os.path.join(self.path, "_src_frontier.json")
        last = None
        if os.path.exists(fp):
            with open(fp) as f:
                last = json.load(f)["snapshot_id"]
        if last == to_id:
            return {"status": "noop", "snapshot_id": to_id}
        ch = src.read_changes(from_snapshot_id=last, to_snapshot_id=to_id)
        res = self.apply(
            ch.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).alias("embedding"),
                F.col(offset_col).alias("off"),
            )
        )
        tmp = fp + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshot_id": to_id}, f)
        os.rename(tmp, fp)
        return {**res, "snapshot_id": to_id}

    def cells(self) -> DataFrame:
        """Current postings state: (vec_id, centroid_id, centroid_cos) —
        one row per live vector, LWW-resolved."""
        return self.postings.read().select(
            "vec_id", "centroid_id", "centroid_cos"
        )


def curate_full(
    docs: DataFrame, min_words: int = 5, max_punct_ratio: float = 0.3
) -> DataFrame:
    """One-shot global recompute of the incremental rule over (doc_id,
    text, off) — the convergence oracle the incremental path is tested
    against (and the shape the DuckDB driver gate mirrors in SQL)."""
    q = text_ops.quality_features(docs.select("doc_id", "text"))
    flags = docs.join(
        q.select("doc_id", "n_words", "punct_ratio"), "doc_id"
    ).withColumn(
        "q_pass",
        (F.col("n_words") >= min_words)
        & (F.col("punct_ratio") <= max_punct_ratio),
    )
    qpass = flags.where("q_pass").select("doc_id", "text", "off")
    cand = qpass.join(
        text_ops.fingerprint(qpass).select("doc_id", "fp_sha256"), "doc_id"
    )
    sha_min = cand.groupBy("fp_sha256").agg(F.min(_rank()).alias("_min"))
    exact = cand.join(sha_min, "fp_sha256").withColumn(
        "is_exact_canon", _rank() == F.col("_min")
    )
    canon = exact.where("is_exact_canon").select("doc_id", "text", "off")
    bands = dedup_ops.lsh_band_buckets(
        dedup_ops.minhash_signatures(canon)
    ).join(canon.select("doc_id", "off"), "doc_id")
    bkt_min = bands.groupBy("band", "bucket").agg(F.min(_rank()).alias("_min"))
    near_drop = (
        bands.join(bkt_min, ["band", "bucket"])
        .groupBy("doc_id")
        .agg(F.max(F.col("_min") < _rank()).alias("near_dup"))
    )
    return (
        flags.select("doc_id", "off", "q_pass")
        .join(exact.select("doc_id", "is_exact_canon"), "doc_id", "left")
        .join(near_drop, "doc_id", "left")
        .select(
            "doc_id",
            "off",
            F.when(~F.col("q_pass"), F.lit("quality"))
            .when(~F.col("is_exact_canon"), F.lit("exact_dup"))
            .when(F.col("near_dup"), F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("reason"),
        )
        .withColumn("kept", F.col("reason") == "kept")
        .select("doc_id", "off", "kept", "reason")
    )
