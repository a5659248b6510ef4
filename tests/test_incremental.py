"""Incremental curation (operators/incremental.py): the 3-batch arrival
sequence must converge to the SAME per-doc verdicts as one global recompute
of the order-independent rule (hash equality), stay idempotent under
redelivery, heal a crash between the minima and verdict merges, and tail a
source table's CDC-out stream through read_changes."""

import pyspark.sql.functions as F
import pytest

from sonic_etl_spark.operators.incremental import IncrementalCurator, curate_full

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen curious "
    "researchers carefully measure every single token frequency in this "
    "deliberately verbose synthetic paragraph about data pipelines"
)


def _corpus():
    """(doc_id, text, off) rows covering every verdict class; arrival order
    (off) deliberately differs from doc_id order."""
    rows = []
    for i in range(30):
        rows.append((i, f"{BASE} variant {i}", 100 + i))
    # exact dups of doc 3 (same normalized text), arriving LATER
    rows.append((40, f"{BASE} variant 3", 200))
    rows.append((41, f"  {BASE} variant 3 ", 201))  # normalization dup
    # near dup: one token changed → shares most shingles/bands with doc 5
    rows.append((42, f"{BASE} variant 5 extra", 202))
    # quality fails: too short / too punctuated
    rows.append((43, "tiny", 203))
    rows.append((44, "!!! ??? ;;; ::: @@@ ###", 204))
    # a dup whose CANONICAL arrives later in doc_id but earlier in off
    rows.append((45, "completely unique text with many plain words here ok", 50))
    rows.append((46, "completely unique text with many plain words here ok", 60))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, off long")


def _verdict_map(df):
    return {r["doc_id"]: (r["off"], r["kept"], r["reason"]) for r in df.collect()}


@pytest.fixture(scope="module")
def full(spark):
    return _verdict_map(curate_full(_df(spark, _corpus())))


def test_incremental_matches_full_recompute(spark, tmp_path, full):
    rows = sorted(_corpus(), key=lambda r: r[2])  # arrival order
    batches = [rows[:12], rows[12:25], rows[25:]]
    cur = IncrementalCurator(spark, str(tmp_path / "c1"), n_buckets=4).create()
    for b in batches:
        res = cur.apply(_df(spark, b))
        assert res["status"] == "committed"
    got = _verdict_map(cur.verdicts.read())
    assert got == full
    # the corpus exercises every verdict class
    reasons = {v[2] for v in got.values()}
    assert reasons == {"kept", "exact_dup", "near_dup", "quality"}
    # earliest ARRIVAL is canonical, not smallest doc_id
    assert got[45][2] == "kept" and got[46][2] == "exact_dup"


def test_incremental_redelivery_is_noop(spark, tmp_path, full):
    rows = sorted(_corpus(), key=lambda r: r[2])
    b1, b2 = rows[:20], rows[20:]
    cur = IncrementalCurator(spark, str(tmp_path / "c2"), n_buckets=4).create()
    cur.apply(_df(spark, b1))
    cur.apply(_df(spark, b2))
    sid = cur.verdicts.latest()["snapshot_id"]
    res = cur.apply(_df(spark, b2))  # full redelivery
    assert res["merges"] == ("skipped", "skipped", "skipped")
    assert cur.verdicts.latest()["snapshot_id"] == sid
    assert _verdict_map(cur.verdicts.read()) == full


def test_incremental_heals_crash_between_merges(spark, tmp_path, full):
    """Crash after the minima merges but before the verdict merge: the
    redelivered batch sees ITSELF in prior state and must produce identical
    verdicts (the <= self-rank rule)."""
    rows = sorted(_corpus(), key=lambda r: r[2])
    b1, b2 = rows[:20], rows[20:]
    cur = IncrementalCurator(spark, str(tmp_path / "c3"), n_buckets=4).create()
    cur.apply(_df(spark, b1))

    orig = cur.verdicts.merge
    boom = RuntimeError("injected crash before verdict merge")

    def failing(*a, **kw):
        raise boom

    cur.verdicts.merge = failing
    with pytest.raises(RuntimeError, match="injected"):
        cur.apply(_df(spark, b2))
    cur.verdicts.merge = orig
    res = cur.apply(_df(spark, b2))  # redelivery heals
    assert res["merges"] == ("skipped", "skipped", "committed")
    assert _verdict_map(cur.verdicts.read()) == full


def test_sync_tails_source_table_cdc_out(spark, tmp_path, full):
    from sonic_etl_spark.sources.table import TransactionalParquetTable

    src = TransactionalParquetTable(spark, str(tmp_path / "src"), n_buckets=4)
    src.create(
        [("doc_id", "bigint"), ("text", "string"), ("last_offset", "bigint")],
        key_cols=["doc_id"],
        order_cols=["last_offset"],
    )
    rows = sorted(_corpus(), key=lambda r: r[2])
    cur = IncrementalCurator(spark, str(tmp_path / "c4"), n_buckets=4).create()
    for i, lo in enumerate(range(0, len(rows), 13)):
        chunk = rows[lo : lo + 13]
        src.merge(
            spark.createDataFrame(
                chunk, "doc_id long, text string, last_offset long"
            ),
            [(0, i * 1000, i * 1000 + 999)],
        )
        res = cur.sync(src)
        assert res["status"] == "committed"
    assert cur.sync(src)["status"] == "noop"  # frontier caught up
    assert _verdict_map(cur.verdicts.read()) == full


def test_apply_empty_batch_and_all_quality_fail(spark, tmp_path):
    cur = IncrementalCurator(spark, str(tmp_path / "c5"), n_buckets=2).create()
    empty = spark.createDataFrame([], "doc_id long, text string, off long")
    assert cur.apply(empty)["status"] == "no_data"
    bad = _df(spark, [(1, "x", 10), (2, "??!", 11)])
    res = cur.apply(bad)
    assert res["status"] == "committed"
    got = _verdict_map(cur.verdicts.read())
    assert got == {1: (10, False, "quality"), 2: (11, False, "quality")}


def test_incremental_curate_job_cli(spark, tmp_path, full):
    """jobs/incremental_curate_job.py: per-arrival CLI twin of curate_job —
    two invocations over a growing source table converge to the full
    recompute; a third is a frontier noop."""
    from jobs.incremental_curate_job import main
    from sonic_etl_spark.sources.table import TransactionalParquetTable

    src = TransactionalParquetTable(spark, str(tmp_path / "src"), n_buckets=4)
    src.create(
        [("doc_id", "bigint"), ("text", "string"), ("last_offset", "bigint")],
        key_cols=["doc_id"],
        order_cols=["last_offset"],
    )
    rows = sorted(_corpus(), key=lambda r: r[2])
    args = ["--source", str(tmp_path / "src"), "--state", str(tmp_path / "st"),
            "--n-buckets", "4"]
    for i, lo in enumerate(range(0, len(rows), 19)):
        src.merge(
            spark.createDataFrame(
                rows[lo : lo + 19], "doc_id long, text string, last_offset long"
            ),
            [(0, i * 1000, i * 1000 + 999)],
        )
        rep = main(args)
        assert rep["sync"]["status"] == "committed"
    rep = main(args)
    assert rep["sync"]["status"] == "noop"
    got = _verdict_map(
        IncrementalCurator(spark, str(tmp_path / "st"), n_buckets=4)
        .verdicts.read()
    )
    assert got == full
    assert sum(rep["verdict_totals"].values()) == len(rows)


def test_stream_curate_matches_full_and_rebatched_redelivery(spark, tmp_path, full):
    """Structured-Streaming twin (streaming/curate.stream_curate): draining
    the arrival directory converges to the full-recompute verdicts; a
    FRESH-checkpoint redelivery with a different maxFilesPerTrigger (the
    re-batched case) leaves the verdict stream byte-identical — the rule is
    idempotent by value, not just by manifest."""
    import os

    from sonic_etl_spark.streaming.curate import stream_curate

    rows = sorted(_corpus(), key=lambda r: r[2])
    docs_dir = str(tmp_path / "arrivals")
    os.makedirs(docs_dir)
    # producer contract: files written in offset order
    for i, lo in enumerate(range(0, len(rows), 9)):
        _df(spark, rows[lo : lo + 9]).coalesce(1).write.mode("append").parquet(
            docs_dir
        )
    cur = IncrementalCurator(spark, str(tmp_path / "c6"), n_buckets=4).create()
    q = stream_curate(
        spark, docs_dir, cur,
        checkpoint_dir=str(tmp_path / "ck1"), max_files_per_trigger=2,
    )
    q.awaitTermination()
    assert _verdict_map(cur.verdicts.read()) == full

    # fresh checkpoint + different batching → re-delivers everything,
    # re-batched; verdicts and state must not change
    before = _verdict_map(cur.verdicts.read())
    q2 = stream_curate(
        spark, docs_dir, cur,
        checkpoint_dir=str(tmp_path / "ck2"), max_files_per_trigger=5,
    )
    q2.awaitTermination()
    assert _verdict_map(cur.verdicts.read()) == before == full


def test_incremental_ivf_matches_one_shot_assign(spark, tmp_path):
    """IncrementalIvfIndex: 3-batch maintained postings == one-shot
    ivf_assign with the same pinned quantizer; a re-written vector follows
    its latest offset's cell; redelivery no-ops; sync tails a table."""
    import random

    from sonic_etl_spark.operators.incremental import IncrementalIvfIndex
    from sonic_etl_spark.operators.similarity import ivf_assign, seed_centroids

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], 100 + i) for i in range(120)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, off long"
    )
    cents = seed_centroids(emb, 16)
    idx = IncrementalIvfIndex(spark, str(tmp_path / "ivf"), n_buckets=4).create(cents)
    for k in range(3):
        res = idx.apply(emb.where(F.col("vec_id") % 3 == k))
        assert res["status"] == "committed"
    got = {r["vec_id"]: (r["centroid_id"], r["centroid_cos"])
           for r in idx.cells().collect()}
    want = {r["vec_id"]: (r["centroid_id"], r["centroid_cos"])
            for r in ivf_assign(emb, centroids=cents).collect()}
    assert got == want and len(got) == 120

    # redelivery no-op
    assert idx.apply(emb.where(F.col("vec_id") % 3 == 0))["status"] == "skipped"
    # re-written vector (same id, higher offset, different embedding):
    # LWW keeps the LATEST assignment
    upd = spark.createDataFrame(
        [(7, [1.0] + [0.0] * 7, 10_000)], "vec_id long, embedding array<double>, off long"
    )
    idx.apply(upd)
    new_cell = ivf_assign(upd.select("vec_id", "embedding"), centroids=cents).first()
    hit = [r for r in idx.cells().collect() if r["vec_id"] == 7]
    assert len(hit) == 1 and hit[0]["centroid_id"] == new_cell["centroid_id"]


def test_incremental_ivf_sync_frontier(spark, tmp_path):
    from sonic_etl_spark.operators.incremental import IncrementalIvfIndex
    from sonic_etl_spark.operators.similarity import seed_centroids
    from sonic_etl_spark.sources.table import TransactionalParquetTable

    src = TransactionalParquetTable(spark, str(tmp_path / "esrc"), n_buckets=4)
    src.create(
        [("vec_id", "bigint"), ("embedding", "array<double>"),
         ("last_offset", "bigint")],
        key_cols=["vec_id"], order_cols=["last_offset"],
    )
    rows = [(i, [float(i % 5), 1.0, 0.5], i) for i in range(40)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, last_offset long"
    )
    src.merge(df.where("vec_id < 16"), [(0, 0, 15)])
    idx = IncrementalIvfIndex(spark, str(tmp_path / "ivf2"), n_buckets=4).create(
        seed_centroids(src.read(), 8)
    )
    assert idx.sync(src)["status"] == "committed"
    src.merge(df.where("vec_id >= 16"), [(0, 16, 39)])
    assert idx.sync(src)["status"] == "committed"
    assert idx.sync(src)["status"] == "noop"
    assert idx.cells().count() == 40


def test_incremental_random_corpora_and_batchings_converge(spark, tmp_path):
    """Seeded fuzz of the order-independence claim: random corpora (heavy
    exact/near dup rates, random arrival permutations, random batch cuts)
    must make the incremental verdicts equal the global recompute — the
    property the fixed corpus can't fully pin (rank ties, dup chains
    crossing batch cuts, bucket collisions between batches)."""
    import random

    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    for trial in range(3):
        rng = random.Random(100 + trial)
        rows = []
        base_texts = [
            " ".join(rng.choices(words, k=12)) for _ in range(12)
        ]
        offs = rng.sample(range(1000, 9000), 40)
        for i in range(40):
            r = rng.random()
            if r < 0.3:
                text = base_texts[rng.randrange(len(base_texts))]  # exact dup pool
            elif r < 0.5:
                text = base_texts[rng.randrange(len(base_texts))] + " tail"
            elif r < 0.6:
                text = "x"  # quality fail
            else:
                text = " ".join(rng.choices(words, k=12))
            rows.append((i, text, offs[i]))
        rows.sort(key=lambda r: r[2])  # arrival order
        cuts = sorted(rng.sample(range(1, 39), rng.randrange(2, 5)))
        batches, prev = [], 0
        for c in [*cuts, 40]:
            batches.append(rows[prev:c])
            prev = c
        cur = IncrementalCurator(
            spark, str(tmp_path / f"fz{trial}"), n_buckets=4
        ).create()
        for b in batches:
            cur.apply(_df(spark, b))
        got = _verdict_map(cur.verdicts.read())
        want = _verdict_map(curate_full(_df(spark, rows)))
        assert got == want, trial
