"""End-to-end curation CLI (jobs/curate_job.py): corpus → split → packs →
report, deterministic across reruns."""

import json
import os

import pyspark.sql.functions as F


def _run(spark, tmp_path, tag, extra=()):
    from jobs.curate_job import main

    out = str(tmp_path / tag)
    rep = main([
        "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--near-dup-on", "text",
        "--redact-pii",
        "--sample", "en=0.5",
        "--split", "train=0.9,val=0.1",
        "--budget", "256",
        "--n-groups", "8",
        *extra,
    ])
    return out, rep


def test_curate_job_end_to_end(spark, tmp_path):
    out, rep = _run(spark, tmp_path, "a")
    corpus = spark.read.parquet(os.path.join(out, "corpus"))
    packs = spark.read.parquet(os.path.join(out, "packs"))

    # every curated doc is split and packed exactly once
    assert rep["curated_docs"] == corpus.count() == packs.count()
    assert 0 < rep["curated_docs"] < rep["input_docs"]  # gates + sample bit
    assert set(rep["splits"]) == {"train", "val"}
    assert corpus.select("split").distinct().count() <= 2
    # packs never mix splits: every doc's pack-split == its corpus-split
    # (pack (group, index) ids are per-split namespaces by construction)
    mismatched = (
        packs.select("doc_id", F.col("split").alias("pack_split"))
        .join(corpus.select("doc_id", "split"), "doc_id")
        .where(F.col("pack_split") != F.col("split"))
    )
    assert mismatched.count() == 0
    # budget respected except single-doc oversize packs
    over = (
        packs.groupBy("split", "pack_group", "pack_index")
        .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("d"))
        .where("t > 256 AND d > 1")
    )
    assert over.count() == 0
    # report written and matches the returned dict
    with open(os.path.join(out, "report.json")) as f:
        assert json.load(f) == rep

    # determinism: a second run reproduces split + pack assignment exactly
    out2, rep2 = _run(spark, tmp_path, "b")
    assert rep2 == rep
    a = spark.read.parquet(os.path.join(out, "packs"))
    b = spark.read.parquet(os.path.join(out2, "packs"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_curate_job_rejects_empty_or_bad_split(spark, tmp_path):
    """r4 ADVICE: --split '' parsed to {}, the packing loop never ran, and
    packs.write raised AttributeError AFTER the corpus write had already
    succeeded. Now rejected before any Spark work."""
    import pytest

    from jobs.curate_job import main

    base = [
        "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(tmp_path / "x"),
    ]
    with pytest.raises(ValueError, match="non-empty"):
        main([*base, "--split", ""])
    with pytest.raises(ValueError, match="positive"):
        main([*base, "--split", "train=0.9,val=0"])
    assert not os.path.exists(str(tmp_path / "x"))  # failed before any write
