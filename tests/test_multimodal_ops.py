"""Multimodal plumbing tests: binary payload schema, mapInPandas batch shape,
deterministic fake features, explicit stub failure for unhosted codecs."""

import pytest

from sonic_etl_spark.operators import multimodal as mm_ops


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world", "s1"), (2, "abc", "s2")],
        "doc_id bigint, text string, source string",
    )


def test_attach_media_schema_and_meta(spark):
    media = mm_ops.attach_media(_docs(spark))
    row = {r["doc_id"]: r for r in media.collect()}
    assert bytes(row[1]["payload"]) == b"hello world"
    assert row[1]["meta"]["n_bytes"] == 11
    assert row[1]["meta"]["mime"] == "text/plain"
    assert row[2]["meta"]["source"] == "s2"


def test_extract_features_deterministic(spark):
    media = mm_ops.attach_media(_docs(spark))
    out = {r["doc_id"]: r for r in mm_ops.extract_features(media).collect()}
    assert out[1]["n_bytes"] == 11
    assert out[1]["feat_checksum"] == sum(b"hello world")
    assert out[2]["feat_checksum"] == sum(b"abc")
    assert len(out[1]["feature"]) == 8
    # deterministic across runs
    out2 = {r["doc_id"]: r for r in mm_ops.extract_features(media).collect()}
    assert out[1]["feature"] == out2[1]["feature"]


def test_decode_media_stub_raises_for_unhosted_codec():
    assert mm_ops.decode_media(b"x", "text") == b"x"
    with pytest.raises(NotImplementedError):
        mm_ops.decode_media(b"\x89PNG", "image")


def test_resize_media_composes_and_bounds_size(spark):
    """attach → resize → extract composes (binary in/out); payloads bounded
    at target_bytes; metadata rewritten; determinism via checksum."""
    from sonic_etl_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "x" * 1000, "s"), (2, "ab", "s")], "doc_id bigint, text string, source string"
    )
    media = mm.attach_media(docs)
    small = mm.resize_media(media, target_bytes=64)
    rows = {r["doc_id"]: r for r in small.collect()}
    assert len(rows[1]["payload"]) == 64 and rows[1]["meta"]["n_bytes"] == 64
    assert len(rows[2]["payload"]) == 2  # already under target: unchanged
    feats = mm.extract_features(small).collect()  # composition works
    assert {r["doc_id"] for r in feats} == {1, 2}
    # deterministic across runs
    again = {r["doc_id"]: r for r in mm.resize_media(media, target_bytes=64).collect()}
    assert bytes(again[1]["payload"]) == bytes(rows[1]["payload"])


def test_frame_sample_row_fanout(spark):
    from sonic_etl_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "A" * 640, "s")], "doc_id bigint, text string, source string"
    )
    frames = mm.frame_sample(
        mm.attach_media(docs), frame_bytes=64, every_k=3
    ).collect()
    # 640 bytes / 64 = 10 frames; every 3rd → indexes 0,3,6,9
    assert sorted(r["frame_index"] for r in frames) == [0, 3, 6, 9]
    assert all(r["n_frames"] == 10 for r in frames)
    assert all(len(r["frame"]) == 64 for r in frames)
    assert all(r["frame_checksum"] == 64 * ord("A") for r in frames)


def test_n_bytes_hint_skips_sizing_jobs(spark):
    """A composed attach → resize → extract → frames chain should pay ONE
    metadata sizing pass (estimate_media_bytes), not one per stage: with
    n_bytes_hint provided, stage plan-construction launches ZERO Spark jobs,
    and the results are identical to the self-sizing path."""
    sc = spark.sparkContext
    media = mm_ops.attach_media(_docs(spark))
    total = mm_ops.estimate_media_bytes(media)
    assert total > 0

    sc.setJobGroup("mm-hint", "hint path must not run jobs")
    try:
        feats_hint = mm_ops.extract_features(media, n_bytes_hint=total)
        small_hint = mm_ops.resize_media(media, target_bytes=64, n_bytes_hint=total)
        frames_hint = mm_ops.frame_sample(media, n_bytes_hint=total)
        jobs = sc.statusTracker().getJobIdsForGroup("mm-hint")
        assert list(jobs) == [], f"hinted construction ran jobs: {jobs}"
    finally:
        sc.setJobGroup("", "")

    # self-sizing construction runs the sizing action (AQE may split the
    # one agg into >1 job); the contract under test is hinted == 0 jobs
    sc.setJobGroup("mm-nohint", "self-sizing runs the sizing action")
    try:
        feats_auto = mm_ops.extract_features(media)
        assert len(sc.statusTracker().getJobIdsForGroup("mm-nohint")) >= 1
    finally:
        sc.setJobGroup("", "")

    def key(df):
        return sorted(
            (r["doc_id"], r["feat_checksum"], tuple(r["feature"]))
            for r in df.collect()
        )

    assert key(feats_hint) == key(feats_auto)
    assert small_hint.count() == media.count()
    assert frames_hint.count() > 0
