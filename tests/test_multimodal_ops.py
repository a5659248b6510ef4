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
