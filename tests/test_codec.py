"""Decode-stage unit tests — the analog of the reference's transformation
unit semantics (TryIntoInteger AboveMax, bq/integer.rs:83-152; cap_bignumeric,
common.rs:148-160; field-attributed errors, transformation/err.rs:1-31)."""

import hashlib
import json

import pyspark.sql.functions as F

from sonic_etl_spark.functions.codec import (
    BIGNUMERIC_CAP,
    decode_change_events,
    hex_to_long_checked,
)

I64_MAX = (1 << 63) - 1


def test_hex_to_long_checked(spark):
    rows = [
        ("0x0", 0),
        ("0x4190ab00", 0x4190AB00),
        ("0x7fffffffffffffff", I64_MAX),  # exactly i64::MAX → ok
        ("0x8000000000000000", None),  # i64::MAX + 1 → AboveMax → NULL
        ("0xffffffffffffffff1", None),  # 17 digits → overflow
        (None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "h string")
    got = df.select(hex_to_long_checked(F.col("h")).alias("v")).collect()
    assert [r["v"] for r in got] == [exp for _, exp in rows]


def _raw_row(content: str, size: int | None = None, value: str = "0x1", mode: str = "0x1ed"):
    import base64

    b64 = base64.b64encode(content.encode()).decode()
    n = len(content.encode()) if size is None else size
    return json.dumps({"content_b64": b64, "size": hex(n), "value": value, "mode": mode})


def _event(spark, content_raw: str):
    return spark.createDataFrame(
        [
            (
                0,
                0,
                0,
                "r",
                "p",
                "c" * 40,
                "py",
                content_raw,
                "upsert",
            )
        ],
        "event_id long, partition_id int, offset long, repo string, path string,"
        " commit string, lang string, content_raw string, op string",
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000)))


def test_decode_roundtrip_and_sha256(spark):
    content = "def f():\n    return 42  # unicode: λ"
    typed = decode_change_events(_event(spark, _raw_row(content, value="0xff"))).first()
    assert typed["content"] == content
    assert typed["content_sha256"] == hashlib.sha256(content.encode()).hexdigest()
    assert typed["size_bytes"] == len(content.encode())
    assert typed["value"] == "255" and typed["value_lossless"] == "255"
    assert typed["mode"] == 0o755
    assert typed["decode_error"] is None


def test_uint256_cap_and_lossless_dual(spark):
    # 2^256 - 1 = 78 decimal digits — far above the 38-nines cap
    big = "0x" + "f" * 64
    typed = decode_change_events(_event(spark, _raw_row("x", value=big))).first()
    assert typed["value"] == BIGNUMERIC_CAP
    assert typed["value_lossless"] == str((1 << 256) - 1)
    # boundary: exactly the cap passes through uncapped
    atcap = hex(int(BIGNUMERIC_CAP))
    typed2 = decode_change_events(_event(spark, _raw_row("x", value=atcap))).first()
    assert typed2["value"] == BIGNUMERIC_CAP == typed2["value_lossless"]


def test_field_attributed_errors(spark):
    bad_json = decode_change_events(_event(spark, "{not json")).first()
    assert bad_json["decode_error"] == "payload: malformed json"

    import base64

    overflow_payload = json.dumps(
        {
            "content_b64": base64.b64encode(b"x").decode(),
            "size": "0x8000000000000000",  # i64::MAX + 1
            "value": "0x1",
            "mode": "0x1",
        }
    )
    size_overflow = decode_change_events(_event(spark, overflow_payload)).first()
    assert size_overflow["decode_error"] == "size: AboveMax"

    mismatch = decode_change_events(_event(spark, _raw_row("abc", size=999))).first()
    assert mismatch["decode_error"] == "size: mismatch vs content"


def test_fail_the_batch(spark):
    from sonic_etl_spark.operators.merge import assert_no_decode_errors
    import pytest

    ok = decode_change_events(_event(spark, _raw_row("fine")))
    assert assert_no_decode_errors(ok) == 1
    bad = decode_change_events(_event(spark, "{not json"))
    with pytest.raises(ValueError, match="malformed json"):
        assert_no_decode_errors(bad)


def test_numeric_checked_range_and_validity(spark):
    from sonic_etl_spark.functions.codec import numeric_checked

    cases = [
        ("9" * 28, int("9" * 28)),        # exactly MAX_NUMERIC (28 nines) → ok
        ("1" + "0" * 28, None),            # smallest 29-digit value → TooBig → NULL
        ("9" * 29, None),                  # 29 digits → TooBig → NULL
        ("-" + "9" * 28, -int("9" * 28)),  # min bound ok
        ("000" + "1" * 28, int("1" * 28)),  # leading zeros don't overflow
        ("12a4", None),                    # not a decimal string
        ("", None),
        (None, None),
    ]
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = [r["v"] for r in df.select(numeric_checked(F.col("s")).alias("v")).collect()]
    assert [None if g is None else int(g) for g in got] == [e for _, e in cases]
