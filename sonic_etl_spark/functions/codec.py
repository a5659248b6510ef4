"""Vectorized raw→typed decode (the "T" of ETL).

Re-implements, Spark-first, the reference's transform semantics
(extractor_transformer/src/sonic_config/transformation/):

- hex-quantity parsing        (common.rs:132-146 ``extract_tarnsform_epoch``)
- checked i64 narrowing       (bq/integer.rs:83-152 ``TryIntoInteger`` —
                               values past i64::MAX are *errors*, not wraps)
- capped + lossless duals     (common.rs:148-160 ``cap_bignumeric`` saturates
                               uint256 at 38 nines; common.rs:211-213 stores
                               ``value`` capped AND ``value_lossless`` full)
- fail-the-batch errors       (transformation/err.rs:1-31 — a bad row fails
                               the whole offset, which is retried; here a bad
                               row sets ``decode_error`` and the apply stage
                               raises if any row in the batch errored)
- sha256 per-row invariant    (BASELINE.json input_hint: content sha256
                               equality vs goldens)

Everything stays JVM-side except uint256 decimal expansion, which genuinely
exceeds 64-bit built-ins and uses ONE Arrow-batched pandas UDF (never
row-at-a-time Python) — the input_hint's vectorized-only constraint.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

RAW_PAYLOAD_SCHEMA = StructType(
    [
        StructField("content_b64", StringType()),
        StructField("size", StringType()),
        StructField("value", StringType()),
        StructField("mode", StringType()),
    ]
)

# 38 nines — BigQuery BIGNUMERIC practical cap used by the reference
# (common.rs:154-160). Values above are *capped*, not errored.
BIGNUMERIC_CAP = "9" * 38

TYPED_COLUMNS = [
    "partition_id",
    "offset",
    "repo",
    "path",
    "commit",
    "lang",
    "content",
    "content_sha256",
    "size_bytes",
    "value",
    "value_lossless",
    "mode",
    "op",
    "ts",
    "decode_error",
]

_I64_MAX = (1 << 63) - 1


def hex_to_long_checked(col: Column) -> Column:
    """'0x…' hex quantity → long with overflow *detection* (not wrap).

    The reference's ``TryIntoInteger`` errors with ``AboveMax`` past i64::MAX
    (bq/integer.rs:83-152). Spark's ``conv`` wraps silently at 2^64, so the
    guard is explicit: >16 hex digits, or 16 digits with a high first nibble,
    is an overflow → NULL here; callers pair this with an error flag.
    Stays entirely in whole-stage codegen.
    """
    digits = F.regexp_replace(F.lower(col), "^0x", "")
    overflow = (F.length(digits) > 16) | (
        (F.length(digits) == 16) & (F.substring(digits, 1, 1) > F.lit("7"))
    )
    return F.when(col.isNull() | overflow, F.lit(None)).otherwise(
        F.conv(digits, 16, 10).cast("long")
    )


@pandas_udf(
    StructType(
        [
            StructField("value", StringType()),
            StructField("value_lossless", StringType()),
        ]
    )
)
def _uint256_hex_to_decimal_dual(hex_vals: pd.Series) -> pd.DataFrame:
    """uint256 hex → (capped decimal string, lossless decimal string).

    Arrow-batched; Python big-int only because no JVM built-in does >64-bit
    radix conversion. Mirrors common.rs:148-160 (cap) + :211-213 (dual).
    """
    cap = int(BIGNUMERIC_CAP)

    def conv(h):
        if h is None:
            return (None, None)
        try:
            v = int(h, 16)
        except ValueError:
            return (None, None)
        s = str(v)
        return (s if v <= cap else BIGNUMERIC_CAP, s)

    pairs = hex_vals.map(conv)
    return pd.DataFrame(
        {"value": pairs.str[0], "value_lossless": pairs.str[1]}
    )


def decode_change_events(raw: DataFrame) -> DataFrame:
    """Decode raw change events into the typed ``source_code`` row shape.

    One scan, no shuffle: JSON parse, base64 unwrap, hex quantities, checked
    casts, sha256, capped/lossless dual — the full analog of one
    ``transform_*`` pass (common.rs:30-130). ``decode_error`` is non-null iff
    any field failed its check; apply() treats that as fail-the-batch.
    """
    p = F.from_json(F.col("content_raw"), RAW_PAYLOAD_SCHEMA)
    df = raw.withColumn("_p", p)

    content = F.decode(F.unbase64(F.col("_p.content_b64")), "utf-8")
    size_bytes = hex_to_long_checked(F.col("_p.size"))
    mode = hex_to_long_checked(F.col("_p.mode"))

    df = (
        df.withColumn("content", content)
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .withColumn("size_bytes", size_bytes)
        .withColumn("mode", mode)
        .withColumn("_vd", _uint256_hex_to_decimal_dual(F.col("_p.value")))
        .withColumn("value", F.col("_vd.value"))
        .withColumn("value_lossless", F.col("_vd.value_lossless"))
    )

    # field-attributed error (transformation/err.rs:1-31): name the first
    # failing field so the retry path can report it.
    df = df.withColumn(
        "decode_error",
        F.when(
            F.col("_p").isNull()
            | (
                F.col("_p.content_b64").isNull()
                & F.col("_p.size").isNull()
                & F.col("_p.value").isNull()
                & F.col("_p.mode").isNull()
            ),
            F.lit("payload: malformed json"),
        )
        .when(F.col("content").isNull(), F.lit("content_b64: bad base64"))
        .when(
            F.col("_p.size").isNotNull() & F.col("size_bytes").isNull(),
            F.lit("size: AboveMax"),
        )
        .when(
            F.col("_p.mode").isNotNull() & F.col("mode").isNull(),
            F.lit("mode: AboveMax"),
        )
        .when(
            F.col("_p.value").isNotNull() & F.col("value").isNull(),
            F.lit("value: bad hex"),
        )
        .otherwise(F.lit(None)),
    )
    # integrity check analog of validate_transformation (test.rs:174-221):
    # declared size must match decoded content byte length.
    df = df.withColumn(
        "decode_error",
        F.coalesce(
            F.col("decode_error"),
            F.when(
                F.col("size_bytes") != F.length(F.encode(F.col("content"), "utf-8")),
                F.lit("size: mismatch vs content"),
            ),
        ),
    )

    return df.select("event_id", *TYPED_COLUMNS)
