"""Distinct-count sketches as reusable batch operators.

Two paths, one contract (approximate distinct counting at 10^10-row scale
without a count-distinct shuffle of the raw keys):

- :func:`approx_distinct` — Spark's native HLL++ (``approx_count_distinct``).
  The production default: JVM-side, mergeable partial aggregates, one
  map-side-combined shuffle of fixed-size sketch buffers. Not
  cross-engine-reproducible (HLL implementations differ), so it is
  pytest-bounded against exact counts rather than DuckDB-oracled.
- :func:`kmv_distinct` — a deterministic K-Minimum-Values sketch
  (Bar-Yossef et al.): md5-hash each key to a 60-bit integer, keep the k
  smallest distinct hashes per group, estimate distinct = (k-1)/h_k with
  h_k the kth smallest normalized to [0,1). Every step is portable SQL
  (md5 + row_number), so the SAME estimate is DuckDB-oracle-checkable —
  the engine's verifiable sketch. Exact below k by construction.

The reference counts decoded entities exactly per block range
(daily_qc_airflow/row_counts.py:85-102 analog, A2-A6); these sketches are
the scale extension for cardinality questions (distinct repos touched,
distinct content hashes) where exact distinct over 10^10 rows is the
bottleneck.

Scale shape of ``kmv_distinct``: phase 0 dedupes (group, hash) with
map-side combine; phase 1 takes the k smallest per (group, salt) — salt =
hash mod ``salt_buckets``, so a hot group's sort spreads over
``salt_buckets`` parallel windows of bounded input; phase 2 re-ranks the
≤ salt_buckets×k survivors per group (tiny). No unbounded collect_list,
no single-task giant sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

# 2^60 — hashes are the first 15 hex chars of md5 (60 bits), normalized by
# this to [0,1). Kept as an exact integer literal on both engines.
TWO_POW_60 = 1 << 60


def _kmv_hash(cols: list[str]) -> Column:
    """Deterministic 60-bit hash of the concatenated key columns.

    md5 (portable) → first 15 hex chars → base-16 to long. The 0x1f unit
    separator prevents ("ab","c") colliding with ("a","bc").
    """
    joined = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")


def approx_distinct(
    df: DataFrame, cols: list[str], group_cols: list[str] | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """Native HLL++ distinct estimate per group (production path)."""
    gb = group_cols or []
    target = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    agg = F.approx_count_distinct(target, rsd).alias("approx_distinct")
    return df.groupBy(*gb).agg(agg) if gb else df.agg(agg)


def kmv_distinct(
    df: DataFrame, cols: list[str], k: int = 256,
    group_cols: list[str] | None = None, salt_buckets: int = 16,
) -> DataFrame:
    """Deterministic KMV distinct estimate per group (verifiable path).

    Output: group cols + ``est_distinct`` (BIGINT). Exact when a group has
    < k distinct keys; otherwise floor((k-1) / (h_k / 2^60)). Standard
    error ≈ 1/sqrt(k-2) (~6% at k=256).
    """
    gb = group_cols or []
    d = df.select(*gb, _kmv_hash(cols).alias("_h")).distinct()
    # phase 1: k smallest per (group, salt) — parallel, bounded windows
    salted = d.withColumn("_salt", F.pmod(F.col("_h"), F.lit(salt_buckets)))
    w1 = Window.partitionBy(*gb, "_salt").orderBy("_h")
    cand = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_salt", "_rn")
    )
    # phase 2: k smallest of the ≤ salt_buckets*k survivors per group
    w2 = Window.partitionBy(*gb).orderBy("_h") if gb else Window.orderBy("_h")
    topk = (
        cand.withColumn("_rn", F.row_number().over(w2)).where(F.col("_rn") <= k)
    )
    agg = topk.groupBy(*gb).agg(
        F.count(F.lit(1)).alias("_c"), F.max("_h").alias("_hk")
    )
    est = F.when(
        F.col("_c") < k, F.col("_c")
    ).otherwise(
        F.floor(F.lit(float(k - 1)) / (F.col("_hk") / F.lit(float(TWO_POW_60))))
    )
    return agg.select(*gb, est.cast("bigint").alias("est_distinct"))


def kmv_distinct_sql(
    table: str, cols: list[str], k: int = 256,
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB mirror of :func:`kmv_distinct` (same hash, same estimator).

    The two-level salt of the Spark side is a pure execution detail — the
    k smallest distinct hashes are the same set either way, so the oracle
    uses one window.
    """
    gb = group_cols or []
    joined = " || chr(31) || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    gsel = ", ".join(gb) + ", " if gb else ""
    gpart = "PARTITION BY " + ", ".join(gb) if gb else ""
    ggroup = "GROUP BY " + ", ".join(gb) if gb else ""
    return f"""
WITH _kmv_d AS (
  SELECT DISTINCT {gsel}
         CAST(CAST(('0x' || substr(md5({joined}), 1, 15)) AS UBIGINT) AS BIGINT) AS h
  FROM {table}),
_kmv_r AS (SELECT *, row_number() OVER ({gpart} ORDER BY h) AS rn FROM _kmv_d),
_kmv_t AS (SELECT {gsel} count(*) AS c, max(h) AS hk
           FROM _kmv_r WHERE rn <= {k} {ggroup})
SELECT {gsel}
       CAST(CASE WHEN c < {k} THEN c
                 ELSE floor({float(k - 1)} / (hk / {float(TWO_POW_60)})) END
            AS BIGINT) AS est_distinct
FROM _kmv_t
"""
