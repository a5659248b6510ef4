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


def kmv_group_sketches(
    df: DataFrame, cols: list[str], k: int = 256,
    group_cols: list[str] | None = None, salt_buckets: int = 16,
) -> DataFrame:
    """Per-group KMV sketch as an ARRAY: the k smallest distinct 60-bit
    hashes, sorted ascending — the mergeable representation set operations
    combine. Same salted two-level selection as :func:`kmv_distinct`
    (bounded windows; the collect_list is capped at k per group)."""
    gb = group_cols or []
    d = df.select(*gb, _kmv_hash(cols).alias("_h")).distinct()
    salted = d.withColumn("_salt", F.pmod(F.col("_h"), F.lit(salt_buckets)))
    w1 = Window.partitionBy(*gb, "_salt").orderBy("_h")
    cand = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_salt", "_rn")
    )
    w2 = Window.partitionBy(*gb).orderBy("_h") if gb else Window.orderBy("_h")
    topk = cand.withColumn("_rn", F.row_number().over(w2)).where(
        F.col("_rn") <= k
    )
    return topk.groupBy(*gb).agg(
        F.sort_array(F.collect_list("_h")).alias("kmv")
    )


def kmv_set_overlap(
    df: DataFrame, cols: list[str], group_col: str, k: int = 256,
    salt_buckets: int = 16,
) -> DataFrame:
    """Pairwise union / intersection cardinality estimates between groups
    from their KMV sketches (the theta-sketch set-operation workhorse:
    "how many distinct users do segments A and B share?" at 10^10 rows
    without a distinct-join).

    For each group pair (a < b): merge the two sketches, keep the k
    smallest ⇒ a valid KMV of A∪B ⇒ ``union_est``; the fraction of that
    union sketch present in BOTH input sketches estimates Jaccard ⇒
    ``intersection_est`` = jaccard × union. When the merged sketch holds
    fewer than k hashes both sketches were exhaustive, so the answers are
    EXACT. The pair relation is G² rows of k-length arrays — driver-scale
    metadata, never data-scale.
    """
    sk = kmv_group_sketches(df, cols, k, [group_col], salt_buckets)
    a = sk.select(
        F.col(group_col).alias("group_a"), F.col("kmv").alias("ka")
    )
    b = sk.select(
        F.col(group_col).alias("group_b"), F.col("kmv").alias("kb")
    )
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    merged = F.slice(
        F.array_sort(F.array_union(F.col("ka"), F.col("kb"))), 1, k
    )
    m = F.size(merged)
    exhaustive = (F.size(F.array_union(F.col("ka"), F.col("kb"))) < k)
    kth_norm = F.element_at(merged, m) / F.lit(float(TWO_POW_60))
    union_est = F.when(exhaustive, m.cast("double")).otherwise(
        F.floor(F.lit(float(k - 1)) / kth_norm)
    )
    in_both = F.size(
        F.array_intersect(merged, F.array_intersect(F.col("ka"), F.col("kb")))
    )
    jaccard = in_both / m.cast("double")
    inter_est = F.when(
        exhaustive,
        F.size(F.array_intersect(F.col("ka"), F.col("kb"))).cast("double"),
    ).otherwise(F.floor(jaccard * union_est))
    return pairs.select(
        "group_a",
        "group_b",
        union_est.cast("bigint").alias("union_est"),
        inter_est.cast("bigint").alias("intersection_est"),
        F.round(jaccard, 4).alias("jaccard_est"),
    )


def kmv_set_overlap_sql(
    table: str, cols: list[str], group_col: str, k: int = 256,
) -> str:
    """DuckDB mirror of :func:`kmv_set_overlap` — same hashes, same merge,
    same estimators, value-for-value."""
    joined = " || chr(31) || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    two60 = float(TWO_POW_60)
    return f"""
WITH _kv_d AS (
  SELECT DISTINCT {group_col} AS g,
         CAST(CAST(('0x' || substr(md5({joined}), 1, 15)) AS UBIGINT) AS BIGINT) AS h
  FROM {table}),
_kv_r AS (SELECT *, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
          FROM _kv_d),
_kv_sk AS (SELECT g, list(h ORDER BY h) AS kmv
           FROM _kv_r WHERE rn <= {k} GROUP BY g),
_kv_p AS (SELECT a.g AS group_a, b.g AS group_b, a.kmv AS ka, b.kmv AS kb
          FROM _kv_sk a JOIN _kv_sk b ON a.g < b.g),
_kv_c AS (SELECT *, list_sort(list_distinct(ka || kb)) AS uni FROM _kv_p),
_kv_e AS (SELECT *, uni[1:{k}] AS merged, len(uni) AS ulen FROM _kv_c),
_kv_f AS (SELECT *, len(merged) AS m,
                 len(list_intersect(list_intersect(merged, ka), kb)) AS in_both
          FROM _kv_e)
SELECT group_a, group_b,
       CAST(CASE WHEN ulen < {k} THEN m
                 ELSE floor({float(k - 1)} / (merged[m] / {two60})) END
            AS BIGINT) AS union_est,
       CAST(CASE WHEN ulen < {k} THEN len(list_intersect(ka, kb))
                 ELSE floor((in_both / CAST(m AS DOUBLE))
                            * floor({float(k - 1)} / (merged[m] / {two60})))
            END AS BIGINT) AS intersection_est,
       round(in_both / CAST(m AS DOUBLE), 4) AS jaccard_est
FROM _kv_f
"""


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
