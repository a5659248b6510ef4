"""Temporal operators: as-of (point-in-time) join and sessionization.

Training-data / event-analytics extensions over the CDC engine's converged
tables (same family as operators/dedup.py, operators/curation.py — not a
reference operator; the reference's nearest analog is the latest-state
enrichment its QC joins do against the converged table,
daily_qc_airflow/row_counts.py:85-102, which is the degenerate "as of now"
case of the general as-of join implemented here).

Spark has no built-in ASOF JOIN. The classic naive encodings both fail at
scale: a range join (``l.k = r.k AND r.ts <= l.ts``) explodes to
BroadcastNestedLoop/Cartesian per key, and a per-row correlated subquery
isn't expressible. ``asof_join`` instead uses the **union-marker** plan:

1. tag right rows (side=0) with their payload as ONE struct column, union
   with left rows (side=1) via ``unionByName(allowMissingColumns=True)``;
2. one window per join key ordered by (ts, side) with a RUNNING frame
   (UNBOUNDED PRECEDING → CURRENT ROW): ``last(payload, ignorenulls=True)``
   carries the most recent right payload forward onto every left row;
3. filter back to left rows and expand the struct.

Cost model at 100 TB: exactly ONE shuffle (hash partition on the join key)
over |left| + |right| rows; the running ``last`` frame is a streaming
aggregate — each task holds O(1) state per key, never the key's full row
set. Sort is the per-partition shuffle sort Spark does for any window.
Compare: a range join is O(|left| × |right|) per key. A pathologically hot
key serializes into one task (window semantics require it) — pre-dedupe the
right side per (key, ts) and pre-filter payload columns before joining;
both are done by the callers in driver_queries.

``sessionize`` is the standard lag + running-sum pair over one window spec
(Catalyst collapses adjacent Window nodes with identical
partitioning/ordering into a single shuffle+sort).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

_TS_FIELD = "__asof_ts"


def _epoch_sec(col: F.Column) -> F.Column:
    """Fractional epoch seconds. TIMESTAMP_NTZ (what plain parquet reads
    as) cannot cast straight to DOUBLE in Spark 4 — route through TIMESTAMP
    (session-tz interpretation; gap/tolerance DIFFERENCES are tz-invariant
    outside DST transitions)."""
    return col.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_sec: float | None = None,
    suffix: str = "_asof",
    bucket_sec: float | None = None,
) -> DataFrame:
    """Point-in-time LEFT join: each left row gets the single right row with
    the nearest ``right_ts <= left_ts`` (direction='backward') or
    ``right_ts >= left_ts`` (direction='forward') within the same ``on``
    key; unmatched left rows keep NULL payload (left-outer semantics, same
    as DuckDB ``ASOF LEFT JOIN`` / pandas ``merge_asof``).

    Ties ``left_ts == right_ts`` MATCH (inclusive, DuckDB-compatible).

    ``right_cols`` (default: all non-key, non-ts right columns) are emitted
    on the output, renamed with ``suffix`` when they collide with a left
    column; the matched right timestamp is always emitted as
    ``{right_ts}{suffix}`` if ``right_ts`` collides with a left column,
    else as ``right_ts``.

    ``tolerance_sec``: matches farther than this (in seconds) are nulled
    out, pandas-style.

    Contract: right must be unique per (on, right_ts) — with duplicates the
    carried payload is the last in the engine's sort, which is
    nondeterministic across runs. Dedupe first (e.g. ``salted_lww``).
    NULL ``left_ts`` rows never match (sorted before every right row in
    both directions — ASC NULLS FIRST / DESC NULLS FIRST); NULL
    ``right_ts`` rows are dropped (they can never be the nearest match).

    ``bucket_sec`` (both directions): the hot-key escape hatch. The default
    plan's window serializes each key into one task — correct, streaming,
    but a key holding 10^9 rows runs on one core. With ``bucket_sec`` set,
    the running scan is decomposed as a parallel prefix scan over time
    buckets: (1) within-(key, bucket) running last — hot key split across
    buckets, parallel; (2) per-bucket nearest RIGHT payload (last for
    backward, first for forward), rolled across the (small) bucket spine
    per key; (3) each left row coalesces its within-bucket match with the
    carry-in from strictly-earlier (backward) / strictly-later (forward)
    buckets. Identical results (asserted by test); costs ~2 extra shuffles
    of bucket-level frames, so use it only when ``key_distribution`` says a
    key is hot relative to bucket granularity. Join keys must be non-NULL
    in bucketed mode (the carry join is a plain equi-join).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    right_cols = list(right_cols)
    bad = [c for c in right_cols if c in on or c == right_ts]
    if bad:
        raise ValueError(f"right_cols may not repeat key/ts columns: {bad}")

    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}
    ts_out = right_ts + suffix if right_ts in left.columns else right_ts
    collisions = {n for n in [*out_names.values(), ts_out] if n in left.columns}
    if collisions:
        raise ValueError(f"output columns collide with left even after suffix: {collisions}")

    payload = F.struct(
        F.col(right_ts).alias(_TS_FIELD),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    )
    # NULL right_ts rows can never be the nearest match, and if kept they
    # sort to the NULLS-FIRST edge of the window ahead of NULL-ts left rows
    # (backward) and would be carried onto them as a fabricated payload
    r = right.where(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias(left_ts),
        payload.alias("_asof_payload"),
        F.lit(0).alias("_asof_side"),
    )
    lf = left.withColumn("_asof_side", F.lit(1))
    u = lf.unionByName(r, allowMissingColumns=True)

    if bucket_sec is not None:
        u = _bucketed_scan(u, on, left_ts, float(bucket_sec), direction)
    else:
        # at equal ts the right row (side 0) sorts BEFORE the left row, so it
        # is inside the running frame → inclusive (>= / <=) tie semantics.
        # NULL left_ts rows must sort BEFORE every right row in both
        # directions so the running last() has seen no payload yet: asc is
        # nulls-first already, desc needs desc_nulls_first (plain desc() is
        # desc_nulls_last — NULL rows would land AFTER all right rows and
        # pick up the min-right_ts payload as a fabricated forward match).
        ts_order = (
            F.col(left_ts).asc_nulls_first()
            if direction == "backward"
            else F.col(left_ts).desc_nulls_first()
        )
        w = (
            Window.partitionBy(*on)
            .orderBy(ts_order, F.col("_asof_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.withColumn("_asof_m", F.last("_asof_payload", ignorenulls=True).over(w))
    u = u.where(F.col("_asof_side") == 1)

    if tolerance_sec is not None:
        diff = _epoch_sec(F.col(left_ts)) - _epoch_sec(F.col("_asof_m")[_TS_FIELD])
        if direction == "forward":
            diff = -diff
        u = u.withColumn(
            "_asof_m", F.when(diff <= float(tolerance_sec), F.col("_asof_m"))
        )

    sel = [F.col(c) for c in left.columns]
    sel += [F.col("_asof_m")[out_names[c]].alias(out_names[c]) for c in right_cols]
    sel.append(F.col("_asof_m")[_TS_FIELD].alias(ts_out))
    return u.select(*sel)


def _bucketed_scan(
    u: DataFrame, on: list[str], ts_col: str, bucket_sec: float, direction: str
) -> DataFrame:
    """Parallel prefix-scan decomposition of the running-last scan (the
    Blelloch two-phase scan, expressed in DataFrame ops):

    1. within-(key, time-bucket) running last — a hot key's rows split
       across buckets, so the serial unit shrinks from "all rows of the
       key" to "rows of the key within one bucket";
    2. bucket summaries: the bucket's BEST right payload per (key, bucket)
       (last for backward, first for forward), rolled across the (small)
       bucket spine per key — the only remaining per-key serial scan,
       O(time span / bucket_sec), independent of row count;
    3. each row's match = within-bucket running last, else the carry from
       strictly-earlier (backward) / strictly-later (forward) buckets.

    ``direction='forward'`` is the exact mirror: the within-bucket scan
    runs over DESC time, summaries take the bucket's min-ts right payload,
    and the carry rolls over the spine in DESC bucket order.

    NULL-ts rows land in a sentinel bucket on the no-carry side of the
    scan (before all real buckets for backward, after them for forward)
    that contains no right rows (NULL right_ts rows are dropped upstream)
    → NULL match, same as the default plan. Caveat: join keys must be
    non-NULL in bucketed mode (the carry join is a plain equi-join).
    """
    backward = direction == "backward"
    # sentinel keeps the bucket non-NULL so the carry equi-join never
    # drops; its side guarantees NULL-ts rows receive no carry
    sentinel = -(1 << 62) if backward else (1 << 62)
    u = u.withColumn(
        "_asof_bkt",
        F.coalesce(
            F.floor(_epoch_sec(F.col(ts_col)) / bucket_sec), F.lit(sentinel)
        ),
    )
    ts_order = F.col(ts_col).asc() if backward else F.col(ts_col).desc_nulls_first()
    w_in = (
        Window.partitionBy(*on, "_asof_bkt")
        .orderBy(ts_order, F.col("_asof_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn(
        "_asof_within", F.last("_asof_payload", ignorenulls=True).over(w_in)
    )
    # nearest right payload per (key, bucket) looking in the scan direction
    # — right is unique per (key, ts)
    best = F.max_by if backward else F.min_by
    bucket_best = (
        u.where(F.col("_asof_side") == 0)
        .groupBy(*on, "_asof_bkt")
        .agg(best("_asof_payload", F.col(ts_col)).alias("_asof_bkt_best"))
    )
    spine = u.select(*on, "_asof_bkt").distinct()
    bkt_order = F.col("_asof_bkt").asc() if backward else F.col("_asof_bkt").desc()
    w_carry = (
        Window.partitionBy(*on)
        .orderBy(bkt_order)
        # strictly-earlier (backward) / strictly-later (forward) buckets;
        # last(ignorenulls) picks the NEAREST such bucket with a payload
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        spine.join(bucket_best, on=[*on, "_asof_bkt"], how="left")
        .withColumn(
            "_asof_carry", F.last("_asof_bkt_best", ignorenulls=True).over(w_carry)
        )
        .select(*on, "_asof_bkt", "_asof_carry")
    )
    return (
        u.join(carry, on=[*on, "_asof_bkt"], how="left")
        .withColumn("_asof_m", F.coalesce("_asof_within", "_asof_carry"))
        .drop("_asof_bkt", "_asof_within", "_asof_carry")
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    order_cols: Sequence[str] = (),
    current_flag: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension type-2 intervals from a change feed: each
    version row gains ``valid_from`` (its own ts) and ``valid_to`` (the
    NEXT version's ts for the same key; NULL for the current version) —
    the history-table shape whose point-in-time consumer is
    :func:`asof_join`. Half-open intervals: [valid_from, valid_to).

    ``order_cols`` breaks ts ties (pass the offset/commit columns a CDC
    feed carries). One shuffle (the per-key window); ``lead`` is a
    streaming frame. ``current_flag`` adds ``is_current``.
    """
    key_cols = list(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    out = df.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(F.col(ts_col)).over(w)
    )
    if current_flag:
        out = out.withColumn("is_current", F.col("valid_to").isNull())
    return out


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_sec: float,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign a 1-based ``session_idx`` per key: a new session starts when
    the gap to the previous event exceeds ``gap_sec`` seconds (strict >).

    ``order_cols`` breaks timestamp ties deterministically (pass a unique
    id when (key, ts) is not unique). One shuffle: the lag and the running
    sum share one window spec, which Catalyst collapses into a single
    Window node (one sort, streaming frame).
    """
    key_cols = list(key_cols)
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull()
        | ((_epoch_sec(F.col(ts_col)) - _epoch_sec(prev)) > float(gap_sec)),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("_sess_new", is_new)
        .withColumn("session_idx", F.sum("_sess_new").over(run))
        .drop("_sess_new")
    )


def session_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_sec: float,
    order_cols: Sequence[str] = (),
    extra_aggs: Sequence[F.Column] = (),
) -> DataFrame:
    """Per-session rollup: (key..., session_idx, n_events, start_ts, end_ts)
    plus any ``extra_aggs`` (already-aliased aggregate Columns).

    Two shuffles total: the sessionize window, then the groupBy — the
    groupBy keys are a superset of the window partition key, so AQE/Catalyst
    keeps the second exchange partial-aggregated map-side.
    """
    s = sessionize(df, key_cols, ts_col, gap_sec, order_cols)
    return s.groupBy(*key_cols, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        *extra_aggs,
    )
