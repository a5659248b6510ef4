"""Data-profiling operators: key-skew distribution and value histograms.

Scale rationale (the reason these exist as first-class ops): at 10^10+ rows
the #1 plan killer is an unnoticed hot key feeding a shuffle
(SURVEY.md §7.3 hard part — the reference's hot-repo skew; BENCH.md skew
section measures the engine's salted mitigation). ``key_distribution`` is
the detector you run BEFORE choosing a join/agg strategy: top-N heaviest
keys with their share of the table and their multiple of the mean
(``x_mean`` ≫ 1 ⇒ salt that key or broadcast the other side).

Both operators are fully declarative — no driver-side ``.count()`` or
``.collect()``: scalar totals ride a broadcast cross join of a 1-row
aggregate, and top-N is sort+limit, which Spark plans as
TakeOrderedAndProject (per-partition heap, no global sort).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def key_distribution(
    df: DataFrame, key_cols: Sequence[str], top_n: int = 100
) -> DataFrame:
    """Top-``top_n`` heaviest keys: (key..., n_rows, share, x_mean, rank).

    ``share`` = key's fraction of all rows (round 6); ``x_mean`` = n_rows
    over the mean rows-per-key (round 4) — the skew factor a salting
    decision reads. ``rank`` is deterministic: count desc, then key asc.

    One shuffle (the groupBy, map-side partial); the per-key count frame is
    then reduced to one row (sum + key count) broadcast back, and top-N is
    TakeOrderedAndProject. Final row_number window runs over ≤ top_n rows.
    """
    key_cols = list(key_cols)
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"), F.count("*").alias("_n_keys")
    )
    order = [F.col("n_rows").desc(), *[F.col(c).asc() for c in key_cols]]
    top = (
        counts.orderBy(*order)
        .limit(top_n)
        .crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "n_rows",
            # one division over identical integer operands on any engine —
            # bit-identical doubles, stable under round()
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
            F.round(
                (F.col("n_rows") * F.col("_n_keys")) / F.col("_total"), 4
            ).alias("x_mean"),
        )
    )
    from pyspark.sql.window import Window

    # ≤ top_n rows — single tiny task by design (constant partition key
    # keeps WindowExec from warning about an empty partition spec)
    w = Window.partitionBy(F.lit(0)).orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def group_percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    ps: Sequence[float] = (0.5, 0.9, 0.99),
    approx: bool = False,
    max_group_rows: int | None = None,
) -> DataFrame:
    """Per-group percentiles: (group..., n_rows, p50, p90, p99, ...).

    DISCRETE percentiles (``percentile_disc``: smallest element whose
    cumulative distribution ≥ p) — the result is an actual element of the
    input, so there is NO interpolation arithmetic to diverge across
    engines (DuckDB's ``quantile_disc`` verified to agree on every probe;
    the continuous/interpolated variants differ in last-ulp association and
    are not hash-stable).

    Exact mode buffers each group's values in the aggregate (memory ∝ group
    size) — fine for bounded groups (per-tenant, per-day); for unbounded
    groups pass ``approx=True`` to use ``percentile_approx`` (bounded
    KLL-style sketch, rank error ≤ 1/accuracy — NOT cross-engine
    deterministic, so no oracle gate covers it).

    ``max_group_rows`` (exact mode only): opt-in guard against the silent
    executor OOM a pathologically hot group causes at 100×. One cheap
    count-per-group + max pre-pass (map-side combined, O(groups) result);
    raises with the offending size and points at ``approx=True`` instead of
    letting the buffering aggregate die mid-shuffle.
    """
    group_cols = list(group_cols)
    if not approx and max_group_rows is not None:
        worst = (
            df.groupBy(*group_cols)
            .agg(F.count("*").alias("_n"))
            .agg(F.max("_n"))
            .first()[0]
        ) or 0
        if worst > max_group_rows:
            raise ValueError(
                f"group_percentiles: largest group holds {worst} rows "
                f"> max_group_rows={max_group_rows}; exact mode buffers each "
                "group's values in executor memory — pass approx=True "
                "(bounded sketch) for unbounded groups"
            )
    fn = "percentile_approx" if approx else "percentile_disc"
    aggs = [F.count("*").alias("n_rows")]
    for p in ps:
        name = ("p" + f"{p * 100:g}").replace(".", "_")
        if approx:
            expr = f"percentile_approx({value_col}, {p!r})"
        else:
            expr = f"{fn}({p!r}) WITHIN GROUP (ORDER BY {value_col})"
        aggs.append(F.expr(expr).alias(name))
    return df.groupBy(*group_cols).agg(*aggs)


def equi_width_histogram(
    df: DataFrame,
    col: str,
    n_bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column: (bin_idx, bin_lo, bin_hi,
    n_rows), only non-empty bins, NULLs excluded, ``v == hi`` clamped into
    the last bin.

    Bounds default to the observed min/max (one extra aggregate pass,
    broadcast back — the data is scanned twice but never collected). The
    bin expression is ``floor((v - lo) * n / (hi - lo))`` in exactly that
    association so an independent engine evaluating the same formula gets
    bit-identical doubles (the DuckDB oracle mirrors it verbatim).

    ``hi == lo`` (a constant column — a flag, a single-day slice) collapses
    to ONE bin ``(0, lo, hi, n)`` instead of raising ANSI DIVIDE_BY_ZERO.
    """
    vals = df.select(F.col(col).cast("double").alias("_v")).where(
        F.col("_v").isNotNull()
    )
    if lo is None or hi is None:
        bounds = vals.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
        vals = vals.crossJoin(F.broadcast(bounds))
    else:
        vals = vals.select(
            "_v",
            F.lit(float(lo)).alias("_lo"),
            F.lit(float(hi)).alias("_hi"),
        )
    # hi == lo (constant column, single value, single-day slice) would be a
    # DIVIDE_BY_ZERO under ANSI — collapse to one bin [lo, hi] instead
    span = F.col("_hi") - F.col("_lo")
    bin_idx = F.when(
        span != 0,
        F.least(
            F.floor((F.col("_v") - F.col("_lo")) * n_bins / span),
            F.lit(n_bins - 1),
        ),
    ).otherwise(F.lit(0)).cast("long")
    return (
        vals.select(bin_idx.alias("bin_idx"), "_lo", "_hi")
        .groupBy("bin_idx", "_lo", "_hi")
        .agg(F.count("*").alias("n_rows"))
        .select(
            "bin_idx",
            F.round(
                F.col("_lo") + F.col("bin_idx") * (F.col("_hi") - F.col("_lo")) / n_bins, 6
            ).alias("bin_lo"),
            F.round(
                F.col("_lo") + (F.col("bin_idx") + 1) * (F.col("_hi") - F.col("_lo")) / n_bins, 6
            ).alias("bin_hi"),
            "n_rows",
        )
    )
