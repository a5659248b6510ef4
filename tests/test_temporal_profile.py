"""operators.temporal (as-of join, sessionization) + operators.profile.

Semantics pinned here (the driver gate re-checks them against DuckDB's
native ASOF JOIN): inclusive ties, left-outer NULLs, forward direction,
tolerance nulling, deterministic session boundaries at exact-gap edges,
and the plan shape (one hash exchange, no cartesian/range join).
"""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from sonic_etl_spark.operators import profile, temporal


def _ts(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def lr(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(5), "before-any-right"),
            (1, _ts(10), "between"),
            (1, _ts(25), "tie"),
            (2, _ts(5), "after-only-right"),
            (3, _ts(9), "key-missing-on-right"),
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(8), 100.0), (1, _ts(20), 200.0), (1, _ts(25), 250.0), (2, _ts(1), 300.0)],
        "k int, ts timestamp, rv double",
    )
    return left, right


def _rows(df, *cols):
    return {tuple(r) for r in df.select(*cols).collect()}


def test_asof_backward_inclusive_ties_and_outer_nulls(lr):
    left, right = lr
    out = temporal.asof_join(left, right, on="k", left_ts="ts", right_cols=["rv"])
    # left columns preserved, payload + matched ts appended (ts collides → suffixed)
    assert out.columns == ["k", "ts", "tag", "rv", "ts_asof"]
    got = _rows(out, "tag", "rv")
    assert got == {
        ("before-any-right", None),        # no right at/before ts=5
        ("between", 100.0),                # nearest prior is ts=8
        ("tie", 250.0),                    # EQUAL ts matches (inclusive >=)
        ("after-only-right", 300.0),
        ("key-missing-on-right", None),    # left-outer
    }
    assert out.count() == left.count()     # never duplicates/drops left rows


def test_asof_forward(lr):
    left, right = lr
    out = temporal.asof_join(
        left, right, on="k", left_ts="ts", right_cols=["rv"], direction="forward"
    )
    got = _rows(out, "tag", "rv")
    assert got == {
        ("before-any-right", 100.0),       # nearest following is ts=8
        ("between", 200.0),
        ("tie", 250.0),                    # inclusive on forward too
        ("after-only-right", None),        # only right is BEFORE the left row
        ("key-missing-on-right", None),
    }


def test_asof_tolerance_nulls_far_matches(lr):
    left, right = lr
    out = temporal.asof_join(
        left, right, on="k", left_ts="ts", right_cols=["rv"], tolerance_sec=3
    )
    got = _rows(out, "tag", "rv")
    # (2, ts=5) matched ts=1 → diff 4 > 3 → nulled; tie diff 0 kept
    assert got == {
        ("before-any-right", None),
        ("between", 100.0),
        ("tie", 250.0),
        ("after-only-right", None),
        ("key-missing-on-right", None),
    }


def test_asof_rejects_ambiguous_args(lr):
    left, right = lr
    with pytest.raises(ValueError, match="backward|forward"):
        temporal.asof_join(left, right, on="k", left_ts="ts", direction="nearest")
    with pytest.raises(ValueError, match="key/ts"):
        temporal.asof_join(left, right, on="k", left_ts="ts", right_cols=["k"])


def test_asof_plan_one_exchange_no_cartesian(lr):
    left, right = lr
    out = temporal.asof_join(left, right, on="k", left_ts="ts", right_cols=["rv"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    # union-marker: exactly one hash exchange (the window's, on the join key)
    assert plan.count("Exchange hashpartitioning") == 1


def test_sessionize_exact_gap_is_same_session(spark):
    ev = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(3600)), (1, _ts(7201)), (2, _ts(0))],
        "u int, ts timestamp",
    )
    out = temporal.sessionize(ev, ["u"], "ts", gap_sec=3600)
    by = {(r["u"], r["ts"]): r["session_idx"] for r in out.collect()}
    assert by[(1, _ts(0))] == 1
    assert by[(1, _ts(3600))] == 1   # gap == gap_sec → NOT a new session (strict >)
    assert by[(1, _ts(7201))] == 2   # 3601 > 3600 → new session
    assert by[(2, _ts(0))] == 1


def test_session_stats_rollup(spark):
    ev = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(100), 2.0), (1, _ts(50000), 4.0)],
        "u int, ts timestamp, v double",
    )
    st = temporal.session_stats(
        ev, ["u"], "ts", gap_sec=3600,
        extra_aggs=[F.sum(F.round(F.col("v") * 100).cast("long")).alias("cents")],
    )
    rows = {r["session_idx"]: r for r in st.collect()}
    assert rows[1]["n_events"] == 2 and rows[1]["cents"] == 300
    assert rows[1]["start_ts"] == _ts(0) and rows[1]["end_ts"] == _ts(100)
    assert rows[2]["n_events"] == 1 and rows[2]["cents"] == 400


def test_key_distribution(spark):
    df = spark.createDataFrame(
        [(k,) for k in ["a"] * 6 + ["b"] * 3 + ["c"] * 1], "k string"
    )
    out = profile.key_distribution(df, ["k"], top_n=2).collect()
    assert [(r["k"], r["n_rows"], r["rank"]) for r in out] == [("a", 6, 1), ("b", 3, 2)]
    a = out[0]
    assert a["share"] == 0.6 and a["x_mean"] == 1.8  # 6 / (10/3 keys-mean)


def test_key_distribution_rank_ties_deterministic(spark):
    df = spark.createDataFrame([(k,) for k in ["b", "a", "c", "a", "b", "c"]], "k string")
    out = profile.key_distribution(df, ["k"], top_n=3).collect()
    assert [r["k"] for r in out] == ["a", "b", "c"]  # equal counts → key asc


def test_equi_width_histogram_clamps_max_and_skips_nulls(spark):
    df = spark.createDataFrame(
        [(0.0,), (4.9,), (5.0,), (9.9,), (10.0,), (None,)], "v double"
    )
    out = {r["bin_idx"]: r for r in profile.equi_width_histogram(df, "v", n_bins=2).collect()}
    assert out[0]["n_rows"] == 2            # 0.0, 4.9
    assert out[1]["n_rows"] == 3            # 5.0, 9.9, and v==hi clamped in
    assert out[0]["bin_lo"] == 0.0 and out[0]["bin_hi"] == 5.0
    assert out[1]["bin_hi"] == 10.0
    assert sum(r["n_rows"] for r in out.values()) == 5  # NULL excluded


def test_group_percentiles_discrete_and_approx(spark):
    import itertools
    rows = [(g, float(v)) for g, v in itertools.product(["a", "b"], range(1, 12))]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in profile.group_percentiles(df, "v", ["g"]).collect()}
    for g in ("a", "b"):
        assert out[g]["n_rows"] == 11
        # discrete: smallest element with cume_dist >= p (actual elements)
        assert out[g]["p50"] == 6.0 and out[g]["p90"] == 10.0 and out[g]["p99"] == 11.0
    ap = profile.group_percentiles(df, "v", ["g"], approx=True).collect()[0]
    assert ap["p50"] in (5.0, 6.0)  # sketch: rank-bounded, not pinned


def test_asof_bucketed_equals_default_plan(spark):
    # randomized-but-seeded workload incl. a hot key, empty buckets, a
    # key with no right rows, and left rows before any right
    import random
    rng = random.Random(7)
    left = [(k, _ts(rng.randrange(0, 5000)), rng.random())
            for k in (1, 1, 1, 2, 3) for _ in range(40)]
    right = [(k, _ts(t), float(t))
             for k in (1, 2) for t in rng.sample(range(0, 5000), 60)]
    ldf = spark.createDataFrame(left, "k int, ts timestamp, lv double")
    rdf = spark.createDataFrame(right, "k int, ts timestamp, rv double").dropDuplicates(["k", "ts"])
    for direction in ("backward", "forward"):
        base = temporal.asof_join(
            ldf, rdf, on="k", left_ts="ts", right_cols=["rv"],
            direction=direction,
        )
        bucketed = temporal.asof_join(
            ldf, rdf, on="k", left_ts="ts", right_cols=["rv"],
            direction=direction, bucket_sec=600,
        )
        assert bucketed.columns == base.columns
        assert base.exceptAll(bucketed).count() == 0
        assert bucketed.exceptAll(base).count() == 0


def test_asof_bucketed_tolerance_and_null_ts(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "near"), (1, _ts(2000), "far"), (1, None, "null-ts")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame([(1, _ts(5), 50.0)], "k int, ts timestamp, rv double")
    out = temporal.asof_join(
        left, right, on="k", left_ts="ts", right_cols=["rv"],
        bucket_sec=60, tolerance_sec=30,
    )
    got = {r["tag"]: r["rv"] for r in out.collect()}
    assert got == {"near": 50.0, "far": None, "null-ts": None}
    assert out.count() == 3


def test_scd2_intervals_chain(spark):
    ev = spark.createDataFrame(
        [(1, _ts(0), "a"), (1, _ts(10), "b"), (1, _ts(20), "c"), (2, _ts(5), "x")],
        "k int, ts timestamp, v string",
    )
    out = {r["v"]: r for r in temporal.scd2_intervals(ev, ["k"], "ts").collect()}
    assert out["a"]["valid_from"] == _ts(0) and out["a"]["valid_to"] == _ts(10)
    assert out["b"]["valid_to"] == _ts(20) and not out["b"]["is_current"]
    assert out["c"]["valid_to"] is None and out["c"]["is_current"]
    assert out["x"]["valid_to"] is None and out["x"]["is_current"]
    # intervals tile the key's timeline: next valid_from == prior valid_to
    assert out["b"]["valid_from"] == out["a"]["valid_to"]


def test_sample_k_per_stratum_exact_and_stable(spark):
    from sonic_etl_spark.operators.curation import sample_k_per_stratum

    df = spark.createDataFrame(
        [(i, "big" if i < 100 else "small") for i in range(110)],
        "doc_id long, lang string",
    )
    out = sample_k_per_stratum(df, k=7)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert counts == {"big": 7, "small": 7}
    small_ids = {r["doc_id"] for r in out.where("lang = 'small'").collect()}
    assert small_ids <= set(range(100, 110))
    # partitioning-invariant: same members under a different layout
    out2 = sample_k_per_stratum(df.repartition(13), k=7)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in out2.collect()}
    # k beyond the stratum keeps the whole stratum
    alls = sample_k_per_stratum(df, k=500)
    assert alls.count() == 110
    with pytest.raises(ValueError, match="positive"):
        sample_k_per_stratum(df, k=0)


def test_mix_rates_temperature_and_waterfilling():
    from sonic_etl_spark.operators.curation import mix_rates

    counts = {"en": 8000, "de": 1000, "fr": 1000}
    # tau=1: proportional — every stratum keeps the same fraction
    r = mix_rates(counts, target_tokens=5000, temperature=1.0)
    assert all(abs(v - 0.5) < 1e-9 for v in r.values())
    # tau=0: equal split of the budget; small strata cap at 1.0 and their
    # leftover refills the big one (water-filling)
    r0 = mix_rates(counts, target_tokens=6000, temperature=0.0)
    assert r0["de"] == 1.0 and r0["fr"] == 1.0
    expected_en = (6000 - 2000) / 8000
    assert abs(r0["en"] - expected_en) < 1e-9
    # expected kept tokens hit the budget exactly
    kept = sum(r0[k] * counts[k] for k in counts)
    assert abs(kept - 6000) < 1e-6
    # budget beyond the corpus: keep everything
    assert mix_rates(counts, target_tokens=10**9) == {k: 1.0 for k in counts}
    # low temperature upweights low-resource strata
    r5 = mix_rates(counts, target_tokens=5000, temperature=0.5)
    assert r5["de"] > r5["en"]
    import pytest as _p
    with _p.raises(ValueError):
        mix_rates(counts, 0)
    assert mix_rates({}, 100) == {}


def test_equi_width_histogram_constant_column_single_bin(spark):
    # hi == lo used to throw ANSI DIVIDE_BY_ZERO (flag columns, single-day
    # slices); the contract is now ONE bin (0, lo, hi, n)
    const = spark.createDataFrame([(7.0,), (7.0,), (7.0,)], "v double")
    out = profile.equi_width_histogram(const, "v", n_bins=20).collect()
    assert [(r["bin_idx"], r["bin_lo"], r["bin_hi"], r["n_rows"]) for r in out] == [
        (0, 7.0, 7.0, 3)
    ]
    single = spark.createDataFrame([(42.0,)], "v double")
    out1 = profile.equi_width_histogram(single, "v", n_bins=5).collect()
    assert [(r["bin_idx"], r["n_rows"]) for r in out1] == [(0, 1)]
    # explicit degenerate bounds take the same path
    out2 = profile.equi_width_histogram(const, "v", n_bins=3, lo=7.0, hi=7.0).collect()
    assert [(r["bin_idx"], r["n_rows"]) for r in out2] == [(0, 3)]
    # empty input stays empty (no bounds row fabricated)
    assert profile.equi_width_histogram(const.where("v > 99"), "v").count() == 0


def test_asof_forward_null_ts_rows_never_match(spark):
    # plain desc() is desc_nulls_last: NULL-ts left rows used to sort AFTER
    # every right row and pick up the min-right_ts payload as a fabricated
    # forward match (r4 ADVICE). Contract: NULL left_ts never matches.
    left = spark.createDataFrame(
        [(1, _ts(10), "real"), (1, None, "null-ts")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(50), 50.0)], "k int, ts timestamp, rv double"
    )
    out = temporal.asof_join(
        left, right, on="k", left_ts="ts", right_cols=["rv"], direction="forward"
    )
    got = {r["tag"]: r["rv"] for r in out.collect()}
    assert got == {"real": 50.0, "null-ts": None}


def test_asof_null_right_ts_rows_are_dropped(spark):
    # a NULL right_ts row can never be the nearest match; if kept it sorts
    # to the NULLS-FIRST edge and is carried onto NULL-ts left rows as a
    # fabricated backward payload
    left = spark.createDataFrame(
        [(1, _ts(10), "real"), (1, None, "null-ts")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, None, 666.0), (1, _ts(5), 5.0)], "k int, ts timestamp, rv double"
    )
    for kwargs in ({}, {"direction": "forward"}, {"bucket_sec": 60.0}):
        out = temporal.asof_join(
            left, right, on="k", left_ts="ts", right_cols=["rv"], **kwargs
        )
        got = {r["tag"]: r["rv"] for r in out.collect()}
        want_real = 5.0 if "direction" not in kwargs else None
        assert got == {"real": want_real, "null-ts": None}, kwargs


def test_group_percentiles_max_group_rows_guard(spark):
    # exact mode buffers each group in executor memory; the opt-in guard
    # raises BEFORE the buffering aggregate instead of OOMing at 100×
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(50)] + [("cold", 1.0)],
        "g string, v double",
    )
    with pytest.raises(ValueError, match="approx=True"):
        profile.group_percentiles(df, "v", ["g"], max_group_rows=10)
    # under the cap: normal result; approx mode never runs the pre-pass
    ok = profile.group_percentiles(df, "v", ["g"], max_group_rows=100)
    assert ok.count() == 2
    ap = profile.group_percentiles(df, "v", ["g"], approx=True, max_group_rows=1)
    assert ap.count() == 2


def test_mix_rates_tau0_matches_sql_waterfilling_closed_form():
    """The corpus_mix driver gate derives τ=0 water-filled bounds in SQL via
    the sorted-prefix closed form (cap stratum j iff c_j·n_open ≤ budget
    after capping all smaller strata). Fuzz it against the iterative Python
    mix_rates over random count sets — the two must produce bit-identical
    2^60 integer bounds, or the gate's hash comparison would flip docs."""
    import random

    import duckdb

    from sonic_etl_spark.operators.curation import _sample_thresholds, mix_rates

    sql = """
WITH cnt AS (SELECT lang, c FROM counts WHERE c > 0),
tgt AS (SELECT {t} AS t),
ord AS (
  SELECT lang, c, count(*) OVER () AS n,
         row_number() OVER (ORDER BY c, lang) AS j,
         coalesce(sum(c) OVER (ORDER BY c, lang
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
  FROM cnt),
cap AS (SELECT ord.*, (c * (n - j + 1) <= t - pre) AS capped FROM ord, tgt),
agg AS (
  SELECT coalesce(sum(CASE WHEN capped THEN c END), 0) AS cap_sum,
         sum(CASE WHEN NOT capped THEN 1 ELSE 0 END) AS open_n
  FROM cap)
SELECT lang,
       CASE WHEN capped THEN CAST(1152921504606846976 AS BIGINT)
            ELSE CAST(round(((CAST(t - cap_sum AS DOUBLE) / open_n) / c)
                            * 1152921504606846976) AS BIGINT) END AS bound
FROM cap, tgt, agg
"""
    rng = random.Random(5)
    for trial in range(60):
        n = rng.randrange(1, 9)
        counts = {
            f"l{i}": rng.choice([1, 2, 5, 10, 99, 10**3, 10**6, 10**9])
            * rng.randrange(1, 50)
            for i in range(n)
        }
        total = sum(counts.values())
        t = max(1, total * rng.randrange(1, 100) // 100)
        want = _sample_thresholds(mix_rates(counts, t, temperature=0.0), 0.0)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE counts AS SELECT * FROM (VALUES "
            + ",".join(f"('{k}', {v}::BIGINT)" for k, v in counts.items())
            + ") _v(lang, c)"
        )
        got = dict(con.execute(sql.format(t=t)).fetchall())
        con.close()
        assert got == want, (trial, counts, t)
