"""asof_join vs pandas.merge_asof — independent-reference property check.

pandas implements the same backward-inclusive as-of semantics (and an
inclusive tolerance); random seeded workloads must agree exactly, for BOTH
physical plans (default single-window and the bucket_sec prefix-scan
decomposition). This is the third independent implementation the operator
is held against (DuckDB ASOF JOIN being the driver-gate one)."""

import datetime as dt
import random

import pandas as pd

from sonic_etl_spark.operators import temporal

BASE = dt.datetime(2024, 1, 1)


def _t(s: float) -> dt.datetime:
    return BASE + dt.timedelta(seconds=s)


def test_asof_matches_pandas_merge_asof(spark):
    for seed in range(6):
        rng = random.Random(seed)
        left = [
            (k, _t(rng.randrange(0, 500)), i)
            for i, k in enumerate(rng.choices([1, 2, 3], k=rng.randrange(1, 15)))
        ]
        right = []
        for k in (1, 2, 3):
            for ts in rng.sample(range(0, 500), rng.randrange(0, 10)):
                right.append((k, _t(ts), float(ts)))
        if not right:
            right.append((1, _t(0), 0.0))
        tol = rng.choice([None, 50])

        lp = pd.DataFrame(left, columns=["k", "ts", "uid"])
        rp = pd.DataFrame(right, columns=["k", "ts", "rv"])
        m = pd.merge_asof(
            lp.sort_values("ts"),
            rp.sort_values("ts"),
            on="ts",
            by="k",
            direction="backward",
            tolerance=pd.Timedelta(seconds=tol) if tol is not None else None,
        )
        want = {
            row.uid: (None if pd.isna(row.rv) else row.rv)
            for row in m.itertuples()
        }

        ldf = spark.createDataFrame(left, "k int, ts timestamp, uid int")
        rdf = spark.createDataFrame(right, "k int, ts timestamp, rv double")
        for bucket in (None, 120.0):
            out = temporal.asof_join(
                ldf, rdf, on="k", left_ts="ts", right_cols=["rv"],
                tolerance_sec=tol, bucket_sec=bucket,
            )
            got = {r["uid"]: r["rv"] for r in out.collect()}
            assert got == want, (seed, bucket, tol)


def test_asof_forward_matches_pandas_merge_asof(spark):
    """direction='forward' (next-event attribution), both physical plans:
    default single-window and the bucket_sec mirror prefix scan."""
    for seed in range(6):
        rng = random.Random(1000 + seed)
        left = [
            (k, _t(rng.randrange(0, 500)), i)
            for i, k in enumerate(rng.choices([1, 2, 3], k=rng.randrange(1, 15)))
        ]
        right = []
        for k in (1, 2, 3):
            for ts in rng.sample(range(0, 500), rng.randrange(0, 10)):
                right.append((k, _t(ts), float(ts)))
        if not right:
            right.append((1, _t(0), 0.0))
        tol = rng.choice([None, 50])

        lp = pd.DataFrame(left, columns=["k", "ts", "uid"])
        rp = pd.DataFrame(right, columns=["k", "ts", "rv"])
        m = pd.merge_asof(
            lp.sort_values("ts"),
            rp.sort_values("ts"),
            on="ts",
            by="k",
            direction="forward",
            tolerance=pd.Timedelta(seconds=tol) if tol is not None else None,
        )
        want = {
            row.uid: (None if pd.isna(row.rv) else row.rv)
            for row in m.itertuples()
        }

        ldf = spark.createDataFrame(left, "k int, ts timestamp, uid int")
        rdf = spark.createDataFrame(right, "k int, ts timestamp, rv double")
        for bucket in (None, 120.0):
            out = temporal.asof_join(
                ldf, rdf, on="k", left_ts="ts", right_cols=["rv"],
                direction="forward", tolerance_sec=tol, bucket_sec=bucket,
            )
            got = {r["uid"]: r["rv"] for r in out.collect()}
            assert got == want, (seed, bucket, tol)
