"""Hot-key as-of join: default single-window plan vs bucket_sec prefix-scan.

The default asof_join window serializes each key into one task — correct
and cheap for well-distributed keys, pathological for a hot key. This leg
measures the regime the bucket_sec decomposition exists for: ONE key
holding the entire input.

Workload: 2M left events + 200k right versions, all under a single join
key, timestamps uniform over ~11.5 days; bucket_sec=3600 splits the hot
key into ~278 hour-buckets. Results are asserted identical (exceptAll both
ways) before timing. Best-of-N wall per plan (host noise: see BENCH.md).

Usage: python tools/bench_asof_skew.py  →  one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from sonic_etl_spark.operators.temporal import asof_join  # noqa: E402
from sonic_etl_spark.session import get_spark  # noqa: E402

N_LEFT = int(os.environ.get("SPARK_GRAFT_ASOF_LEFT", "2000000"))
N_RIGHT = 200_000
SPAN_SEC = 1_000_000
BUCKET_SEC = 3600.0
ATTEMPTS = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "2"))
# 'backward' (default) or 'forward' — the r5 mirror prefix scan measures
# in the same hot-key regime with the same equality-before-timing gate
DIRECTION = os.environ.get("SPARK_GRAFT_ASOF_DIRECTION", "backward")


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench-asof-skew", master=f"local[{cpus}]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic hot-key workload (pure function of the row id)
    left = spark.range(N_LEFT).select(
        F.lit(0).alias("k"),
        F.timestamp_seconds(
            (F.xxhash64("id", F.lit(1)) % SPAN_SEC + SPAN_SEC) % SPAN_SEC
        ).alias("ts"),
        F.col("id").alias("uid"),
    )
    # right: unique ts per key (dense seconds 0,5,10,... — one version per 5s)
    right = spark.range(N_RIGHT).select(
        F.lit(0).alias("k"),
        F.timestamp_seconds(F.col("id") * (SPAN_SEC // N_RIGHT)).alias("ts"),
        F.col("id").cast("double").alias("rv"),
    )

    plans = {
        "default_single_window": dict(bucket_sec=None),
        f"bucketed_{int(BUCKET_SEC)}s": dict(bucket_sec=BUCKET_SEC),
    }

    # correctness first: both plans byte-identical on this workload
    a = asof_join(left, right, on="k", left_ts="ts", right_cols=["rv"],
                  direction=DIRECTION)
    b = asof_join(
        left, right, on="k", left_ts="ts", right_cols=["rv"],
        direction=DIRECTION, bucket_sec=BUCKET_SEC,
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    out = {"metric": f"asof_hotkey_{DIRECTION}_left_{N_LEFT}_right_{N_RIGHT}",
           "cpus": int(cpus), "direction": DIRECTION,
           "rows_left": N_LEFT, "rows_right": N_RIGHT, "plans": {}}
    for name, kw in plans.items():
        walls = []
        for _ in range(ATTEMPTS):
            t0 = time.time()
            n = asof_join(
                left, right, on="k", left_ts="ts", right_cols=["rv"],
                direction=DIRECTION, **kw
            ).where(F.col("rv").isNotNull()).count()
            walls.append(round(time.time() - t0, 2))
        out["plans"][name] = {"wall_sec": min(walls), "attempts": walls,
                              "matched_rows": n}
    d = out["plans"]["default_single_window"]["wall_sec"]
    bkt = out["plans"][f"bucketed_{int(BUCKET_SEC)}s"]["wall_sec"]
    out["speedup_bucketed_vs_default"] = round(d / bkt, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
