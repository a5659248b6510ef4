"""Long-chain compaction evidence: does `compact_threshold` actually bound
the reader on a replay long enough to trigger it?

BENCH.md's policy sweep runs 10-batch chains, where the default threshold
(16) deliberately never fires. This leg replays ≥256 micro-batches so the
threshold fires ~n_batches/16 times mid-replay, then asserts the
merge-on-read invariant the default exists for: files/bucket stays ≤ 16 at
the end of an arbitrarily long chain, while converged reads stay flat
instead of degrading linearly with replay length.

Usage:  python tools/bench_longchain.py [n_batches=256] [chunk=500]
Prints one JSON line:
  {"n_batches": ..., "replay_wall_sec": ..., "events_per_sec": ...,
   "compactions_fired": ..., "max_files_per_bucket": ...,
   "converged_read_sec": ..., "converged_rows": ...}
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from sonic_etl_spark.log import synthesize_change_events  # noqa: E402
from sonic_etl_spark.session import get_spark  # noqa: E402
from sonic_etl_spark.sources import TransactionalParquetTable  # noqa: E402
from sonic_etl_spark.streaming import replay  # noqa: E402

N_LOG_PARTITIONS = 8
THRESHOLD = 16


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    events = n_batches * chunk * N_LOG_PARTITIONS

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    ev = synthesize_change_events(
        spark, events, n_partitions=N_LOG_PARTITIONS
    ).cache()
    ev.count()

    root = tempfile.mkdtemp(prefix="longchain_")
    try:
        tab = TransactionalParquetTable(spark, f"{root}/tab", n_buckets=8)
        t0 = time.time()
        res = replay(
            ev, tab, chunk_size=chunk, compact_threshold=THRESHOLD,
        )
        wall = time.time() - t0
        assert res.batches_applied == n_batches, (
            f"expected {n_batches} batches, applied {res.batches_applied}"
        )

        fired = sum(
            1 for s in tab.history() if "compaction" in s.get("metrics", {})
        )
        files = tab.files_per_bucket()
        max_files = max(files.values())
        # the invariant the default threshold exists for: however long the
        # chain, no bucket's delta chain exceeds the threshold post-batch
        assert max_files <= THRESHOLD, (
            f"reader unbounded: {max_files} files in a bucket > {THRESHOLD}"
        )
        assert fired >= n_batches // THRESHOLD - 1, (
            f"threshold fired only {fired}× over {n_batches} batches"
        )

        r0 = time.time()
        converged_rows = tab.read().count()
        read_sec = time.time() - r0

        print(json.dumps({
            "n_batches": n_batches,
            "events": events,
            "replay_wall_sec": round(wall, 1),
            "events_per_sec": round(events / wall, 1),
            "compactions_fired": fired,
            "max_files_per_bucket": max_files,
            "converged_read_sec": round(read_sec, 2),
            "converged_rows": converged_rows,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
