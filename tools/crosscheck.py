"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, compares row counts, column names/types (loosely), and
order-insensitive values (columns sorted by name, rows sorted, floats via
repr). Usage:  python tools/crosscheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from sonic_etl_spark.driver_queries import QUERIES  # noqa: E402
from sonic_etl_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_rows(cols, rows):
    def norm(v):
        if isinstance(v, float):
            return f"{v:.9g}"
        if isinstance(v, bool):
            return str(v)
        return str(v)

    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("crosscheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = 0
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if sql is None:
            print(f"ok    {name}: rows-only, {len(s_rows)} rows "
                  f"({time.time()-t0:.1f}s)")
            if not s_rows:
                print(f"WARN  {name}: empty result")
            continue
        try:
            cur = con.execute(sql)
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL  {name}: columns {sorted(s_cols)} vs {sorted(d_cols)}")
            failures += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL  {name}: rowcount {len(s_rows)} vs {len(d_rows)}")
            failures += 1
            continue
        sn, dn = norm_rows(s_cols, s_rows), norm_rows(d_cols, d_rows)
        if sn != dn:
            bad = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {bad}")
            failures += 1
            continue
        print(f"ok    {name}: {len(s_rows)} rows match ({time.time()-t0:.1f}s)")
        if not s_rows:
            print(f"WARN  {name}: empty result (weak check)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
