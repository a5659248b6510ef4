"""Local mimic of the driver's correctness gate — dtype-faithful.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir and compares the two results AFTER pandas conversion
(Spark ``toPandas()`` vs DuckDB ``.df()``), because that is the layer the
driver canonicalizes through before hashing. Two failure classes that a
post-DBAPI ``str()`` comparison is blind to — and that cost rounds 2 and 3 —
are visible only here:

- DuckDB HUGEINT (``sum(BIGINT)``) → pandas **float64** (``150.0``) while
  Spark's long stays int64 (``150``);
- DuckDB DECIMAL → pandas **float64** (``30958720.3``) while Spark keeps
  ``Decimal('30958720.30')`` — trailing-zero rendering diverges.

So: columns sorted by name, rows sorted, every cell rendered with ``str()``
*as the pandas dtype delivers it* (no normalization), plus a per-column
dtype comparison. A dtype divergence between numeric kinds is a FAIL even if
the rendered values happen to agree on this sf.

Usage:  python tools/crosscheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from sonic_etl_spark.driver_queries import QUERIES  # noqa: E402
from sonic_etl_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _render(v):
    """str() of the pandas-delivered value — deliberately NOT normalized, so
    Decimal('1.30') vs float 1.3 (and int 1 vs float 1.0) stay distinct,
    exactly like the driver's value hash. Only containers are canonicalized
    (ndarray vs list vs tuple → same rendering, elementwise str)."""
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_render(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{_render(v[k])}" for k in sorted(v)) + "}"
    if v is None or (isinstance(v, float) and v != v):
        return "<null>"
    if v is pd.NaT or v is pd.NA:
        return "<null>"
    return str(v)


def canon_frame(df: pd.DataFrame):
    """(sorted dtype list, sorted rendered rows) for a pandas frame."""
    cols = sorted(df.columns)
    df = df[cols]
    dtypes = [str(df[c].dtype) for c in cols]
    rows = sorted(
        tuple(_render(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return cols, dtypes, rows


def _dtype_kind(dt: str) -> str:
    if dt.startswith(("int", "uint")):
        return "int"
    if dt.startswith("float"):
        return "float"
    if dt.startswith(("datetime", "timedelta")):
        return "time"
    if dt == "bool":
        return "bool"
    return "object"


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
            s_pd = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if sql is None:
            print(f"ok    {name}: rows-only, {len(s_pd)} rows "
                  f"({time.time()-t0:.1f}s)")
            if not len(s_pd):
                print(f"WARN  {name}: empty result")
            continue
        try:
            d_pd = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        s_cols, s_dtypes, s_rows = canon_frame(s_pd)
        d_cols, d_dtypes, d_rows = canon_frame(d_pd)
        if s_cols != d_cols:
            print(f"FAIL  {name}: columns {s_cols} vs {d_cols}")
            failures += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL  {name}: rowcount {len(s_rows)} vs {len(d_rows)}")
            failures += 1
            continue
        kind_bad = [
            (c, sd, dd)
            for c, sd, dd in zip(s_cols, s_dtypes, d_dtypes)
            if _dtype_kind(sd) != _dtype_kind(dd)
        ]
        if kind_bad:
            print(f"FAIL  {name}: pandas dtype divergence "
                  f"(col, spark, duckdb): {kind_bad}")
            failures += 1
            continue
        if s_rows != d_rows:
            bad = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
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
