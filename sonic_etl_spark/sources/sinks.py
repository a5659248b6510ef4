"""Auxiliary sinks: time-bucketed JSONL export (S10 analog).

The reference's GCS sink buckets output files into ``YYYY-MM-DD/H/{00|30}/``
directories by record timestamp (src/output/gcs.rs:99-115), giving
time-pruned consumption downstream. Spark-first restatement: a partitioned
write on derived (date, half-hour) columns — partition pruning then serves
the same time-window reads the reference's directory layout served, and the
writer is one distributed job instead of a per-batch upload loop (the
infinite-retry upload loop, gcs.rs:127-156, becomes Spark task retries).

JSONL-per-fixture is also the reference's golden format
(save_range, mod.rs:577-616); ``write_jsonl_fixture`` mirrors that for test
goldens.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_time_bucketed_jsonl(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    max_records_per_file: int = 500_000,
) -> None:
    """Write df as JSONL partitioned by (date, half-hour bucket) of ts_col."""
    bucketed = df.withColumn("_d", F.date_format(F.col(ts_col), "yyyy-MM-dd")).withColumn(
        "_hh",
        F.concat(
            F.date_format(F.col(ts_col), "HH"),
            F.when(F.minute(F.col(ts_col)) < 30, F.lit("-00")).otherwise(F.lit("-30")),
        ),
    )
    (
        bucketed.write.partitionBy("_d", "_hh")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .mode("overwrite")
        .json(path)
    )


def read_time_bucketed_jsonl(spark, path: str) -> DataFrame:
    """Read back a bucketed export; partition columns restored as strings."""
    return spark.read.json(path)


def write_jsonl_fixture(df: DataFrame, path: str) -> None:
    """Single-file JSONL golden (deterministic order by all columns)."""
    df.orderBy(*df.columns).coalesce(1).write.mode("overwrite").json(path)
