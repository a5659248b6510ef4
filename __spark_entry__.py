"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship LWW-convergence query on sf0.001;
``queries``/``oracle_sql`` expose every implemented operator family from
SURVEY.md §2 plus the training-data-pipeline extensions (dedup, similarity,
text analysis, multimodal), each backed by a DuckDB oracle where the
semantics are SQL-expressible (see sonic_etl_spark/driver_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sonic_etl_spark.driver_queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: last-writer-wins
    convergence of the events change feed (the engine's merge-apply shape).

    Side effect by design: materializes the synthesized change logs the
    CDC/fanout oracles read (per-process mkdtemp parquet paths baked into
    the oracle SQL at import), so those DuckDB oracles are valid
    regardless of the driver's per-query ordering."""
    from sonic_etl_spark.driver_queries import (
        CDC_LOG_PATH,
        POISON_LOG_PATH,
        _materialize_log,
    )

    _materialize_log(spark, CDC_LOG_PATH)
    _materialize_log(spark, POISON_LOG_PATH, poison_fraction=0.05)
    fn, _ = QUERIES["lww_converge"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family (SURVEY.md §2)."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — since r4 EVERY query has one
    (56/56): the two mapInPandas media-codec stages replay in SQL too,
    because the stub codec's byte-sum math is reconstructible from
    hex(payload) nibble pairs. The CDC replay/fanout queries materialize
    their synthesized log to parquet and the SQL replays it
    independently."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
