from sonic_etl_spark.sources.table import TransactionalParquetTable

__all__ = ["TransactionalParquetTable"]
