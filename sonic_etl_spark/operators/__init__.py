from sonic_etl_spark.operators.merge import SOURCE_CODE_FIELDS, reduce_batch

__all__ = ["reduce_batch", "SOURCE_CODE_FIELDS"]
