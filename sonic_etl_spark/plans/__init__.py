from sonic_etl_spark.plans.planner import chunk_range, plan_batches

__all__ = ["chunk_range", "plan_batches"]
