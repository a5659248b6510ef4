from sonic_etl_spark.streaming.monitor import ReplayMonitor
from sonic_etl_spark.streaming.replay import ReplayResult, replay

__all__ = ["replay", "ReplayResult", "ReplayMonitor"]
