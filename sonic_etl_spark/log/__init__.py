from sonic_etl_spark.log.synthesis import CHANGE_EVENT_COLUMNS, synthesize_change_events

__all__ = ["synthesize_change_events", "CHANGE_EVENT_COLUMNS"]
