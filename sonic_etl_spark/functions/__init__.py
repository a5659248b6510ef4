from sonic_etl_spark.functions.codec import (
    RAW_PAYLOAD_SCHEMA,
    TYPED_COLUMNS,
    decode_change_events,
    hex_to_long_checked,
)

__all__ = [
    "RAW_PAYLOAD_SCHEMA",
    "TYPED_COLUMNS",
    "decode_change_events",
    "hex_to_long_checked",
]
