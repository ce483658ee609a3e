from .timeuuid import (
    GREGORIAN_OFFSET_100NS,
    end_of_ms,
    make_timeuuid,
    start_of_ms,
    timeuuid_micros,
    timeuuid_micros_col,
    timeuuid_ts_col,
)
from .streamid import (
    make_stream_id,
    stream_id_hex_col,
    vnode_from_stream_id,
    vnode_col,
)
from .render import format_cql_date, format_cql_duration
from .retry import ExponentialRetryBackoffWithJitter

__all__ = [
    "GREGORIAN_OFFSET_100NS",
    "end_of_ms",
    "make_timeuuid",
    "start_of_ms",
    "timeuuid_micros",
    "timeuuid_micros_col",
    "timeuuid_ts_col",
    "make_stream_id",
    "stream_id_hex_col",
    "vnode_from_stream_id",
    "vnode_col",
    "format_cql_date",
    "format_cql_duration",
    "ExponentialRetryBackoffWithJitter",
]
