"""TIMEUUID (UUID v1) event-time functions.

Semantics match the reference (scylla-cdc-java):

* F1 timeuuid -> epoch microseconds: ``(uuid60bitTimestamp - 0x01b21dd213814000) / 10``
  (reference: scylla-cdc-base/.../model/worker/ChangeTime.java:20-22).
* F2 epoch-ms window bounds ``startOf``/``endOf`` with the min/max
  clock-seq-and-node constants and version bits forced to 1
  (reference: scylla-cdc-base/.../model/worker/TimeUUID.java:29-66).

The decode (F1) is also provided as a *native* Spark column expression —
string slicing + base-16 conversion, fully inside whole-stage codegen, so
it runs JVM-side at 100 TB scale with no Python in the loop.
"""

from __future__ import annotations

import uuid as _uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

# 100-ns ticks between 1582-10-15 (UUID v1 epoch) and 1970-01-01 (Unix epoch).
GREGORIAN_OFFSET_100NS = 0x01B21DD213814000

# Min/max "clock sequence and node" halves used for synthetic window-bound
# UUIDs (TimeUUID.java:31-32). Interpreted as signed 64-bit values these are
# the smallest/largest lsb when UUIDs compare byte-wise per CQL timeuuid order.
MIN_CLOCK_SEQ_AND_NODE = 0x8080808080808080
MAX_CLOCK_SEQ_AND_NODE = 0x7F7F7F7F7F7F7F7F


def timeuuid_micros(u: str | _uuid.UUID) -> int:
    """Pure-Python F1: canonical v1 UUID -> epoch microseconds."""
    if isinstance(u, str):
        u = _uuid.UUID(u)
    return (u.time - GREGORIAN_OFFSET_100NS) // 10


def _msb_from_ticks(ticks: int) -> int:
    """Scatter a 60-bit tick count into the UUID v1 msb layout, version=1."""
    msb = 0
    msb |= (ticks & 0x00000000FFFFFFFF) << 32
    msb |= (ticks & 0x0000FFFF00000000) >> 16
    msb |= (ticks & 0x0FFF000000000000) >> 48
    msb |= 0x0000000000001000
    return msb


def _uuid_from_halves(msb: int, lsb: int) -> _uuid.UUID:
    return _uuid.UUID(int=((msb & 0xFFFFFFFFFFFFFFFF) << 64) | (lsb & 0xFFFFFFFFFFFFFFFF))


def make_timeuuid(micros: int, clock_seq_and_node: int = 0) -> _uuid.UUID:
    """Build a deterministic v1 UUID from epoch-µs + explicit lsb.

    Forces the RFC-4122 variant bits (``10``) on the lsb so the result is a
    well-formed v1 UUID. Used by the CDC-log generator in tests; inverse of
    ``timeuuid_micros``.
    """
    ticks = micros * 10 + GREGORIAN_OFFSET_100NS
    lsb = (clock_seq_and_node & 0x3FFFFFFFFFFFFFFF) | 0x8000000000000000
    return _uuid_from_halves(_msb_from_ticks(ticks), lsb)


def start_of_ms(ms: int) -> _uuid.UUID:
    """F2: smallest timeuuid for wall-clock millisecond ``ms``."""
    ticks = ms * 10000 + GREGORIAN_OFFSET_100NS
    return _uuid_from_halves(_msb_from_ticks(ticks), MIN_CLOCK_SEQ_AND_NODE)


def end_of_ms(ms: int) -> _uuid.UUID:
    """F2: largest timeuuid for wall-clock millisecond ``ms``.

    Uses ``ticks(ms + 1) - 1`` so adjacent windows do not overlap by 1 ms
    (the reference 1.1.0 fix, TaskState.java:48-51).
    """
    ticks = (ms + 1) * 10000 + GREGORIAN_OFFSET_100NS - 1
    return _uuid_from_halves(_msb_from_ticks(ticks), MAX_CLOCK_SEQ_AND_NODE)


def timeuuid_micros_col(col: Column | str) -> Column:
    """Native-expression F1: canonical UUID string column -> epoch-µs LongType.

    A canonical v1 UUID is ``LLLLLLLL-MMMM-1HHH-....``; the 60-bit timestamp
    is ``HHH << 48 | MMMM << 32 | LLLLLLLL``. We reassemble those 15 hex chars
    and convert base-16 -> base-10 with ``conv`` — no UDF, codegen-friendly.
    """
    c = F.col(col) if isinstance(col, str) else col
    hex60 = F.concat(F.substring(c, 16, 3), F.substring(c, 10, 4), F.substring(c, 1, 8))
    # 60-bit tick counts exceed double's 53-bit mantissa, so divide in
    # decimal (exact) rather than with the default double-typed `/`.
    ticks = F.conv(hex60, 16, 10).cast("decimal(20,0)")
    return ((ticks - F.lit(GREGORIAN_OFFSET_100NS)) / F.lit(10)).cast("long")


def timeuuid_ts_col(col: Column | str) -> Column:
    """F1 continued: UUID string column -> TimestampType (µs precision)."""
    return F.timestamp_micros(timeuuid_micros_col(col))
