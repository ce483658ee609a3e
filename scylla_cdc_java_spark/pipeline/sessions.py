"""Sessionization: gap-based event sessions, the standard behavioral
grouping for activity streams (and the batch analog of a streaming
session window with gap timeout).

Native windows only. Timestamps flow as raw epoch-nanos longs (the
``<c>__ns`` column ``load_table`` keeps next to every converted
timestamp) so results are bit-portable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts__ns",
    order_col: str = "event_id",
    ticks_per_s: int = 1_000_000_000,
) -> DataFrame:
    """Assign every event a per-user ``session_idx``: a new session starts
    when the gap to the previous event of the same user exceeds ``gap_s``
    seconds. Equivalent to Structured Streaming's
    ``session_window(ts, gap)`` aggregation, expressed for batch.

    ``ts_col`` is an integer tick count with ``ticks_per_s`` resolution
    (default: the raw epoch-nanos ``ts__ns``; pass 1_000_000 for micros).

    Scale posture: one shuffle (partition by user), two windows over the
    same (user, ts, id) sort — Spark reuses the sort. Per-user event
    counts are the skew bound, not total volume.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    gap_ticks = F.lit(int(gap_s) * int(ticks_per_s))
    prev = F.lag(ts_col).over(w)
    new_sess = (
        prev.isNull() | (F.col(ts_col) - prev > gap_ticks)
    ).cast("int")
    run = Window.partitionBy(user_col).orderBy(ts_col, order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("__new", new_sess).withColumn(
        "session_idx", F.sum("__new").over(run).cast("int")
    ).drop("__new")


def session_stats(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts__ns",
    ticks_per_s: int = 1_000_000_000,
) -> DataFrame:
    """Per-session rollup: event count, span bounds and duration."""
    return sessions.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ticks"),
        F.max(ts_col).alias("end_ticks"),
        ((F.max(ts_col) - F.min(ts_col)) / F.lit(int(ticks_per_s)))
        .cast("long")
        .alias("duration_s"),
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts__ns",
) -> DataFrame:
    """Ordered-step funnel: for each user, the earliest strictly-increasing
    completion time of each step — step i counts only after the user's
    step i-1 time (the standard product-analytics funnel, not a bag of
    independent mins).

    One conditional aggregation per step over the SAME keyed pass: step
    1's time is min(ts | type = s1); step i's is min(ts | type = s_i and
    ts > t_{i-1}), computed by re-aggregating the (tiny) per-user frame.
    len(steps) small aggregations, each one shuffle on the user key with
    map-side partials; no window over the raw stream, no self-join of the
    event log.
    """
    cur = df.where(F.col(type_col) == steps[0]).groupBy(user_col).agg(
        F.min(ts_col).alias("t_1")
    )
    for i, s in enumerate(steps[1:], start=2):
        nxt = (
            df.where(F.col(type_col) == s)
            .join(cur, user_col)
            .where(F.col(ts_col) > F.col(f"t_{i - 1}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        cur = cur.join(nxt, user_col, "left")
    return cur
