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


def stream_interval_join(
    spark,
    left_dir: str,
    right_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    window_s: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    available_now: bool = True,
    delay: str = "0 seconds",
):
    """STREAM-STREAM event-time interval join — the attribution shape
    (every left event joined to the right events of the same key within
    ``[left.ts, left.ts + window_s]``), the remaining Structured
    Streaming operator class next to the windowed-agg trio: both sides
    carry watermarks, so left-side state evicts as soon as no future
    right event can satisfy the bound.

    ``delay`` is the watermark lateness allowance on BOTH sides. With
    the default ``"0 seconds"``, correctness requires each arrival chunk
    to be a single time-ordered micro-batch (one file per chunk, rows
    within a chunk no older than any prior chunk's max event time) —
    once the watermark advances, an out-of-order row in a LATER batch is
    silently dropped from the join state. Callers feeding multi-file or
    out-of-order sources must pass a delay covering their disorder bound
    (the gate callers enforce the one-file rule with coalesce(1)).

    INNER-join emission needs no watermark flush (pairs emit when the
    match arrives; the watermark only bounds state), so unlike the
    windowed gates no sentinel row is required. Completeness under
    time-split arrival chunks is exact: a left row old enough to be
    evicted (older than watermark − window) can only have matched right
    rows that already arrived — any later right row violates the time
    bound by construction. Restart-safe: join state lives in the
    checkpointed state store. Scale posture: state is bounded by the
    window (rows within ``window_s`` of the watermark), never history;
    the only shuffle is the stream-stream key co-partitioning.
    """
    left = (
        spark.readStream.schema(schema)
        .parquet(left_dir)
        .withWatermark(ts_col, delay)
        .alias("l")
    )
    right = (
        spark.readStream.schema(schema)
        .parquet(right_dir)
        .withWatermark(ts_col, delay)
        .alias("r")
    )
    joined = left.join(
        right,
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}"))
        & (
            F.col(f"r.{ts_col}")
            <= F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {int(window_s)} SECONDS")
        ),
        "inner",
    ).select(
        F.col(f"l.{key_col}").alias(key_col),
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        F.unix_micros(F.col(f"l.{ts_col}")).alias("left_us"),
        F.unix_micros(F.col(f"r.{ts_col}")).alias("right_us"),
    )
    writer = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_watermark(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    keys: list[str],
    ts_col: str = "ts",
    delay_s: int = 172800,
    available_now: bool = True,
):
    """Native streaming exactly-once admission:
    ``dropDuplicatesWithinWatermark`` keyed on ``keys`` — the Spark
    primitive for the reference's P2 dedup/resume contract (at-least-once
    CDC re-delivery suppressed at ingest; scylla-cdc-base
    ``WorkerThread``'s lastConsumedChangeId resume,
    scylla-cdc-lib/.../worker/Worker.java region). Rows emit in the
    batch they arrive (dedup holds no emission back); state holds one
    entry per key until the watermark passes its event time + delay.

    The suppression guarantee under a MONOTONE watermark is total for
    re-deliveries carrying their ORIGINAL event time: while the first
    occurrence is in state a duplicate is dropped as a duplicate, and
    once the state entry is evicted (event time + delay < watermark) any
    re-delivery is necessarily OLDER than the watermark itself and is
    dropped as late — so an admitted row is never emitted twice. The
    gate's oracle is therefore plain DISTINCT over the logical input.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    dedup = stream.withWatermark(ts_col, f"{int(delay_s)} seconds").dropDuplicatesWithinWatermark(
        keys
    )
    writer = (
        dedup.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_sessionize(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    available_now: bool = True,
):
    """STREAMING gap sessions: native ``session_window`` aggregation with
    a watermark, appended to parquet as sessions finalize — the
    continuous counterpart of :func:`sessionize`/:func:`session_stats`,
    with the SAME boundary convention: session windows merge when they
    overlap OR touch, so an event exactly ``gap`` after its predecessor
    still extends the session (split only on strictly-greater gaps —
    pinned by a pytest against a crafted ==gap event).

    Restart-safe: session state lives in the checkpointed state store, so
    a stop/restart mid-stream resumes half-open sessions and merges new
    events into them. Append mode emits each session exactly once, when
    the watermark passes its close; an end-of-feed sentinel event (far
    future, excluded downstream) is the standard way to flush the tail.
    Scale posture: state is keyed (user, window) and evicted at the
    watermark — memory is bounded by OPEN sessions, not history; the only
    shuffle is the session-window partial agg."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = (
        stream.withWatermark(ts_col, "0 seconds")
        .withColumn("__us", F.unix_micros(F.col(ts_col)))
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), f"{gap_s} seconds"),
        )
        .agg(
            F.min("__us").alias("start_us"),
            F.max("__us").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__tv"),
        )
        .select(
            user_col,
            "start_us",
            "end_us",
            "n_events",
            F.col("__tv").cast("double").alias("total_value"),
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_tumbling_agg(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    window_s: int = 86400,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    delay: str = "0 seconds",
    available_now: bool = True,
):
    """STREAMING tumbling-window aggregation (count + exact-decimal value
    sum per (window, key)) with a watermark, appended as windows close —
    the streaming twin of the batch tumbling-window gates. Windows are
    epoch-aligned (`F.window`), so the batch mirror is a plain
    floor-division grouping. Same restart/flush protocol as
    :func:`stream_sessionize`: checkpointed state resumes across a
    stop/restart; a far-future sentinel row advances the watermark so
    the tail windows emit in availableNow's no-data batch. State is one
    row per OPEN (window, key), evicted at the watermark. ``delay`` is
    the watermark lateness allowance: a row arriving after its window
    passed the watermark (window_end <= max_seen_event_time − delay at
    the START of its batch) is DROPPED — the deterministic admission
    rule the late-data gate's oracle replays."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = (
        stream.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), f"{window_s} seconds"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__tv"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            key_col,
            "n_events",
            F.col("__tv").cast("double").alias("total_value"),
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
