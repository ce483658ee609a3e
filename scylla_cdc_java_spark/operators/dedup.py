"""Dedup / resume filtering (P2).

The reference re-reads a window after failure and client-side-skips rows
with ``ChangeId <= lastConsumedChangeId`` (Driver3WorkerCQL.java:162-173);
at-least-once delivery means duplicate change rows can also appear across
restarts. Batch engine equivalents:

* ``dedup_changes`` — exact dedup on the change identity
  (stream, time, batch_seq_no); a map-side-combinable ``dropDuplicates``.
* ``resume_filter`` — cursor predicate for one stream's saved TaskState;
  pushed down to the scan (it's a plain comparison on scan columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model.state import TaskState
from .normalize import TIME_MICROS, normalize_changes

CHANGE_ID_COLS = ["cdc$stream_id", "cdc$time", "cdc$batch_seq_no"]


def dedup_changes(df: DataFrame) -> DataFrame:
    """Exact dedup on change identity, keyed on the DERIVED event time
    (``cdc$time_micros``) — the same (time, seq) ChangeId the apply
    kernel's in-fold dedup uses, so the layers agree.

    Never key on the raw ``cdc$time`` string: a frame read under the
    descriptor's wire schema null-fills envelope columns its files lack,
    and an all-NULL ``cdc$time`` would collapse every change in a stream
    that shares a ``batch_seq_no`` into one "duplicate" (found by the
    round-6 composed streaming gate, where a synthetic log with seq=0
    lost 97% of its rows; the events-based gates masked it because their
    seq is the unique event id). ``normalize_changes`` derives the micros
    column from ``cdc$time_ts`` when present, else from the timeuuid.

    A row whose derived time is STILL null (both ``cdc$time`` and
    ``cdc$time_ts`` absent/null) has no ChangeId identity at all, and
    ``dropDuplicates`` groups NULL keys together — so rather than
    silently collapsing such rows we fail the job with a per-row
    ``raise_error`` guard (lazy, distributed; no driver-side count)."""
    df = normalize_changes(df)
    df = df.withColumn(
        TIME_MICROS,
        F.when(
            F.col(TIME_MICROS).isNull(),
            F.raise_error(
                F.lit(
                    "dedup_changes: row with no derivable change time "
                    "(cdc$time and cdc$time_ts both null) — refusing to "
                    "dedup on a NULL ChangeId key, which would collapse "
                    "distinct changes into one"
                )
            ).cast("long"),
        ).otherwise(F.col(TIME_MICROS)),
    )
    cols = [TIME_MICROS if c == "cdc$time" else c for c in CHANGE_ID_COLS]
    return df.dropDuplicates(cols)


def resume_filter(df: DataFrame, state: TaskState) -> DataFrame:
    """Keep only changes strictly after the saved cursor.

    ChangeId order is (time, then stream id); within one stream the cursor
    reduces to a time comparison with batch_seq as tiebreak at equal time.
    """
    last_micros = state.last_consumed_micros()
    if last_micros is None:
        return df
    df = normalize_changes(df)
    return df.where(F.col(TIME_MICROS) > F.lit(last_micros))
