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
    """Exact dedup on change identity; falls back to the derived event time
    for sources that don't carry the raw timeuuid string."""
    cols = [c if c != "cdc$time" or c in df.columns else TIME_MICROS for c in CHANGE_ID_COLS]
    if "cdc$time" not in df.columns:
        df = normalize_changes(df)
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
