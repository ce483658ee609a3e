"""Bucketed interval (range-containment) join — the other range operator
Spark's DataFrame API lacks natively (the companion to ``asof.py``).

``interval_join(points, intervals)`` attaches to every point row the
interval rows whose half-open ``[start, end)`` contains the point's
timestamp. A naive formulation is a theta join (``start <= ts AND ts <
end``), which Spark can only plan as a nested-loop over the cross
product — O(|points| x |intervals|) at any scale.

The bucketed rewrite is the standard distributed answer (the same
binning Databricks' range-join optimization performs internally):

1. each interval explodes to the fixed-width time buckets it covers
   (``floor(start/w) .. floor((end-1)/w)``) — output rows ~
   ``|intervals| x avg_len/w``;
2. each point computes its single bucket ``floor(ts/w)``;
3. an equi-join on the bucket id co-locates every possibly-matching
   pair, and the exact containment predicate filters residuals.

Every matching (point, interval) pair joins on EXACTLY one bucket — the
point's own — so no post-join dedup is needed. Pick ``bucket_width``
around the median interval length: wider buckets explode fewer interval
rows but pull more non-matching candidates through the join; at 100 TB
both sides shuffle once on an 8-byte key either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: int = 3_600_000_000,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to the interval rows containing its timestamp.

    ``ts_col``/``start_col``/``end_col`` are integer columns in the same
    unit (the engine's convention: epoch micros); intervals are half-open
    ``[start, end)``. ``how`` is ``inner`` (only covered points) or
    ``left`` (keep uncovered points with null interval columns).
    Ambiguity: a point inside several overlapping intervals yields one
    output row per covering interval.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    w = int(bucket_width)
    # degenerate/inverted intervals (end <= start) must explode to zero
    # bucket rows: F.sequence steps DOWNWARD when stop < start, so an
    # unguarded corrupt row would emit spurious buckets (or abort the job
    # on the sequence-length cap for a large inverted gap) — same hazard
    # text.shingle_array guards against
    iv = intervals.withColumn(
        "__bkt",
        F.explode(
            F.when(
                F.col(end_col) > F.col(start_col),
                F.sequence(
                    (F.col(start_col) / F.lit(w)).cast("long"),
                    ((F.col(end_col) - 1) / F.lit(w)).cast("long"),
                ),
            ).otherwise(F.array().cast("array<long>"))
        ),
    )
    pt = points.withColumn("__bkt", (F.col(ts_col) / F.lit(w)).cast("long"))
    cond = (F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col))
    joined = pt.join(iv, ["__bkt"], "inner").where(cond).drop("__bkt")
    if how == "inner":
        return joined
    # left: re-attach uncovered points with null interval columns
    matched_keys = joined.select(*points.columns)
    missing = pt.drop("__bkt").exceptAll(matched_keys)
    for c in intervals.columns:
        missing = missing.withColumn(c, F.lit(None).cast(dict(iv.dtypes)[c]))
    return joined.unionByName(missing)
