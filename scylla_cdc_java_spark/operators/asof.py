"""As-of (time-travel) join — the point-in-time lookup operator Spark's
DataFrame API lacks natively.

For every left row, attach the single right row with the same key and the
latest ``ts <= left.ts`` (``backward``, inclusive — the semantics of
DuckDB/pandas ``ASOF JOIN``) or the earliest ``ts >= left.ts``
(``forward``). CDC context: this is "the replicated row's state as of the
change's timestamp" generalized to any keyed timeline.

Implementation is the union + running-window trick, NOT a range join:
tag both inputs, union them, and carry the last-seen right-row payload
over a (key, ts) sort. One shuffle on the key, no row blowup, no
O(|left| x |right|) candidate pairs — the plan a range-join rewrite would
only reach after interval binning, delivered in one window pass. Skew
bound is events-per-key (same as any keyed window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    direction: str = "backward",
    tolerance: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join. All non-key, non-ts right columns are attached
    (nulled when no match); the matched right timestamp arrives as
    ``{ts_col}{suffix}``. ``tolerance`` (same units as ``ts_col``, which
    must be numeric) nulls matches farther than the bound, as in
    ``pandas.merge_asof``.

    Right rows must be unique per (key, ts) — pre-aggregate otherwise
    (the result would be tie-ambiguous in ANY engine).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rv = [c for c in right.columns if c not in on and c != ts_col]
    # Pack the whole right payload into ONE struct so the window fill can
    # never mix columns from different right rows (a per-column
    # last(ignorenulls) would, whenever a right value is legitimately null).
    r2 = right.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.struct(F.col(ts_col).alias("__rts"), *[F.col(c) for c in rv]).alias("__rv"),
        F.lit(0).alias("__side"),
    )
    l2 = left.withColumn("__ts", F.col(ts_col)).withColumn(
        "__rv", F.lit(None).cast(r2.schema["__rv"].dataType)
    )
    if direction == "backward":
        # right (side 0) sorts before left at equal ts -> inclusive match
        l2 = l2.withColumn("__side", F.lit(1))
        w = (
            Window.partitionBy(*on)
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = F.last("__rv", ignorenulls=True).over(w)
        in_tol = (
            None
            if tolerance is None
            else (F.col("__ts") - F.col("__m.__rts") <= F.lit(tolerance))
        )
    else:
        # left (side 0) sorts before right at equal ts -> inclusive match
        l2 = l2.withColumn("__side", F.lit(0))
        r2 = r2.withColumn("__side", F.lit(1))
        w = (
            Window.partitionBy(*on)
            .orderBy("__ts", "__side")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        filled = F.first("__rv", ignorenulls=True).over(w)
        in_tol = (
            None
            if tolerance is None
            else (F.col("__m.__rts") - F.col("__ts") <= F.lit(tolerance))
        )
    u = l2.unionByName(r2.withColumn("__ts", F.col("__ts")), allowMissingColumns=True)
    u = u.withColumn("__m", filled)
    if in_tol is not None:
        u = u.withColumn(
            "__m", F.when(in_tol, F.col("__m"))
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__m.__rts").alias(f"{ts_col}{suffix}"))
    out_cols.extend(F.col(f"__m.{c}").alias(c) for c in rv)
    return u.where(F.col("__side") == F.lit(1 if direction == "backward" else 0)).select(
        *out_cols
    )
