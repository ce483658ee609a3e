"""Skew-mitigation join: salt the skewed side, replicate the other.

AQE's skew-join handles sort-merge skew after the fact; an explicit salt is
the plan-level fix when one join key dominates (the 100 TB "one hot
partition" failure): hot-key rows land on ONE reducer regardless of
cluster size. Salting splits each key across ``n_salts`` reducers at the
cost of replicating the build side ``n_salts``-fold — the standard trade
when the build side is too big to broadcast but small relative to the
probe side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the left (probe/skewed) side salted and the right
    (build) side replicated ``n_salts`` times. Result is row-identical to
    the unsalted join — the salt only changes the partitioning.

    ``salt_cols`` picks which left columns feed the deterministic per-row
    salt hash (default: all of them). Supports inner/left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    sc = salt_cols if salt_cols is not None else list(left.columns)
    l2 = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in sc]), F.lit(n_salts))
    )
    r2 = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l2.join(r2, on + ["__salt"], how).drop("__salt")
