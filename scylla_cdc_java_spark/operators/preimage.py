"""Pre-image verification (J3/R7).

The reference's PRE_IMAGE mode reads, for every PRE_IMAGE change row, the
destination row at CL=ALL and compares it cell-by-cell with the pre-image,
reporting any inconsistency (PreImageOperationHandler.java:33-137: query
build :47-52, compare ``checkPreimage`` :72-113, non-frozen-list
normalization ``asObject`` :119-128).

Spark analog: the per-row lookup becomes one **left join** of all pre-image
rows against the materialized state on the primary key, and the cell
comparison is a null-safe equality per column — fully native expressions,
one shuffle (or zero with a broadcast state / storage-partitioned join).
Semantics follow the reference: only cells *present* (non-null) in the
pre-image are checked; a pre-image for a row missing from the state is an
inconsistency on every checked cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.timeuuid import timeuuid_micros_col
from ..model.schema import CdcTableDescriptor
from .normalize import TIME_MICROS, normalize_changes

_OP = "cdc$operation"


def _canon_change_value(c: Column, col: str, desc: CdcTableDescriptor) -> Column:
    """Canonical comparable form of a CDC-log cell value."""
    dt = desc.base_field(col).dataType
    if col in desc.list_columns:
        # log form map<timeuuid,elem> -> element array in timeuuid order
        # (O3; reference asObject normalization + TreeMap sort,
        # ExecutingPreparedStatementHandler.java:64-90)
        ents = F.transform(
            F.map_entries(c),
            lambda e: F.struct(
                timeuuid_micros_col(e["key"]).alias("t"),
                e["key"].alias("k"),
                e["value"].alias("v"),
            ),
        )
        return F.transform(F.array_sort(ents), lambda e: e["v"])
    if isinstance(dt, T.ArrayType):
        return F.sort_array(c)  # sets compare order-insensitively
    if isinstance(dt, T.MapType):
        return F.array_sort(F.map_entries(c))  # maps as sorted entry arrays
    return c


def _canon_state_value(c: Column, col: str, desc: CdcTableDescriptor) -> Column:
    dt = desc.base_field(col).dataType
    if col in desc.list_columns:
        return c  # state already stores the ordered array
    if isinstance(dt, T.ArrayType):
        return F.sort_array(c)
    if isinstance(dt, T.MapType):
        return F.array_sort(F.map_entries(c))
    return c


def preimage_report(
    changes: DataFrame, state: DataFrame, desc: CdcTableDescriptor
) -> DataFrame:
    """Verify PRE_IMAGE rows (op 0) against the materialized state.

    Returns one row per pre-image with:
    ``<primary key cols>, cdc$time_micros, row_missing, n_checked,
    n_mismatch, mismatched_cols`` — empty ``mismatched_cols`` and
    ``row_missing=false`` means the pre-image was consistent.
    """
    changes = normalize_changes(changes)
    pre = changes.where(F.col(_OP).cast("int") == 0)
    pkey = desc.primary_key
    regular = desc.regular_columns

    pre_sel = pre.select(
        *pkey,
        F.col(TIME_MICROS),
        *[
            _canon_change_value(F.col(c), c, desc).alias(f"pre_{c}")
            for c in regular
        ],
    )
    st_sel = state.select(
        *pkey,
        F.lit(True).alias("__row_present"),
        *[_canon_state_value(F.col(c), c, desc).alias(f"st_{c}") for c in regular],
    )
    joined = pre_sel.join(st_sel, on=pkey, how="left")

    present = F.coalesce(F.col("__row_present"), F.lit(False))
    checked = [F.col(f"pre_{c}").isNotNull() for c in regular]
    mismatch = [
        chk & (~present | ~F.col(f"pre_{c}").eqNullSafe(F.col(f"st_{c}")))
        for c, chk in zip(regular, checked)
    ]
    n_checked = sum(c.cast("int") for c in checked) if regular else F.lit(0)
    n_mismatch = sum(m.cast("int") for m in mismatch) if regular else F.lit(0)
    mismatched_cols = F.filter(
        F.array(
            *[F.when(m, F.lit(c)) for c, m in zip(regular, mismatch)]
        ),
        lambda x: x.isNotNull(),
    ) if regular else F.array().cast("array<string>")

    return joined.select(
        *pkey,
        F.col(TIME_MICROS),
        (~present).alias("row_missing"),
        n_checked.alias("n_checked"),
        n_mismatch.alias("n_mismatch"),
        mismatched_cols.alias("mismatched_cols"),
    )
