"""Adapter: the synthetic ``events`` table viewed as a CDC change stream.

Maps the fixture event log onto the CDC data model so every CDC operator
can be exercised (and oracle-checked) on driver-provided data:

* entity = ``user_id`` (the partition key of a virtual ``user_state`` table
  with columns ``value double, props string``),
* ``signup`` -> ROW_INSERT(2), ``error`` -> ROW_DELETE(3), every other
  event type -> ROW_UPDATE(1),
* ``cdc$stream_id`` = 16-byte blob embedding ``user_id % n_vnodes`` in the
  vnode bit range (StreamId layout, F3),
* ``cdc$time_ts`` = event timestamp, ``cdc$batch_seq_no`` = event_id-derived
  uniquifier (ChangeId identity for dedup).

All expressions are native (codegen); the adapter is a projection, so
filters on it push down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model.schema import CdcTableDescriptor
from .tables import load_table

from pyspark.sql import types as T

USER_STATE_DESC = CdcTableDescriptor(
    name="user_state",
    base_schema=T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    partition_keys=["user_id"],
    clustering_keys=[],
)

def op_expr():
    """Operation code from event_type (column exprs need a live session,
    so this cannot be a module-level constant)."""
    return (
        F.when(F.col("event_type") == "signup", F.lit(2))
        .when(F.col("event_type") == "error", F.lit(3))
        .otherwise(F.lit(1))
        .cast("byte")
    )


def stream_id_expr(user_col: str = "user_id", n_vnodes: int = 16):
    """16-byte stream id with vnode = user_id % n_vnodes in bits 4..25."""
    lower = (F.col(user_col) % F.lit(n_vnodes)) * F.lit(16) + F.lit(1)
    return F.unhex(F.lpad(F.hex(lower), 32, "0"))


def events_as_cdc(
    spark: SparkSession, sf_dir: str, n_vnodes: int = 16, events: DataFrame | None = None
) -> DataFrame:
    ev = events if events is not None else load_table(spark, sf_dir, "events")
    return ev.select(
        stream_id_expr(n_vnodes=n_vnodes).alias("cdc$stream_id"),
        F.col("ts").alias("cdc$time_ts"),
        F.col("event_id").cast("int").alias("cdc$batch_seq_no"),
        op_expr().alias("cdc$operation"),
        F.lit(True).alias("cdc$end_of_batch"),
        F.lit(None).cast("long").alias("cdc$ttl"),
        F.col("user_id"),
        F.col("value"),
        F.col("props"),
    )
