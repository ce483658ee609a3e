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


KV_STATE_DESC = CdcTableDescriptor(
    name="kv_state",
    base_schema=T.StructType(
        [
            T.StructField("grp", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    partition_keys=["grp"],
    clustering_keys=["user_id"],
)

# Deterministic op-code assignment for events_as_cdc_ops: m = event_id % 24.
# 0 -> PARTITION_DELETE(4); 1 -> inclusive RANGE_DELETE bounds (5,7);
# 2 -> exclusive RANGE_DELETE bounds (6,8); 3 -> ROW_DELETE(3);
# 4 -> POST_IMAGE(9); 5 -> PRE_IMAGE(0); 6-14 -> ROW_INSERT(2);
# 15-23 -> ROW_UPDATE(1). Mirrored verbatim by the DuckDB replay oracles in
# queries.py (ORACLE_R5/R6/...), so the full op-code surface of the apply
# kernel sits under the driver's correctness gate — the Spark analog of the
# reference's golden test (ReplicatorCorrectnessTestIT.java:193-252).
_OPS_MOD = 24


def events_as_cdc_ops(
    spark: SparkSession,
    sf_dir: str,
    events: DataFrame | None = None,
    n_groups: int = 40,
    n_vnodes: int = 16,
    include: tuple = ("write", "partition", "row", "range", "image"),
    with_ttl: bool = False,
) -> DataFrame:
    """The ``events`` table as a CDC log over a virtual ``kv_state`` table
    (pk ``grp = user_id % n_groups``, ck ``user_id``) exercising every
    CDC operation code 0-9 deterministically.

    ``include`` selects which statement kinds appear in the log (writes =
    ops 1/2, partition deletes = 4, row deletes = 3, range-delete bound
    pairs = 5-8, images = 0/9); range deletes emit their two bound rows as
    a batch sharing ``cdc$time`` with ``cdc$batch_seq_no`` 0/1, exactly the
    log layout the reference reads (RangeDeleteState.java:8-38).
    All expressions are native so the adapter stays in codegen.
    """
    ev = events if events is not None else load_table(spark, sf_dir, "events")
    m = F.pmod(F.col("event_id"), F.lit(_OPS_MOD))
    base = ev.select(
        m.alias("m"),
        F.pmod(F.col("user_id"), F.lit(n_groups)).alias("grp"),
        F.col("user_id"),
        (F.lit(1_600_000_000_000_000) + F.col("event_id") * F.lit(1000)).alias("t"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("v"),
        F.coalesce(
            F.col("props"),
            F.concat(F.lit("p"), F.pmod(F.col("user_id"), F.lit(7)).cast("string")),
        ).alias("p"),
        (
            F.col("user_id")
            - F.lit(n_groups) * (F.pmod(F.col("event_id"), F.lit(5)) + 1)
        ).alias("lo"),
        (
            F.col("user_id")
            + F.lit(n_groups) * (F.pmod(F.col("event_id"), F.lit(3)) + 1)
        ).alias("hi"),
        # deterministic per-write TTL (seconds): even event ids carry
        # 900..4500 s; odd writes are permanent
        F.when(
            F.pmod(F.col("event_id"), F.lit(2)) == 0,
            F.lit(900) * (F.pmod(F.col("event_id"), F.lit(5)) + 1),
        )
        .cast("long")
        .alias("ttl0"),
    )

    ttl_expr = (
        F.when(F.col("m") >= 6, F.col("ttl0")) if with_ttl else F.lit(None)
    ).cast("long")

    def envelope(df, op, seq, eob, ck, val, prp):
        return df.select(
            stream_id_expr("grp", n_vnodes).alias("cdc$stream_id"),
            F.timestamp_micros(F.col("t")).alias("cdc$time_ts"),
            F.col("t").alias("cdc$time_micros"),
            F.lit(seq).cast("int").alias("cdc$batch_seq_no"),
            op.cast("byte").alias("cdc$operation"),
            F.lit(eob).alias("cdc$end_of_batch"),
            ttl_expr.alias("cdc$ttl"),
            F.col("grp"),
            ck.cast("long").alias("user_id"),
            val.cast("double").alias("value"),
            prp.cast("string").alias("props"),
        )

    singles_pred = F.lit(False)
    if "write" in include:
        singles_pred = singles_pred | (F.col("m") >= 6)
    if "partition" in include:
        singles_pred = singles_pred | (F.col("m") == 0)
    if "row" in include:
        singles_pred = singles_pred | (F.col("m") == 3)
    if "image" in include:
        singles_pred = singles_pred | F.col("m").isin(4, 5)
    singles = envelope(
        base.where(singles_pred),
        F.when(F.col("m") == 0, F.lit(4))
        .when(F.col("m") == 3, F.lit(3))
        .when(F.col("m") == 4, F.lit(9))
        .when(F.col("m") == 5, F.lit(0))
        .when(F.col("m") >= 15, F.lit(1))
        .otherwise(F.lit(2)),
        seq=0,
        eob=True,
        ck=F.when(F.col("m") == 0, F.lit(None)).otherwise(F.col("user_id")),
        val=F.when(F.col("m") >= 4, F.col("v")),
        prp=F.when(F.col("m") >= 4, F.col("p")),
    )
    out = singles
    if "range" in include:
        rng = base.where(F.col("m").isin(1, 2))
        null_d = F.lit(None).cast("double")
        null_s = F.lit(None).cast("string")
        left = envelope(
            rng,
            F.when(F.col("m") == 1, F.lit(5)).otherwise(F.lit(6)),
            seq=0,
            eob=False,
            ck=F.col("lo"),
            val=null_d,
            prp=null_s,
        )
        right = envelope(
            rng,
            F.when(F.col("m") == 1, F.lit(7)).otherwise(F.lit(8)),
            seq=1,
            eob=True,
            ck=F.col("hi"),
            val=null_d,
            prp=null_s,
        )
        out = out.unionByName(left).unionByName(right)
    return out


KV_SET_DESC = CdcTableDescriptor(
    name="kv_set",
    base_schema=T.StructType(
        [
            T.StructField("grp", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("tags", T.ArrayType(T.IntegerType())),
        ]
    ),
    partition_keys=["grp"],
    clustering_keys=["user_id"],
    non_frozen_collections=["tags"],
)


def events_as_cdc_setops(
    spark: SparkSession,
    sf_dir: str,
    events: DataFrame | None = None,
    n_groups: int = 40,
    n_vnodes: int = 16,
) -> DataFrame:
    """The ``events`` table as a CDC log over a non-frozen SET column,
    emitting the real delta encodings (RawChange.java:151-238): element
    adds (payload array), element removals (``cdc$deleted_elements_tags``),
    whole-set overwrites (``cdc$deleted_tags`` + payload), and row deletes.

    Deterministic mapping (m = event_id % 4, e1 = user_id % 10,
    e2 = (user_id + event_id) % 10): 0 -> add {e1, e2}; 1 -> remove {e1};
    2 -> overwrite to {e2}; 3 -> row delete. Mirrored exactly by
    ORACLE_R3_OPS in queries.py, putting the kernel's collection-delta
    fold (per-element last-writer-wins) under the driver's oracle gate.
    """
    ev = events if events is not None else load_table(spark, sf_dir, "events")
    m = F.pmod(F.col("event_id"), F.lit(4))
    e1 = F.pmod(F.col("user_id"), F.lit(10)).cast("int")
    e2 = F.pmod(F.col("user_id") + F.col("event_id"), F.lit(10)).cast("int")
    return ev.select(
        stream_id_expr("user_id", n_vnodes).alias("cdc$stream_id"),
        F.timestamp_micros(
            F.lit(1_600_000_000_000_000) + F.col("event_id") * F.lit(1000)
        ).alias("cdc$time_ts"),
        (F.lit(1_600_000_000_000_000) + F.col("event_id") * F.lit(1000)).alias(
            "cdc$time_micros"
        ),
        F.lit(0).cast("int").alias("cdc$batch_seq_no"),
        F.when(m == 3, F.lit(3)).otherwise(F.lit(1)).cast("byte").alias("cdc$operation"),
        F.lit(True).alias("cdc$end_of_batch"),
        F.lit(None).cast("long").alias("cdc$ttl"),
        F.pmod(F.col("user_id"), F.lit(n_groups)).alias("grp"),
        F.col("user_id"),
        F.when(m == 0, F.array(e1, e2)).when(m == 2, F.array(e2)).alias("tags"),
        F.when(m == 2, F.lit(True)).alias("cdc$deleted_tags"),
        F.when(m == 1, F.array(e1)).alias("cdc$deleted_elements_tags"),
    )


KV_LIST_DESC = CdcTableDescriptor(
    name="kv_list",
    base_schema=T.StructType(
        [
            T.StructField("grp", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("items", T.ArrayType(T.IntegerType())),
        ]
    ),
    partition_keys=["grp"],
    clustering_keys=["user_id"],
    non_frozen_collections=["items"],
    list_columns=["items"],
)


def events_as_cdc_listops(
    spark: SparkSession,
    sf_dir: str,
    events: DataFrame | None = None,
    n_groups: int = 40,
    n_vnodes: int = 16,
) -> DataFrame:
    """The ``events`` table as a CDC log over a non-frozen LIST column in
    the real wire encoding — ``map<timeuuid, elem>`` whose key's time
    component carries list position (Driver3SchemaFactory.java:189-229,
    O3): every event appends one element keyed by a synthetic v1 timeuuid
    whose time field is the event id; every third event overwrites the
    list (``cdc$deleted_items`` + its own element). Mirrored by
    ORACLE_O3_OPS: the reconstructed list is the appends since the last
    overwrite, in timeuuid (= event) order.
    """
    ev = events if events is not None else load_table(spark, sf_dir, "events")
    m = F.pmod(F.col("event_id"), F.lit(3))
    e = F.pmod(F.col("user_id") + F.col("event_id"), F.lit(100)).cast("int")
    uuid = F.format_string("%08x-0000-1000-8000-000000000000", F.col("event_id"))
    return ev.select(
        stream_id_expr("user_id", n_vnodes).alias("cdc$stream_id"),
        F.timestamp_micros(
            F.lit(1_600_000_000_000_000) + F.col("event_id") * F.lit(1000)
        ).alias("cdc$time_ts"),
        (F.lit(1_600_000_000_000_000) + F.col("event_id") * F.lit(1000)).alias(
            "cdc$time_micros"
        ),
        F.lit(0).cast("int").alias("cdc$batch_seq_no"),
        F.lit(1).cast("byte").alias("cdc$operation"),
        F.lit(True).alias("cdc$end_of_batch"),
        F.lit(None).cast("long").alias("cdc$ttl"),
        F.pmod(F.col("user_id"), F.lit(n_groups)).alias("grp"),
        F.col("user_id"),
        F.create_map(uuid, e).alias("items"),
        F.when(m == 2, F.lit(True)).alias("cdc$deleted_items"),
        F.lit(None).cast("array<string>").alias("cdc$deleted_elements_items"),
    )


KV_UDT_DESC = CdcTableDescriptor(
    name="kv_udt",
    base_schema=T.StructType(
        [
            T.StructField("grp", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField(
                "prof",
                T.StructType(
                    [
                        T.StructField("a", T.IntegerType()),
                        T.StructField("b", T.IntegerType()),
                    ]
                ),
            ),
        ]
    ),
    partition_keys=["grp"],
    clustering_keys=["user_id"],
    non_frozen_collections=["prof"],
)


def events_as_cdc_udtops(
    spark: SparkSession,
    sf_dir: str,
    events: DataFrame | None = None,
    n_groups: int = 40,
    n_vnodes: int = 16,
) -> DataFrame:
    """The ``events`` table as a CDC log over a non-frozen UDT column with
    the real field-delta encodings (RawChange.java:207-238: written fields
    in the struct payload, removed fields as indices in
    ``cdc$deleted_elements_prof``). Deterministic mapping (m = event_id %
    4, va = user_id % 7, vb = (user_id + event_id) % 7): 0 -> set field a;
    1 -> set field b; 2 -> remove field a (index 0); 3 -> set both.
    Mirrored by ORACLE_UDT_OPS: per-field last-writer-wins, a row whose
    fields are all null disappears.
    """
    ev = events if events is not None else load_table(spark, sf_dir, "events")
    m = F.pmod(F.col("event_id"), F.lit(4))
    va = F.pmod(F.col("user_id"), F.lit(7)).cast("int")
    vb = F.pmod(F.col("user_id") + F.col("event_id"), F.lit(7)).cast("int")
    null_i = F.lit(None).cast("int")
    prof = (
        F.when(m == 0, F.struct(va.alias("a"), null_i.alias("b")))
        .when(m == 1, F.struct(null_i.alias("a"), vb.alias("b")))
        .when(m == 3, F.struct(va.alias("a"), vb.alias("b")))
    )
    return ev.select(
        stream_id_expr("user_id", n_vnodes).alias("cdc$stream_id"),
        F.timestamp_micros(
            F.lit(1_600_000_000_000_000) + F.col("event_id") * F.lit(1000)
        ).alias("cdc$time_ts"),
        (F.lit(1_600_000_000_000_000) + F.col("event_id") * F.lit(1000)).alias(
            "cdc$time_micros"
        ),
        F.lit(0).cast("int").alias("cdc$batch_seq_no"),
        F.lit(1).cast("byte").alias("cdc$operation"),
        F.lit(True).alias("cdc$end_of_batch"),
        F.lit(None).cast("long").alias("cdc$ttl"),
        F.pmod(F.col("user_id"), F.lit(n_groups)).alias("grp"),
        F.col("user_id"),
        prof.alias("prof"),
        F.lit(None).cast("boolean").alias("cdc$deleted_prof"),
        F.when(m == 2, F.array(F.lit(0).cast("short"))).alias(
            "cdc$deleted_elements_prof"
        ),
    )


KV2_DESC = CdcTableDescriptor(
    name="kv2_state",
    base_schema=T.StructType(
        [
            T.StructField("grp", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ck2", T.IntegerType()),
            T.StructField("value", T.DoubleType()),
        ]
    ),
    partition_keys=["grp"],
    clustering_keys=["user_id", "ck2"],
)


def events_as_cdc_ck2ops(
    spark: SparkSession,
    sf_dir: str,
    events: DataFrame | None = None,
    n_groups: int = 20,
    n_vnodes: int = 16,
) -> DataFrame:
    """CDC log over a TWO-component clustering key exercising *prefix*
    range-delete bounds: the bound rows set only the first clustering
    component (second is NULL = unbounded tail), so coverage is decided on
    the ck prefix exactly like the reference's clustering-bound comparison
    (multi-ck pairing, Driver3SchemaFactory clustering order). Mapping:
    event_id % 12 == 0 -> bound pair on ck1 = user_id +/- multiples of
    ``n_groups`` with per-event inclusivity; every other event inserts row
    (grp, user_id, event_id % 8)."""
    ev = events if events is not None else load_table(spark, sf_dir, "events")
    m = F.pmod(F.col("event_id"), F.lit(12))
    base = ev.select(
        m.alias("m"),
        F.pmod(F.col("user_id"), F.lit(n_groups)).alias("grp"),
        F.col("user_id"),
        (F.lit(1_600_000_000_000_000) + F.col("event_id") * F.lit(1000)).alias("t"),
        F.pmod(F.col("event_id"), F.lit(8)).cast("int").alias("ck2"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("v"),
        (
            F.col("user_id")
            - F.lit(n_groups) * (F.pmod(F.col("event_id"), F.lit(3)) + 1)
        ).alias("lo"),
        (
            F.col("user_id")
            + F.lit(n_groups) * (F.pmod(F.col("event_id"), F.lit(2)) + 1)
        ).alias("hi"),
        (F.pmod(F.col("event_id"), F.lit(2)) == 0).alias("li"),
        (F.pmod(F.col("event_id"), F.lit(3)) == 0).alias("ri"),
    )

    def env2(df, op, seq, eob, ck1, ck2, val):
        return df.select(
            stream_id_expr("grp", n_vnodes).alias("cdc$stream_id"),
            F.timestamp_micros(F.col("t")).alias("cdc$time_ts"),
            F.col("t").alias("cdc$time_micros"),
            F.lit(seq).cast("int").alias("cdc$batch_seq_no"),
            op.cast("byte").alias("cdc$operation"),
            F.lit(eob).alias("cdc$end_of_batch"),
            F.lit(None).cast("long").alias("cdc$ttl"),
            F.col("grp"),
            ck1.cast("long").alias("user_id"),
            ck2.cast("int").alias("ck2"),
            val.cast("double").alias("value"),
        )

    null_i = F.lit(None).cast("int")
    null_d = F.lit(None).cast("double")
    writes = env2(
        base.where(F.col("m") != 0),
        F.lit(2),
        seq=0,
        eob=True,
        ck1=F.col("user_id"),
        ck2=F.col("ck2"),
        val=F.col("v"),
    )
    rng = base.where(F.col("m") == 0)
    left = env2(
        rng,
        F.when(F.col("li"), F.lit(5)).otherwise(F.lit(6)),
        seq=0,
        eob=False,
        ck1=F.col("lo"),
        ck2=null_i,
        val=null_d,
    )
    right = env2(
        rng,
        F.when(F.col("ri"), F.lit(7)).otherwise(F.lit(8)),
        seq=1,
        eob=True,
        ck1=F.col("hi"),
        ck2=null_i,
        val=null_d,
    )
    return writes.unionByName(left).unionByName(right)


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
