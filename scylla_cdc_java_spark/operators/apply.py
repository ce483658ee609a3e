"""Change application — the "replicator" as a distributed merge kernel.

Re-expresses the reference's replicator sink program (R1-R10, reference
scylla-cdc-replicator/.../ReplicatorConsumer.java:37-124 and the
operations/ handler tree) as batch DataFrame operators:

* ``materialize_lww`` — the fast path: row-granularity last-writer-wins
  materialization as a single aggregate (``max_by``) so Spark can partial-
  aggregate map-side before the one unavoidable shuffle on the key.
* ``pair_range_deletes`` — J1 batch analog: pair the two bound rows of a
  range delete per stream with ``lead()`` over the per-stream order
  (reference buffers the left bound in keyed state,
  RangeDeleteState.java:8-38).
* ``apply_cdc_log`` — the full-fidelity kernel: cell-level CQL write
  semantics (insert/update/row-delete/partition-delete/range-delete,
  null-vs-unset via ``cdc$deleted_*``, non-frozen collection deltas,
  pre/post-image modes, TTL expiry). Implemented as ``applyInPandas`` over
  *hash-bucket* groups of the partition key: one shuffle co-locates every
  change that can affect a CQL partition (row ops, partition deletes, range
  bounds), then an ordered fold inside the Arrow batch applies each
  partition's changes in (cdc$time, batch_seq_no) order — the same
  per-stream total order the reference relies on
  (WorkerTest.testWorkerConsumesSingleVNodeChangesInOrder).

Scale posture: the kernel's only shuffle is the bucketed groupBy — the
minimum co-location requirement for CQL semantics, with kernel-call count
bounded by ``n_kernel_buckets`` instead of key cardinality. Skewed
partitions degrade exactly like hot CQL partitions; AQE skew handling
applies. Everything before the kernel (normalize, op-split) is
native/codegen; P2 dedup rides inside the fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model.ops import OperationType
from ..model.schema import (
    DELETED_ELEMENTS_PREFIX,
    DELETED_PREFIX,
    CdcTableDescriptor,
)
from .normalize import TIME_MICROS, normalize_changes

_SEQ = "cdc$batch_seq_no"
_OP = "cdc$operation"


def materialize_lww(
    changes: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    time_col: str = TIME_MICROS,
    seq_col: str = _SEQ,
    op_col: str = _OP,
    delete_ops: tuple[int, ...] = (int(OperationType.ROW_DELETE), int(OperationType.PARTITION_DELETE)),
) -> DataFrame:
    """Row-granularity LWW materialization (fast path).

    One aggregation: for each key keep the latest change by
    ``(time, seq)`` via ``max_by`` (partial-aggregatable — no window, no
    per-key row explosion), then drop keys whose latest change is a delete.
    """
    ord_expr = F.struct(F.col(time_col), F.col(seq_col))
    picked = F.max_by(
        F.struct(F.col(op_col).alias("op"), *[F.col(c).alias(c) for c in value_cols]),
        ord_expr,
    ).alias("last")
    agg = changes.groupBy(*key_cols).agg(picked)
    alive = agg.where(~F.col("last.op").cast("int").isin(list(delete_ops)))
    return alive.select(*key_cols, *[F.col(f"last.{c}").alias(c) for c in value_cols])


def pair_range_deletes(changes: DataFrame, desc: CdcTableDescriptor) -> DataFrame:
    """J1: pair left/right range-delete bound rows per stream.

    Emits one row per completed range delete with the partition key, the
    left/right clustering bounds and their inclusivity. Unmatched left
    bounds (right bound outside the read window) are dropped, matching the
    reference's buffer-until-right-bound behavior.
    """
    changes = normalize_changes(changes)
    bounds = changes.where(F.col(_OP).cast("int").isin([5, 6, 7, 8]))
    w = Window.partitionBy("cdc$stream_id").orderBy(F.col(TIME_MICROS), F.col(_SEQ))
    ck = desc.clustering_keys
    nxt = lambda c: F.lead(c).over(w)  # noqa: E731
    paired = (
        bounds.withColumn("next_op", nxt(F.col(_OP)))
        .withColumns({f"right_{c}": nxt(F.col(c)) for c in ck})
        .where(F.col(_OP).cast("int").isin([5, 6]) & F.col("next_op").cast("int").isin([7, 8]))
    )
    sel = [
        *desc.partition_keys,
        F.col(TIME_MICROS).alias("delete_time_micros"),
        (F.col(_OP).cast("int") == 5).alias("left_inclusive"),
        (F.col("next_op").cast("int") == 7).alias("right_inclusive"),
    ]
    sel += [F.col(c).alias(f"left_{c}") for c in ck]
    sel += [F.col(f"right_{c}") for c in ck]
    return paired.select(*sel)


def _plain_desc(desc: CdcTableDescriptor) -> dict:
    """Reduce the descriptor to plain python values for closure capture
    (workers deserialize the kernel without importing this package)."""
    kinds = {}
    for col in desc.regular_columns:
        dt = desc.base_field(col).dataType
        if col in desc.list_columns:
            kinds[col] = "list"
        elif col in desc.non_frozen_collections and isinstance(dt, T.ArrayType):
            kinds[col] = "set"
        elif col in desc.non_frozen_collections and isinstance(dt, T.MapType):
            kinds[col] = "map"
        elif col in desc.non_frozen_collections and isinstance(dt, T.StructType):
            kinds[col] = "udt"
        else:
            kinds[col] = "scalar"
    return {
        "pk": list(desc.partition_keys),
        "ck": list(desc.clustering_keys),
        "regular": list(desc.regular_columns),
        "kinds": kinds,
        "udt_fields": {
            col: [f.name for f in desc.base_field(col).dataType.fields]
            for col in desc.regular_columns
            if isinstance(desc.base_field(col).dataType, T.StructType)
        },
    }


def _join_nullsafe(left: DataFrame, right: DataFrame, cols: list[str], how: str = "left") -> DataFrame:
    """Same-key join that treats NULL keys as EQUAL (a plain column-list
    join silently drops NULL-key groups — NULL = NULL is NULL). Real CDC
    primary keys are never null, but the apply kernels must stay
    total on arbitrary adapter-synthesized logs, and the Arrow fold
    kernel (dict keys) already groups NULL keys — the native plan has to
    agree with it row-for-row."""
    r = right
    for c in cols:
        r = r.withColumnRenamed(c, f"__rns_{c}")
    cond = None
    for c in cols:
        e = F.col(c).eqNullSafe(F.col(f"__rns_{c}"))
        cond = e if cond is None else (cond & e)
    return left.join(r, cond, how).drop(*[f"__rns_{c}" for c in cols])


def _apply_scalar_native(
    changes: DataFrame, d: dict, with_version: bool, out_cols: list[str]
) -> DataFrame:
    """Fully-native cell-granularity LWW apply for scalar-only tables.

    The reference's prepared-statement writes are per-cell last-writer-wins
    with tombstone shadowing (PreparedUpdateOperationHandler.java:19-66,
    ``USING TIMESTAMP``); for tables with no non-frozen collections that
    fold is expressible as ONE duplicate-insensitive aggregation:

    * per (pk, ck): latest tombstone ``(t, seq)`` (row delete; partition
      delete too when the table has no clustering keys), latest marker
      write (insert/post-image), and per column the latest *written* state
      (a value or an explicit ``cdc$deleted_*`` tombstone; op-9 images
      write every column);
    * a cell is live iff its last write is newer than the tombstone and
      carried a value; the row is emitted iff the marker or any cell is
      live.

    Because every aggregate is max/max_by, at-least-once redelivery (P2)
    deduplicates for free, partial aggregation runs map-side, and the one
    shuffle on the key is the whole plan — no Python, no per-row fold.
    Tables WITH clustering keys additionally fold op-4 partition deletes
    in via a per-pk max joined back on pk (broadcast-sized: one row per
    partition that saw a partition delete). Range deletes (ops 5-8) are
    NOT handled here — callers route logs that may contain them through
    the fold kernel.
    """
    pk, ck, regular = d["pk"], d["ck"], d["regular"]
    key = [*pk, *ck]
    opI = F.col(_OP).cast("int")
    ord_struct = F.struct(
        F.col(TIME_MICROS).alias("t"), F.col(_SEQ).cast("int").alias("s")
    )
    neg = F.struct(
        F.lit(-(2**63)).cast("long").alias("t"), F.lit(0).cast("int").alias("s")
    )
    is_write = opI.isin(1, 2, 9)
    is_marker = opI.isin(2, 9)
    is_rowdel = opI == 3 if ck else opI.isin(3, 4)

    aggs = [
        F.max(F.when(is_rowdel, ord_struct)).alias("__del"),
        F.max(F.when(is_marker, ord_struct)).alias("__marker"),
        F.max(F.when(is_write, F.col(TIME_MICROS))).alias("__ver"),
    ]
    for c in regular:
        darr = F.col(f"cdc$deleted_{c}") if f"cdc$deleted_{c}" in changes.columns else F.lit(None)
        written = is_write & (
            F.col(c).isNotNull() | F.coalesce(darr, F.lit(False)) | (opI == 9)
        )
        aggs.append(F.max(F.when(written, ord_struct)).alias(f"__w_{c}"))
        aggs.append(F.max_by(F.col(c), F.when(written, ord_struct)).alias(f"__v_{c}"))
    grouped = changes.groupBy(*key).agg(*aggs)

    if ck:
        pdel = (
            changes.where(opI == 4)
            .groupBy(*pk)
            .agg(F.max(ord_struct).alias("__pdel"))
        )
        grouped = _join_nullsafe(grouped, pdel, pk)
        del_eff = F.coalesce(F.greatest(F.col("__del"), F.col("__pdel")), neg)
    else:
        del_eff = F.coalesce(F.col("__del"), neg)

    vals = {c: F.when(F.col(f"__w_{c}") > del_eff, F.col(f"__v_{c}")) for c in regular}
    marker_alive = F.coalesce(F.col("__marker") > del_eff, F.lit(False))
    any_cell = F.lit(False)
    for c in regular:
        any_cell = any_cell | vals[c].isNotNull()
    sel = [*key]
    if with_version:
        sel.append(F.col("__ver").alias(TIME_MICROS))
    sel += [vals[c].alias(c) for c in regular]
    out = grouped.where(marker_alive | any_cell).select(*sel)
    return out.select(*out_cols)


def _apply_collection_native(
    changes: DataFrame, d: dict, desc: CdcTableDescriptor, with_version: bool, out_cols: list[str]
) -> DataFrame:
    """Fully-native apply for tables WITH non-frozen collections (no range
    deletes in the log): per-ELEMENT last-writer-wins.

    The reference applies collection deltas element-wise with ``USING
    TIMESTAMP`` idempotent writes (ExecutingPreparedStatementHandler.java:
    64-90); that is exactly an aggregation over an element-action log:

    * scalar columns + tombstones + markers: the same one-pass aggregation
      as ``_apply_scalar_native``;
    * each collection column: explode payload entries (adds) and
      ``cdc$deleted_elements_*`` (removes) into (key, element) actions,
      keep the latest action per element, drop elements whose latest
      action predates the column's latest *reset* (whole-collection
      overwrite / op-9 image) or the row's tombstone, then re-collect —
      sets sorted, maps as maps, lists ordered by the timeuuid key (O3);
    * non-frozen UDTs: per-field scalar-style LWW (field writes vs
      ``remove_idx`` field clears vs overwrite resets) — fields are a
      static domain, no explode needed.

    Every aggregate is max/max_by, so at-least-once redelivery dedups for
    free; the plan is one aggregation per stage plus same-key joins that
    reuse the groupBy partitioning — no Python anywhere.
    """
    from ..functions.timeuuid import timeuuid_micros_col

    pk, ck, regular, kinds = d["pk"], d["ck"], d["regular"], d["kinds"]
    key = [*pk, *ck]
    opI = F.col(_OP).cast("int")
    ord_struct = F.struct(
        F.col(TIME_MICROS).alias("t"), F.col(_SEQ).cast("int").alias("s")
    )
    neg = F.struct(
        F.lit(-(2**63)).cast("long").alias("t"), F.lit(0).cast("int").alias("s")
    )
    is_write = opI.isin(1, 2, 9)
    is_marker = opI.isin(2, 9)
    is_rowdel = opI == 3 if ck else opI.isin(3, 4)

    def dcol(c):
        name = f"{DELETED_PREFIX}{c}"
        return F.col(name) if name in changes.columns else F.lit(None).cast("boolean")

    def ecol(c):
        name = f"{DELETED_ELEMENTS_PREFIX}{c}"
        return F.col(name) if name in changes.columns else F.lit(None)

    # ---- base aggregation: tombstones, marker, scalars, UDT fields, resets
    aggs = [
        F.max(F.when(is_rowdel, ord_struct)).alias("__del"),
        F.max(F.when(is_marker, ord_struct)).alias("__marker"),
        F.max(F.when(is_write, F.col(TIME_MICROS))).alias("__ver"),
    ]
    for c in regular:
        kind = kinds[c]
        if kind == "scalar":
            written = is_write & (
                F.col(c).isNotNull() | F.coalesce(dcol(c), F.lit(False)) | (opI == 9)
            )
            aggs.append(F.max(F.when(written, ord_struct)).alias(f"__w_{c}"))
            aggs.append(F.max_by(F.col(c), F.when(written, ord_struct)).alias(f"__v_{c}"))
        elif kind == "udt":
            # per-field LWW: a field action is a non-null field write, a
            # remove_idx clear, or an overwrite/image reset without it
            for i, fname in enumerate(d["udt_fields"][c]):
                fval = F.col(c)[fname]
                f_set = is_write & fval.isNotNull()
                f_clr = is_write & (
                    F.array_contains(
                        F.coalesce(ecol(c), F.array().cast("array<short>")),
                        F.lit(i).cast("short"),
                    )
                    | (
                        ((opI == 9) | F.coalesce(dcol(c), F.lit(False)))
                        & fval.isNull()
                    )
                )
                # a clear in the same row as a payload write wins (the
                # reference applies removed indices after field writes)
                eff = F.when(f_clr, F.lit(None)).otherwise(fval)
                aggs.append(
                    F.max(F.when(f_set | f_clr, ord_struct)).alias(f"__w_{c}__{fname}")
                )
                aggs.append(
                    F.max_by(eff, F.when(f_set | f_clr, ord_struct)).alias(
                        f"__v_{c}__{fname}"
                    )
                )
        else:  # set / map / list: reset watermark only; elements aggregate below
            reset = is_write & ((opI == 9) | F.coalesce(dcol(c), F.lit(False)))
            aggs.append(F.max(F.when(reset, ord_struct)).alias(f"__rst_{c}"))
    base = changes.groupBy(*key).agg(*aggs)

    if ck:
        pdel = changes.where(opI == 4).groupBy(*pk).agg(F.max(ord_struct).alias("__pdel"))
        base = _join_nullsafe(base, pdel, pk)
        del_eff = F.coalesce(F.greatest(F.col("__del"), F.col("__pdel")), neg)
    else:
        del_eff = F.coalesce(F.col("__del"), neg)
    base = base.withColumn("__D", del_eff)

    # ---- per-collection element aggregation, joined back on the key
    coll_cols = [c for c in regular if kinds[c] in ("set", "map", "list")]
    writes_only = changes.where(is_write)
    for c in coll_cols:
        kind = kinds[c]
        if kind == "set":
            ev_null = F.lit(None).cast("string")  # sets carry no element value
            adds = writes_only.where(F.col(c).isNotNull()).select(
                *key, ord_struct.alias("__o"), F.explode(c).alias("ek"),
                F.lit(True).alias("ia"), ev_null.alias("ev"),
            )
            rems = writes_only.where(ecol(c).isNotNull()).select(
                *key, ord_struct.alias("__o"), F.explode(ecol(c)).alias("ek"),
                F.lit(False).alias("ia"), ev_null.alias("ev"),
            )
        else:  # map / list: payload is map<k, v>; removes are key arrays
            adds = writes_only.where(F.col(c).isNotNull()).select(
                *key, ord_struct.alias("__o"),
                F.explode(F.map_entries(F.col(c))).alias("kv"),
                F.lit(True).alias("ia"),
            ).select(
                *key, "__o", F.col("kv.key").alias("ek"), "ia",
                F.col("kv.value").alias("ev"),
            )
            rems = writes_only.where(ecol(c).isNotNull()).select(
                *key, ord_struct.alias("__o"), F.explode(ecol(c)).alias("ek"),
                F.lit(False).alias("ia"),
                F.lit(None).cast(adds.schema["ev"].dataType).alias("ev"),
            )
        acts = adds.unionByName(rems)
        # tie-break within one change row: the remove side of a single
        # update applies after its add side (reference handler order)
        act_ord = F.struct(F.col("__o"), (~F.col("ia")).cast("int").alias("rm"))
        last = acts.groupBy(*key, "ek").agg(
            F.max("__o").alias("__lo"),
            F.max_by(F.struct(F.col("ia"), F.col("ev")), act_ord).alias("__la"),
        )
        cut = _join_nullsafe(
            last, base.select(*key, "__D", F.col(f"__rst_{c}").alias("__r")), key
        ).where(
            F.col("__la.ia")
            & (F.col("__lo") > F.col("__D"))
            & (F.col("__lo") >= F.coalesce(F.col("__r"), neg))
        )
        if kind == "set":
            coll = cut.groupBy(*key).agg(
                F.sort_array(F.collect_list("ek")).alias(f"__c_{c}")
            )
        elif kind == "map":
            coll = cut.groupBy(*key).agg(
                F.map_from_entries(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("ek"), F.col("__la.ev")))
                    )
                ).alias(f"__c_{c}")
            )
        else:  # list: order elements by the timeuuid key's time component
            ent = F.struct(
                timeuuid_micros_col(F.col("ek")).alias("tm"),
                F.col("ek").alias("k"),
                F.col("__la.ev").alias("v"),
            )
            coll = cut.groupBy(*key).agg(
                F.transform(
                    F.array_sort(F.collect_list(ent)), lambda x: x["v"]
                ).alias(f"__c_{c}")
            )
        base = _join_nullsafe(base, coll, key)

    # ---- assemble output
    marker_alive = F.coalesce(F.col("__marker") > F.col("__D"), F.lit(False))
    vals: dict[str, Column] = {}
    for c in regular:
        kind = kinds[c]
        if kind == "scalar":
            vals[c] = F.when(F.col(f"__w_{c}") > F.col("__D"), F.col(f"__v_{c}"))
        elif kind == "udt":
            fields = d["udt_fields"][c]
            fvals = [
                F.when(
                    F.col(f"__w_{c}__{fn}") > F.col("__D"), F.col(f"__v_{c}__{fn}")
                ).alias(fn)
                for fn in fields
            ]
            struct_val = F.struct(*fvals)
            any_field = F.lit(False)
            for fn in fields:
                any_field = any_field | (
                    F.when(F.col(f"__w_{c}__{fn}") > F.col("__D"), F.col(f"__v_{c}__{fn}")).isNotNull()
                )
            vals[c] = F.when(any_field, struct_val)
        else:
            ccol = F.col(f"__c_{c}")
            vals[c] = F.when(F.size(ccol) > 0, ccol)
    any_cell = F.lit(False)
    for c in regular:
        any_cell = any_cell | vals[c].isNotNull()
    sel = [*key]
    if with_version:
        sel.append(F.col("__ver").alias(TIME_MICROS))
    sel += [vals[c].alias(c) for c in regular]
    out = base.where(marker_alive | any_cell).select(*sel)
    return out.select(*out_cols)


def apply_cdc_log(
    changes: DataFrame,
    desc: CdcTableDescriptor,
    mode: str = "delta",
    initial_state: DataFrame | None = None,
    dedup: bool = True,
    with_version_col: bool = False,
    as_of_micros: int | None = None,
    n_kernel_buckets: int | None = 1024,
    native: bool | None = None,
) -> DataFrame:
    """Apply a CDC change log to (optional) initial state → current state.

    ``mode``: ``delta`` (ops 1-8; images ignored, R9), ``postimage``
    (op 9 replaces ops 1/2 as a full-row write, deletes still apply — R8).
    Output schema = the base-table schema (list columns materialized back
    to arrays in timeuuid order, O3).

    ``with_version_col=True`` appends ``cdc$time_micros`` = the time of the
    last change applied to each surviving row. Feeding that state back as
    ``initial_state`` of a later apply makes incremental application
    convergent under at-least-once replay at *row* granularity — the Spark
    analog of the reference's idempotent ``USING TIMESTAMP`` writes
    (ExecutingPreparedStatementHandler.java:45-53), which are convergent at
    *cell* granularity. A replayed change older than the row's version sorts
    before the seeded row in the fold and is overwritten by it.

    ``as_of_micros`` enables TTL visibility: a write carrying ``cdc$ttl``
    (seconds — the reference passes it through verbatim via ``USING TTL``,
    InsertOperationHandler.java:15-48) expires its scalar cells and, for
    inserts, the row marker at ``write_time + ttl``; cells/markers expired
    at ``as_of_micros`` are invisible in the output. ``None`` (default)
    skips expiry evaluation. Collection *elements* inherit the TTL of the
    write that last set them (per-element expiry, the reference's
    ``USING TTL`` pass-through on collection writes,
    ExecutingPreparedStatementHandler.java:45-53) — expired set/map/list
    elements and UDT fields vanish from the materialized value.

    ``n_kernel_buckets``: the fold groups on ``hash(pk) % n`` rather than
    the raw partition key, folding every CQL partition of a bucket in one
    Arrow batch — kernel invocations (and task bookkeeping) stay bounded
    at ``n`` instead of growing with key cardinality, while the shuffle
    volume is identical and co-location still holds (a partition's rows
    all hash to the same bucket). Size it so one bucket's changes fit an
    executor comfortably; ``None`` groups by the raw key (one kernel call
    per CQL partition — only sensible for few, huge partitions).

    ``native``: route the apply through fully-native aggregation instead
    of the Python fold — cell-LWW for scalar-only tables
    (``_apply_scalar_native``), per-element LWW for tables with
    non-frozen collections (``_apply_collection_native``). ``None``
    (default) auto-enables it when the table has no clustering keys
    (range deletes impossible); ``True`` forces it for ck-tables whose
    log is known to hold no range-delete bounds; ``False`` always uses
    the fold kernel. TTL visibility (``as_of_micros``) always uses the
    fold kernel.
    """
    if mode not in ("delta", "postimage"):
        raise ValueError(f"unknown mode {mode!r}")
    d = _plain_desc(desc)
    changes = normalize_changes(changes)
    # P2 dedup happens INSIDE the fold kernel (duplicate ChangeIds are
    # adjacent after the in-group sort), so the change stream shuffles
    # exactly once — on the partition key — instead of paying a second
    # full shuffle for a standalone dropDuplicates.

    if mode == "delta":
        changes = changes.where(~F.col(_OP).cast("int").isin([0, 9]))
    else:
        changes = changes.where(~F.col(_OP).cast("int").isin([0, 1, 2]))

    # Project to the columns the fold needs; column pruning reaches the scan.
    deleted_cols = [
        c
        for c in changes.columns
        if c.startswith(DELETED_PREFIX) and not c.startswith(DELETED_ELEMENTS_PREFIX)
    ]
    delem_cols = [c for c in changes.columns if c.startswith(DELETED_ELEMENTS_PREFIX)]
    base_cols = [f.name for f in desc.base_schema.fields]
    keep = [TIME_MICROS, _SEQ, _OP, "cdc$ttl", *base_cols, *deleted_cols, *delem_cols]
    if dedup:
        keep.insert(0, "cdc$stream_id")
    changes = changes.select(*[c for c in keep if c in changes.columns])

    if initial_state is not None:
        # Seed rows enter the fold as POST_IMAGE (op 9) full-row images: the
        # kernel applies them as whole-row overwrites, so any *replayed*
        # change older than the row's version (which the seed already
        # reflects) is clobbered by the seed rather than merged — the delta
        # semantics that would otherwise resurrect tombstoned cells.
        seed = initial_state
        for c in desc.list_columns:
            if c in seed.columns and isinstance(seed.schema[c].dataType, T.ArrayType):
                # materialized list (array) → log encoding map<timeuuid,elem>;
                # synthetic v1 uuids with time=i keep element order and sort
                # before any real append timeuuid (~1.4e17 in uuid time units).
                seed = seed.withColumn(
                    c,
                    F.map_from_arrays(
                        F.transform(
                            F.col(c),
                            lambda x, i: F.format_string(
                                "%08x-0000-1000-8000-000000000000", i
                            ),
                        ),
                        F.col(c),
                    ),
                )
        for c in changes.columns:
            if c not in seed.columns and c not in (_SEQ, _OP):
                if c == TIME_MICROS:
                    seed = seed.withColumn(c, F.lit(-(2**62)).cast("long"))
                else:
                    seed = seed.withColumn(c, F.lit(None).cast(changes.schema[c].dataType))
        # max-int seq: the seed wins (time, seq) ties against a replayed
        # copy of the exact change it already reflects
        seed = seed.withColumn(_SEQ, F.lit(2**31 - 1)).withColumn(
            _OP, F.lit(int(OperationType.POST_IMAGE)).cast("byte")
        )
        changes = changes.unionByName(seed.select(*changes.columns))

    out_schema = desc.base_schema
    if with_version_col:
        out_schema = T.StructType(
            [*out_schema.fields, T.StructField(TIME_MICROS, T.LongType())]
        )

    # Native fast path: scalar-only tables skip the Python fold entirely.
    # Auto-enabled for clustering-key-less tables (ops 5-8 cannot exist
    # there, and op 3/4 coincide) when TTL visibility isn't requested;
    # callers that KNOW their log holds no range-delete bounds can force
    # ``native=True`` for ck-tables too (partition deletes still handled).
    scalar_only = all(k == "scalar" for k in d["kinds"].values())
    if native is None:
        native = not d["ck"] and as_of_micros is None
    if native:
        if as_of_micros is not None:
            raise ValueError("native apply does not evaluate TTL expiry")
        out_names = [f.name for f in out_schema.fields]
        if scalar_only:
            return _apply_scalar_native(changes, d, with_version_col, out_names)
        return _apply_collection_native(changes, d, desc, with_version_col, out_names)

    kernel = _make_fold_kernel(
        d,
        mode,
        [f.name for f in out_schema.fields],
        with_version=with_version_col,
        dedup=dedup,
        as_of=as_of_micros,
    )
    if n_kernel_buckets is None:
        return changes.groupBy(*d["pk"]).applyInPandas(kernel, schema=out_schema)
    bucket = F.pmod(
        F.xxhash64(*[F.col(c) for c in d["pk"]]), F.lit(n_kernel_buckets)
    ).alias("__kbucket")
    return (
        changes.withColumn("__kbucket", bucket)
        .groupBy("__kbucket")
        .applyInPandas(kernel, schema=out_schema)
    )


def _make_fold_kernel(
    d: dict,
    mode: str,
    out_cols: list[str],
    with_version: bool = False,
    dedup: bool = True,
    as_of: int | None = None,
):
    """Build the per-partition ordered fold. Nested def so cloudpickle
    ships it by value; references only stdlib + pandas."""
    import pandas as pd  # noqa: F401  (captured for the closure)

    GREGORIAN = 0x01B21DD213814000
    pk_cols, ck_cols, regular, kinds = d["pk"], d["ck"], d["regular"], d["kinds"]
    udt_fields = d["udt_fields"]
    # mode-dependent op filtering happens before the kernel; op 9 rows are
    # always applied as full-row images here (real post-images or seeds)

    def timeuuid_key(u: str):
        import uuid as _uuid

        return (_uuid.UUID(u).time - GREGORIAN) // 10, u

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        import pandas as pd

        # numpy lexsort + columnar access: ~3-5x faster than
        # sort_values + to_dict("records") on wide frames
        order = np.lexsort(
            (pdf["cdc$batch_seq_no"].to_numpy(), pdf["cdc$time_micros"].to_numpy())
        )
        cols = {c: pdf[c].to_numpy()[order] for c in pdf.columns}
        n_rows = len(order)
        # one kernel call folds EVERY CQL partition of its hash bucket:
        # state nests pk -> ck -> entry, range-delete pairing is keyed per
        # pk (the reference keys its buffer per stream, RangeDeleteState)
        rows: dict[tuple, dict[tuple, dict]] = {}
        pending_left: dict[tuple, tuple] = {}  # pk -> (ck_bound, inclusive)

        def bound_ok(ck_t, bound, inclusive, is_left):
            for a, b in zip(ck_t, bound):
                if b is None:
                    break
                if a is None:
                    return not is_left  # null ck sorts first
                if a == b:
                    continue
                return (a > b) if is_left else (a < b)
            return inclusive

        def coerce_map(v):
            # Arrow hands MapType values to pandas as list-of-(k, v) tuples.
            if v is None:
                return {}
            if isinstance(v, dict):
                return dict(v)
            return dict(v)

        def write_cell(cells, col, value, deleted, del_elems, ee, exp_val):
            # ``ee`` (element-expiry dict, only when as_of is evaluated)
            # inherits the write's TTL per written element/field — the
            # reference passes ``USING TTL`` through on collection writes
            # (ExecutingPreparedStatementHandler.java:45-53), so elements
            # carry the TTL of the write that last set them.
            kind = kinds[col]
            if kind == "scalar":
                if value is not None:
                    cells[col] = value
                elif deleted:
                    cells.pop(col, None)
                return
            if kind == "set":
                cur = set() if deleted else set(cells.get(col) or ())
                if ee is not None and deleted:
                    ee.clear()
                if value is not None:
                    cur.update(value)
                    if ee is not None:
                        for e in value:
                            ee[e] = exp_val
                if del_elems is not None:
                    cur.difference_update(del_elems)
                    if ee is not None:
                        for e in del_elems:
                            ee.pop(e, None)
                if cur:
                    cells[col] = sorted(cur)
                else:
                    cells.pop(col, None)
                return
            if kind in ("map", "list"):
                cur = {} if deleted else dict(cells.get(col) or {})
                if ee is not None and deleted:
                    ee.clear()
                if value is not None:
                    vm = coerce_map(value)
                    cur.update(vm)
                    if ee is not None:
                        for k in vm:
                            ee[k] = exp_val
                if del_elems is not None:
                    for k in del_elems:
                        cur.pop(k, None)
                        if ee is not None:
                            ee.pop(k, None)
                if cur:
                    cells[col] = cur
                else:
                    cells.pop(col, None)
                return
            if kind == "udt":
                names = udt_fields[col]
                if deleted:
                    cur = dict.fromkeys(names)
                    if ee is not None:
                        ee.clear()
                else:
                    cur = dict(cells.get(col) or dict.fromkeys(names))
                if value is not None:
                    vals = list(value) if not isinstance(value, dict) else [value.get(n) for n in names]
                    for n, fv in zip(names, vals):
                        if fv is not None:
                            cur[n] = fv
                            if ee is not None:
                                ee[n] = exp_val
                if del_elems is not None:
                    for idx in del_elems:
                        cur[names[int(idx)]] = None
                        if ee is not None:
                            ee.pop(names[int(idx)], None)
                if any(v is not None for v in cur.values()):
                    cells[col] = cur
                else:
                    cells.pop(col, None)
                return
            raise AssertionError(kind)

        import math

        def sv(x):
            # Arrow->pandas turns nullable ints into float NaN and nullable
            # bools into object NaN; NaN is truthy, so sanitize to None.
            if x is None:
                return None
            if isinstance(x, float) and math.isnan(x):
                return None
            return x

        def iv(x):
            # integers round-tripped through float64 (nullable int columns)
            x = sv(x)
            if isinstance(x, float) and x.is_integer():
                return int(x)
            return x

        op_arr = cols["cdc$operation"]
        time_arr = cols["cdc$time_micros"]
        seq_arr = cols["cdc$batch_seq_no"]
        ttl_arr = cols.get("cdc$ttl")
        sid_arr = cols.get("cdc$stream_id") if dedup else None
        pk_arrs = [cols[c] for c in pk_cols]
        ck_arrs = [cols[c] for c in ck_cols]
        reg_arrs = {c: cols.get(c) for c in regular}
        del_arrs = {c: cols.get(f"cdc$deleted_{c}") for c in regular}
        delem_arrs = {c: cols.get(f"cdc$deleted_elements_{c}") for c in regular}
        run_key, run_seen = None, set()
        for x in range(n_rows):
            if sid_arr is not None:
                # P2 in-fold dedup: duplicate deliveries of one ChangeId
                # (stream, time, seq) are adjacent after the sort; seed
                # rows (null stream id) are never deduped.
                key = (int(time_arr[x]), int(seq_arr[x]))
                if key != run_key:
                    run_key, run_seen = key, set()
                sid = sid_arr[x]
                if sid is not None:
                    sid = bytes(sid)
                    if sid in run_seen:
                        continue
                    run_seen.add(sid)
            op = int(op_arr[x])
            pk_t = tuple(
                iv(a[x]) if not isinstance(a[x], (bytes, bytearray)) else bytes(a[x])
                for a in pk_arrs
            )
            ck_t = tuple(iv(a[x]) for a in ck_arrs)
            if op == 4:  # partition delete
                rows.pop(pk_t, None)
                pending_left.pop(pk_t, None)
                continue
            if op in (5, 6):
                pending_left[pk_t] = (ck_t, op == 5)
                continue
            if op in (7, 8):
                pend = pending_left.pop(pk_t, None)
                if pend is not None and pk_t in rows:
                    lb, lincl = pend
                    rincl = op == 7
                    part = rows[pk_t]
                    doomed = [
                        k
                        for k in part
                        if bound_ok(k, lb, lincl, True) and bound_ok(k, ck_t, rincl, False)
                    ]
                    for k in doomed:
                        del part[k]
                continue
            if op == 3:  # row delete
                part = rows.get(pk_t)
                if part is not None:
                    part.pop(ck_t, None)
                continue
            # writes: 1 update / 2 insert / 9 postimage
            part = rows.setdefault(pk_t, {})
            entry = part.get(ck_t)
            if entry is None:
                entry = part[ck_t] = {"marker": False, "cells": {}, "exp": {}}
            entry["ver"] = int(time_arr[x])
            ttl_val = sv(ttl_arr[x]) if ttl_arr is not None else None
            exp_val = (
                int(time_arr[x]) + int(ttl_val) * 1_000_000 if ttl_val else None
            )
            if op in (2, 9):
                entry["marker"] = True
                entry["marker_exp"] = exp_val
            for col in regular:
                arr = reg_arrs[col]
                value = arr[x] if arr is not None else None
                if kinds[col] == "scalar" and not isinstance(value, (bytes, bytearray)):
                    value = iv(value)
                else:
                    value = sv(value) if isinstance(value, float) else value
                if op == 9:
                    # full-row image (real post-image, or an initial_state
                    # seed row): overwrite every column — absent value is an
                    # absent cell, collections replaced not merged
                    deleted = True
                else:
                    darr = del_arrs[col]
                    deleted = bool(sv(darr[x] if darr is not None else None) or False)
                earr = delem_arrs[col]
                del_elems = earr[x] if earr is not None else None
                if isinstance(del_elems, float):
                    del_elems = sv(del_elems)
                if del_elems is not None and not isinstance(del_elems, (list, tuple)):
                    del_elems = list(del_elems)
                if value is None and not deleted and del_elems is None:
                    continue  # unset
                ee = None
                if as_of is not None and kinds[col] != "scalar":
                    ee = entry.setdefault("eexp", {}).setdefault(col, {})
                write_cell(entry["cells"], col, value, deleted, del_elems, ee, exp_val)
                if kinds[col] == "scalar":
                    if value is not None:
                        entry["exp"][col] = exp_val
                    elif deleted:
                        entry["exp"].pop(col, None)
            if not entry["marker"] and not entry["cells"]:
                del part[ck_t]  # update that wrote only tombstones to a dead row

        out = []
        for pk_t, part in rows.items():
          for ck_t, entry in part.items():
            cells, marker = entry["cells"], entry["marker"]
            if as_of is not None:
                expmap = entry.get("exp", {})
                eexp = entry.get("eexp", {})
                new_cells = {}
                for c, v in cells.items():
                    if kinds[c] == "scalar":
                        if expmap.get(c) is None or expmap[c] > as_of:
                            new_cells[c] = v
                        continue
                    ee = eexp.get(c, {})

                    def live(k):
                        e = ee.get(k)
                        return e is None or e > as_of

                    if kinds[c] == "set":
                        v = [e for e in v if live(e)]
                    elif kinds[c] in ("map", "list"):
                        v = {k: val for k, val in v.items() if live(k)}
                    else:  # udt: expired fields null out
                        v = {n: (val if live(n) else None) for n, val in v.items()}
                        if not any(val is not None for val in v.values()):
                            v = None
                    if v:
                        new_cells[c] = v
                cells = new_cells
                mexp = entry.get("marker_exp")
                if marker and mexp is not None and mexp <= as_of:
                    marker = False
            if not marker and not cells:
                continue
            rec = {}
            for c, v in zip(pk_cols, pk_t):
                rec[c] = v
            for c, v in zip(ck_cols, ck_t):
                rec[c] = v
            if with_version:
                rec[TIME_MICROS] = entry.get("ver")
            for col in regular:
                v = cells.get(col)
                kind = kinds[col]
                if v is None:
                    rec[col] = None
                elif kind == "list":
                    rec[col] = [val for _, val in sorted(v.items(), key=lambda kv: timeuuid_key(kv[0]))]
                elif kind == "map":
                    rec[col] = v
                elif kind == "udt":
                    rec[col] = tuple(v[n] for n in udt_fields[col])
                else:
                    rec[col] = v
            out.append(rec)
        return pd.DataFrame(out, columns=out_cols)

    return fold
