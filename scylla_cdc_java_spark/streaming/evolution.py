"""Mid-stream schema evolution (ALTER TABLE while the consumer runs).

The reference rebuilds its ``ChangeSchema`` whenever a page's
column-definition set stops matching the cached one
(Driver3WorkerCQL.java:133-159) and reconciles old/new layouts in the
schema factory (Driver3SchemaFactory.java:73-153); its AlterTableBase
integration tests (scylla-cdc-lib/src/test/.../AlterTableBase.java:28
family) add and drop columns while replication is live.

Spark's file-stream source pins the read schema at query start, so the
Spark-native equivalent has two parts:

* **within one run** — heterogeneous input files are fine: the parquet
  reader null-fills columns a pre-ALTER file lacks and ignores columns a
  post-DROP schema no longer declares, and ``conform_changes`` gives the
  same tolerance to batch frames fed straight to the sink;
* **across schema changes** — ``replicate_with_schema_evolution`` watches
  the column signature of the newest log file (a parquet-footer read, no
  data scan), evolves the table descriptor when the signature changes
  (ALTER ADD -> new nullable column, ALTER DROP -> column removed), and
  rolls the stream onto the new schema by restarting the AvailableNow
  pass on the *same checkpoint* — already-processed files are skipped by
  the source's offset log, exactly the semantics of the reference's
  schema-hash-triggered requery. The materialized state itself is
  reconciled by ``conform_state`` inside the sink (the restart path),
  so both halves of the ALTER land without user intervention.

Scale posture: signature detection reads one parquet footer; the evolve
loop adds zero data-plane work — each round is the normal replication
pipeline, and rounds beyond the first only happen when an ALTER actually
occurred.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

import json

from ..model.schema import (
    CDC_PREFIX,
    DELETED_ELEMENTS_PREFIX,
    DELETED_PREFIX,
    CdcTableDescriptor,
    build_cdc_log_schema,
    descriptor_diff,
)


def save_descriptor(desc: CdcTableDescriptor, path: str) -> None:
    """Persist a descriptor as JSON (schema-cache analog of the reference's
    Driver3SchemaFactory: the current ChangeSchema survives restarts even
    after old log files are archived away)."""
    doc = {
        "name": desc.name,
        "base_schema": desc.base_schema.json(),
        "partition_keys": desc.partition_keys,
        "clustering_keys": desc.clustering_keys,
        "non_frozen_collections": desc.non_frozen_collections,
        "list_columns": desc.list_columns,
    }
    tmp = f"{path}.tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, path)


def load_descriptor(path: str) -> CdcTableDescriptor | None:
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        doc = json.load(fh)
    return CdcTableDescriptor(
        name=doc["name"],
        base_schema=T.StructType.fromJson(json.loads(doc["base_schema"])),
        partition_keys=doc["partition_keys"],
        clustering_keys=doc["clustering_keys"],
        non_frozen_collections=doc["non_frozen_collections"],
        list_columns=doc["list_columns"],
    )

# Envelope columns that carry change identity/order — conform_changes will
# never fabricate these; their absence is a malformed stream.
_IDENTITY_COLS = ("cdc$stream_id", "cdc$batch_seq_no", "cdc$operation")


def conform_changes(df: DataFrame, desc: CdcTableDescriptor) -> DataFrame:
    """Conform a CDC-log batch frame to ``desc``'s wire schema.

    Mirrors ``conform_state`` for the *log* side: value and
    ``cdc$deleted_*`` columns the frame lacks (files written before an
    ALTER ADD) become typed NULLs; value columns the descriptor no longer
    declares (ALTER DROP) disappear; unknown ``cdc$`` envelope extras
    (e.g. ``generation`` partition dirs, derived time columns) pass
    through untouched. Identity envelope columns must already be present.
    """
    target = build_cdc_log_schema(desc)
    have = {f.name: f for f in df.schema.fields}
    missing_id = [c for c in _IDENTITY_COLS if c not in have]
    if missing_id:
        raise ValueError(f"change frame is missing identity columns {missing_id}")
    target_names = {f.name for f in target.fields}
    cols: list = []
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f"`{f.name}`"))
        elif f.name in _IDENTITY_COLS or not f.nullable:
            # nullable=False envelope columns (cdc$time/cdc$time_ts) are
            # derivable downstream; add typed nulls only when optional
            if f.name in ("cdc$time", "cdc$time_ts"):
                continue
            raise ValueError(f"change frame is missing required column {f.name}")
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    # passthrough: bookkeeping columns the pipeline added (vnode, micros,
    # generation partitions) that the wire schema doesn't know about
    for name in df.columns:
        if name in target_names:
            continue
        if name.startswith(DELETED_PREFIX) or name.startswith(
            DELETED_ELEMENTS_PREFIX
        ):
            continue  # markers of a dropped column go with it
        if name.startswith(CDC_PREFIX) or name == "generation":
            cols.append(F.col(f"`{name}`"))
    return df.select(*cols)


def descriptor_from_log_schema(
    log_schema: T.StructType, base: CdcTableDescriptor
) -> CdcTableDescriptor:
    """Rebuild the table descriptor implied by an observed CDC-log file
    schema — the ``Driver3SchemaFactory`` analog for parquet streams.

    Primary-key columns (never alterable in CQL) keep ``base``'s types;
    regular columns are whatever non-``cdc$`` value columns the log file
    declares, typed from the file. A ``cdc$deleted_elements_<col>``
    companion marks ``col`` as a non-frozen collection; a map-typed
    column that ``base`` declared as a list stays a list.
    """
    names = [f.name for f in log_schema.fields]
    by_name = {f.name: f for f in log_schema.fields}
    pk = set(base.primary_key)
    missing_pk = [k for k in base.primary_key if k not in by_name]
    if missing_pk:
        raise ValueError(f"log schema is missing primary-key columns {missing_pk}")
    value_cols = [
        n
        for n in names
        if not n.startswith(CDC_PREFIX) and n != "generation" and n not in pk
    ]
    nf_cols = [
        n[len(DELETED_ELEMENTS_PREFIX) :]
        for n in names
        if n.startswith(DELETED_ELEMENTS_PREFIX)
    ]
    old_lists = set(base.list_columns)
    fields: list[T.StructField] = []
    for f in base.base_schema.fields:
        if f.name in pk:
            fields.append(f)
    list_cols: list[str] = []
    for n in value_cols:
        dt = by_name[n].dataType
        if n in old_lists and isinstance(dt, T.MapType):
            # wire map<timeuuid, elem> -> base list<elem>
            fields.append(T.StructField(n, T.ArrayType(dt.valueType), True))
            list_cols.append(n)
        else:
            fields.append(T.StructField(n, dt, True))
    return CdcTableDescriptor(
        name=base.name,
        base_schema=T.StructType(fields),
        partition_keys=list(base.partition_keys),
        clustering_keys=list(base.clustering_keys),
        non_frozen_collections=[c for c in nf_cols if c in value_cols],
        list_columns=list_cols,
    )


def latest_log_schema(spark: SparkSession, source_dir: str) -> T.StructType | None:
    """Schema of the newest log file under ``source_dir`` (recursive), by
    (mtime, path) — a single-file footer read, no data scan. None when the
    directory holds no parquet yet."""
    files = [
        p
        for p in glob.glob(os.path.join(source_dir, "**", "*.parquet"), recursive=True)
        if os.path.getsize(p) > 0
    ]
    if not files:
        return None
    newest = max(files, key=lambda p: (os.path.getmtime(p), p))
    return spark.read.parquet(newest).schema


def replicate_with_schema_evolution(
    spark: SparkSession,
    source_dir: str,
    base_desc: CdcTableDescriptor,
    work_dir: str,
    mode: str = "delta",
    confidence_ms: int = 0,
    n_buckets: int = 16,
    max_rounds: int = 8,
) -> tuple[DataFrame, CdcTableDescriptor]:
    """Replicate everything currently in ``source_dir``, evolving the
    schema as ALTERs appear — the user never rebuilds a descriptor.

    Each round: infer the current descriptor from the newest file's
    footer, run the AvailableNow replication pass under it (the shared
    checkpoint makes re-runs incremental), then rescan — if files with a
    *newer* signature arrived mid-pass, roll onto the evolved schema and
    go again. Returns ``(state, descriptor)`` for the final schema.
    """
    from .replicator import replicate_available_now

    # resume from the persisted schema cache when present: the state table
    # stays interpretable even if pre-evolution log files were archived
    os.makedirs(work_dir, exist_ok=True)
    desc_path = os.path.join(work_dir, "descriptor.json")
    desc = load_descriptor(desc_path) or base_desc
    if desc is not base_desc:
        descriptor_diff(base_desc, desc)  # stored schema must share the pk
    state: DataFrame | None = None
    for _ in range(max_rounds):
        observed = latest_log_schema(spark, source_dir)
        if observed is not None:
            evolved = descriptor_from_log_schema(observed, desc)
            # descriptor_diff validates the pk is untouched
            descriptor_diff(desc, evolved)
            desc = evolved
        save_descriptor(desc, desc_path)
        schema = build_cdc_log_schema(desc)
        state = replicate_available_now(
            spark,
            source_dir,
            schema,
            desc,
            work_dir,
            mode=mode,
            confidence_ms=confidence_ms,
            n_buckets=n_buckets,
        )
        after = latest_log_schema(spark, source_dir)
        if after is None:
            return state, desc
        next_desc = descriptor_from_log_schema(after, desc)
        if (
            next_desc.base_schema == desc.base_schema
            and next_desc.non_frozen_collections == desc.non_frozen_collections
        ):
            # no ALTER landed while we were replicating — converged
            return state, desc
    return state, desc
