"""Multi-table CDC consumption under one lifecycle.

The reference's ``CDCConsumer.Builder`` accepts any number of tables
(``addTable``/``addTables``, CDCConsumer.java:141-151) and drives them
with one master/worker set; start/stop manage the whole group. The
Spark-native mapping runs ONE StreamingQuery per table — queries are the
unit Spark schedules and checkpoints — sharing a work root, with group
start / graceful-stop / await semantics matching the reference lifecycle
(CDCConsumer.start/stop, CDCConsumer.java:200-260).

Scale posture: per-table queries parallelize across the cluster's
scheduler pools independently; state and checkpoints are per table, so a
hot table cannot stall another's progress (the reference's per-task
isolation, worker/Task granularity).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..model.schema import CdcTableDescriptor, build_cdc_log_schema
from .consumer import CDCStreamConsumer
from .replicator import ReplicatorSink


@dataclass
class _TableSpec:
    name: str
    source_dir: str
    desc: CdcTableDescriptor
    schema: T.StructType


@dataclass
class MultiTableConsumer:
    """``CDCConsumer.Builder.addTables`` analog: replicate N tables under
    one start/stop lifecycle.

    Usage::

        group = (MultiTableConsumer(spark, work_root)
                 .add_table("t1", src1, desc1)
                 .add_table("t2", src2, desc2))
        states = group.replicate_available_now()     # batch catch-up
        # or: queries = group.start(); ...; group.stop(queries)
    """

    spark: SparkSession
    work_root: str
    confidence_ms: int = 0
    n_buckets: int = 16
    mode: str = "delta"
    _tables: list[_TableSpec] = field(default_factory=list)

    def add_table(
        self,
        name: str,
        source_dir: str,
        desc: CdcTableDescriptor,
        schema: T.StructType | None = None,
    ) -> "MultiTableConsumer":
        self._tables.append(
            _TableSpec(name, source_dir, desc, schema or build_cdc_log_schema(desc))
        )
        return self

    def add_tables(self, specs) -> "MultiTableConsumer":
        for name, source_dir, desc in specs:
            self.add_table(name, source_dir, desc)
        return self

    def _sink(self, t: _TableSpec) -> ReplicatorSink:
        return ReplicatorSink(
            t.desc,
            os.path.join(self.work_root, t.name, "state"),
            mode=self.mode,
            n_buckets=self.n_buckets,
        )

    def _consumer(self, t: _TableSpec) -> CDCStreamConsumer:
        return (
            CDCStreamConsumer(self.spark)
            .with_source(t.source_dir, t.schema)
            .with_confidence_window_ms(self.confidence_ms)
            .with_checkpoint(os.path.join(self.work_root, t.name, "checkpoint"))
        )

    def _validate_modes(self) -> None:
        """Reference Master.isTabletsBased (Master.java:46-65): refuse a
        table set mixing tablet-based and vnodes-based replication — the
        group has no coherent generation metadata model."""
        from ..model.generations import tablets_based

        tablets_based((t.name, t.desc.uses_tablets) for t in self._tables)

    def start(self, trigger_interval: str | None = None) -> dict:
        """Start every table's pipeline; returns {name: StreamingQuery}."""
        self._validate_modes()
        queries = {}
        for t in self._tables:
            c = self._consumer(t)
            if trigger_interval:
                c = c.with_trigger_interval(trigger_interval)
            queries[t.name] = c.start(self._sink(t), query_name=f"cdc-{t.name}")
        return queries

    @staticmethod
    def stop(queries: dict, timeout_s: float = 60.0) -> None:
        """Graceful group stop (reference CDCConsumer.stop): request stop on
        every query first, then await each."""
        for q in queries.values():
            q.stop()
        for q in queries.values():
            CDCStreamConsumer.stop(q, timeout_s=timeout_s)

    def replicate_available_now(self) -> dict[str, DataFrame]:
        """Catch-up pass over all tables (Trigger.AvailableNow each);
        returns {name: materialized state}. Queries run concurrently —
        group wall-clock is the slowest table, not the sum."""
        self._validate_modes()
        queries = {}
        sinks = {}
        for t in self._tables:
            sink = self._sink(t)
            sinks[t.name] = sink
            queries[t.name] = (
                self._consumer(t)
                .trigger_available_now()
                .start(sink, query_name=f"cdc-{t.name}")
            )
        for q in queries.values():
            q.awaitTermination()
        out = {}
        for t in self._tables:
            state = sinks[t.name].current_state(self.spark)
            if state is None:
                state = self.spark.createDataFrame([], t.desc.base_schema)
            drop = [c for c in state.columns if c.startswith("__") or c == "cdc$time_micros"]
            out[t.name] = state.drop(*drop)
        return out
