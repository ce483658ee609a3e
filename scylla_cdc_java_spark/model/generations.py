"""Generation (topology-era) catalog and master-step planning.

The reference's master thread discovers *generations* — epochs of the
cluster topology, each carrying the set of CDC stream ids — groups their
streams into per-vnode tasks, and rolls over to the next generation once
the current one is closed and fully consumed (or TTL-expired):

* discovery queries (S5-S8): ``Driver3MasterCQL.getFetchSmallestGenerationAfter``
  / ``getFetchStreams`` (scylla-cdc-driver3/.../Driver3MasterCQL.java:167-180,
  216-229) and the per-table tablet variants (:182-199, :231-247);
* grouping (A1): ``GenerationBasedCDCMetadataModel.createTasks``
  (scylla-cdc-base/.../GenerationBasedCDCMetadataModel.java:100-110);
* TTL skip (P6): ``generationTTLExpired`` (:59-93);
* completion barrier (A3): ``InMemoryStateStore.areTasksFullyConsumedUntil``
  (scylla-cdc-lib/.../InMemoryStateStore.java:86-99);
* the loop itself (T6): ``runMasterLoop`` (:118-141).

Spark mapping: generation metadata is a *tiny* driver-side read (the
reference reads it with LIMIT-1 CQL); the catalog collects it once and all
planning is plain Python, exactly like ``MicroBatchStream.planInputPartitions``
planning on the driver. The per-generation task groups become the source's
input partitions; the barrier compares streaming offsets (TaskState) against
the generation end.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..functions.streamid import vnode_from_stream_id
from .state import TaskId, TaskState


@dataclass(frozen=True)
class GenerationMetadata:
    """One topology era: [start_ms, end_ms or open), with its stream set."""

    start_ms: int
    end_ms: int | None
    stream_ids: tuple[bytes, ...]

    @property
    def closed(self) -> bool:
        return self.end_ms is not None


class GenerationCatalog:
    """Sorted view over known generations (the linked list the reference
    walks via end-timestamp -> next start-timestamp)."""

    def __init__(self, generations: list[GenerationMetadata]):
        self._gens = sorted(generations, key=lambda g: g.start_ms)

    @staticmethod
    def from_dataframe(df: DataFrame) -> "GenerationCatalog":
        """Build from a metadata DataFrame with columns
        ``(start_ms long, end_ms long nullable, stream_id binary)``.
        Metadata is tiny (streams x generations); collecting it on the
        driver mirrors the reference's planning-time CQL reads."""
        by_gen: dict[tuple[int, int | None], list[bytes]] = {}
        for r in df.collect():
            key = (int(r["start_ms"]), None if r["end_ms"] is None else int(r["end_ms"]))
            by_gen.setdefault(key, []).append(bytes(r["stream_id"]))
        return GenerationCatalog(
            [
                GenerationMetadata(s, e, tuple(sorted(ids)))
                for (s, e), ids in by_gen.items()
            ]
        )

    @staticmethod
    def from_v1_dataframe(df: DataFrame) -> "GenerationCatalog":
        """S6: legacy V1 metadata layout — one row per generation carrying
        the FULL stream set (``system_distributed.cdc_streams_descriptions``:
        ``time`` + ``streams set<blob>``), no explicit end: a generation
        closes at the next one's start, the last stays open. Columns:
        ``(time_ms long, streams array<binary>)``."""
        rows = sorted(df.collect(), key=lambda r: int(r["time_ms"]))
        gens = []
        for i, r in enumerate(rows):
            end = int(rows[i + 1]["time_ms"]) if i + 1 < len(rows) else None
            gens.append(
                GenerationMetadata(
                    int(r["time_ms"]),
                    end,
                    tuple(sorted(bytes(s) for s in r["streams"])),
                )
            )
        return GenerationCatalog(gens)

    @staticmethod
    def discover(
        v2_df: DataFrame | None = None,
        v1_df: DataFrame | None = None,
        rewritten: bool = False,
    ) -> "GenerationCatalog":
        """S6 version dispatch — the ``fetchShouldQueryLegacyTables`` analog
        (Driver3MasterCQL.java:89-150): when the ``rewritten`` probe row is
        present (``system.cdc_local 'rewritten'``), every V1 generation has
        been rewritten into the V2 tables and legacy metadata is skipped;
        otherwise V1 generations merge with V2 (V2 wins a start-timestamp
        collision) and open ends are re-closed against the merged timeline."""
        by_start: dict[int, GenerationMetadata] = {}
        if v1_df is not None and not rewritten:
            for g in GenerationCatalog.from_v1_dataframe(v1_df)._gens:
                by_start[g.start_ms] = g
        if v2_df is not None:
            for g in GenerationCatalog.from_dataframe(v2_df)._gens:
                by_start[g.start_ms] = g
        merged = [by_start[s] for s in sorted(by_start)]
        for i, g in enumerate(merged[:-1]):
            if g.end_ms is None:
                merged[i] = GenerationMetadata(
                    g.start_ms, merged[i + 1].start_ms, g.stream_ids
                )
        return GenerationCatalog(merged)

    def smallest_after(self, after_ms: int) -> GenerationMetadata | None:
        """S5/S7: the generation with the smallest start > after_ms."""
        for g in self._gens:
            if g.start_ms > after_ms:
                return g
        return None

    def generation_at(self, start_ms: int) -> GenerationMetadata | None:
        for g in self._gens:
            if g.start_ms == start_ms:
                return g
        return None

    @staticmethod
    def ttl_expired(gen: GenerationMetadata, now_ms: int, min_ttl_ms: int | None) -> bool:
        """P6: a closed generation whose end predates now - min(table TTLs)
        cannot contain live data; skip it without consuming."""
        if min_ttl_ms is None or gen.end_ms is None:
            return False
        return gen.end_ms < now_ms - min_ttl_ms


def group_streams_to_tasks(
    keyspace: str, table: str, gen: GenerationMetadata
) -> dict[TaskId, tuple[bytes, ...]]:
    """A1: group a generation's streams by extracted vnode into tasks;
    streams stay sorted inside a task (the reference's SortedSet)."""
    by_vnode: dict[int, list[bytes]] = {}
    for sid in gen.stream_ids:
        by_vnode.setdefault(vnode_from_stream_id(sid), []).append(sid)
    return {
        TaskId(keyspace, table, gen.start_ms, v): tuple(sorted(ids))
        for v, ids in by_vnode.items()
    }


def all_tasks_consumed_until(
    states: dict[TaskId, TaskState],
    until_ms: int,
    expected: "set[TaskId] | None" = None,
) -> bool:
    """A3 barrier: every task's window has moved strictly past ``until``.

    When ``expected`` is given, a task with no persisted state counts as
    NOT consumed (reference InMemoryStateStore.areTasksFullyConsumedUntil
    iterates the generation's task ids); without it, an empty state map is
    conservatively not-consumed — never vacuously true on a fresh restart."""
    if expected is not None:
        return all(
            t in states and states[t].has_passed(until_ms) for t in expected
        )
    if not states:
        return False
    return all(s.has_passed(until_ms) for s in states.values())


def reconfigure_workers(
    active: set[TaskId] | list[TaskId], new: set[TaskId] | list[TaskId]
) -> tuple[tuple[TaskId, ...], tuple[TaskId, ...]]:
    """§2.7 task-set difference on reconfiguration: returns
    ``(to_delete, to_start)`` — obsolete task states to drop and new tasks
    to schedule (reference LocalTransport.configureWorkers,
    scylla-cdc-lib/.../LocalTransport.java:84-105: ``toDelete = active − new``)."""
    a, n = set(active), set(new)
    return tuple(sorted(a - n)), tuple(sorted(n - a))


def tablets_based(tables) -> bool:
    """Master.isTabletsBased analog (reference scylla-cdc-base/.../model/
    master/Master.java:46-65): a CDC consumer group must use EITHER
    tablet-based replication (per-table generations) or vnodes-based
    (cluster-wide generations) for every table — a mixed set has no
    coherent metadata model, so the master refuses it.

    ``tables`` is an iterable of ``(name, uses_tablets)`` pairs; returns
    the common mode, raising ``ValueError`` on a mixed configuration.
    """
    mode: bool | None = None
    for name, uses in tables:
        uses = bool(uses)
        if mode is None:
            mode = uses
        elif mode != uses:
            raise ValueError(
                f"Mixed tablet configuration detected: table '{name}' "
                f"{'uses' if uses else 'does not use'} tablets, but other tables "
                f"in the configuration {'use' if mode else 'do not use'} tablets. "
                "All tables in the same CDC configuration must consistently use "
                "either tablet-based replication or vnodes-based."
            )
    return bool(mode)


@dataclass(frozen=True)
class MasterDecision:
    """Outcome of one master step: what the source should do next."""

    action: str  # "wait_first" | "steady" | "wait_consumed" | "rollover"
    generation: GenerationMetadata | None = None
    next_generation: GenerationMetadata | None = None


class TableCDCController:
    """Tablet-mode metadata model (S7/T7): per-*table* generations instead
    of cluster-wide ones, with dynamic task addition while a generation is
    live (reference TableCDCController, scylla-cdc-base/.../master/
    TableCDCController.java:67-75,85-102,156-163; stream-state filtering
    Driver3MasterCQL.java:50-64).

    Holds one GenerationCatalog per (keyspace, table); ``step`` runs the
    master iteration for one table; ``added_tasks`` diffs the currently
    scheduled tasks against the catalog (T7: tablets appearing mid-
    generation become new tasks for the running worker — in Spark, new
    input partitions at the next microbatch plan)."""

    def __init__(self) -> None:
        self._catalogs: dict[tuple[str, str], GenerationCatalog] = {}

    def set_catalog(self, keyspace: str, table: str, catalog: GenerationCatalog) -> None:
        self._catalogs[(keyspace, table)] = catalog

    def step(
        self,
        keyspace: str,
        table: str,
        current_start_ms: int | None,
        task_states: dict[TaskId, TaskState],
        now_ms: int,
        min_ttl_ms: int | None = None,
    ) -> "MasterDecision":
        cat = self._catalogs.get((keyspace, table), GenerationCatalog([]))
        expected = None
        if current_start_ms is not None:
            gen = cat.generation_at(current_start_ms)
            if gen is not None:
                expected = set(group_streams_to_tasks(keyspace, table, gen))
        return run_master_step(
            cat, current_start_ms, task_states, now_ms, min_ttl_ms, expected_tasks=expected
        )

    def added_tasks(
        self,
        keyspace: str,
        table: str,
        generation_start_ms: int,
        scheduled: set[TaskId] | list[TaskId],
    ) -> tuple[TaskId, ...]:
        """T7: tasks present in the catalog's current generation but not yet
        scheduled — to be added to the running worker."""
        cat = self._catalogs.get((keyspace, table))
        if cat is None:
            return ()
        gen = cat.generation_at(generation_start_ms)
        if gen is None:
            return ()
        current = set(group_streams_to_tasks(keyspace, table, gen))
        _, to_start = reconfigure_workers(set(scheduled), current)
        return to_start


def run_master_step(
    catalog: GenerationCatalog,
    current_start_ms: int | None,
    task_states: dict[TaskId, TaskState],
    now_ms: int,
    min_ttl_ms: int | None = None,
    expected_tasks: "set[TaskId] | None" = None,
) -> MasterDecision:
    """T6: one iteration of the reference master loop.

    * no current generation -> adopt the first one after the saved point
      (or keep waiting if none exists yet);
    * current open -> steady state;
    * current closed -> roll over when TTL-expired (P6) or when every task
      passed the generation end (A3); otherwise keep consuming.
    """
    if current_start_ms is None:
        first = catalog.smallest_after(-(2**62))
        if first is None:
            return MasterDecision("wait_first")
        return MasterDecision("rollover", generation=None, next_generation=first)

    gen = catalog.generation_at(current_start_ms)
    if gen is None or not gen.closed:
        return MasterDecision("steady", generation=gen)

    expired = GenerationCatalog.ttl_expired(gen, now_ms, min_ttl_ms)
    consumed = all_tasks_consumed_until(task_states, gen.end_ms, expected_tasks)
    if expired or consumed:
        nxt = catalog.smallest_after(gen.start_ms)
        return MasterDecision("rollover", generation=gen, next_generation=nxt)
    return MasterDecision("wait_consumed", generation=gen)
