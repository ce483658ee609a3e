"""NULL-hardening wave over the CDC apply kernel (VERDICT r08 #4).

Round 8 proved planting NULLs is the highest-yield bug-finder (2 engine
bugs + 8 oracle traps from ~30 planted NULLs in the analytic fixtures).
This file aims the same probe at the CDC LOG itself: NULL payload
columns at insert, NULL ``cdc$ttl`` (explicit vs absent), NULL cells
inside collection/UDT/tuple deltas, and all-NULL rows through the
differential (engine vs pure-Python replay oracle) under shuffled
arrival + duplicate delivery — the reference's golden-test shape
(ReplicatorCorrectnessTestIT) at its null edges.
"""

from __future__ import annotations

from scylla_cdc_java_spark.model.schema import build_cdc_log_schema
from scylla_cdc_java_spark.operators import apply_cdc_log
from scylla_cdc_java_spark.testing import CdcLogGenerator, FIXTURE_TABLES

from test_apply import _canon, run_diff


def test_insert_all_null_payload(spark):
    """INSERT with every regular column NULL: the row marker alone keeps
    the row alive (CQL: INSERT writes a marker even with all-null cells)."""
    dml = [("insert", ("a",), (1,), {"v1": None, "v2": None})]
    rows = run_diff(spark, "tbl_simple", dml)
    assert len(rows) == 1
    assert rows[0]["v1"] is None and rows[0]["v2"] is None


def test_update_all_null_payload_is_row_absent(spark):
    """UPDATE writing only tombstones on an absent row leaves nothing:
    no marker, no live cells."""
    dml = [("update", ("a",), (1,), {"v1": None, "v2": None})]
    assert run_diff(spark, "tbl_simple", dml) == []


def test_null_then_value_then_null_cell_cycle(spark):
    """Cell tombstone → rewrite → tombstone again; last write wins and
    the insert marker keeps the row visible throughout."""
    dml = [
        ("insert", ("a",), (1,), {"v1": None}),
        ("update", ("a",), (1,), {"v1": 5}),
        ("update", ("a",), (1,), {"v1": None}),
    ]
    rows = run_diff(spark, "tbl_simple", dml)
    assert len(rows) == 1 and rows[0]["v1"] is None


def test_explicit_null_ttl_equals_absent_ttl(spark):
    """cdc$ttl NULL (explicit 5-tuple) and absent (4-tuple) must encode
    and apply identically: no expiry at any as-of horizon."""
    desc = FIXTURE_TABLES["tbl_simple"]
    gen = CdcLogGenerator(desc)
    dml = [
        ("insert", ("a",), (1,), {"v1": 1, "v2": "explicit"}, None),
        ("insert", ("a",), (2,), {"v1": 2, "v2": "absent"}),
    ]
    rows_enc = gen.encode(dml)
    assert all(r["cdc$ttl"] is None for r in rows_enc)
    df = spark.createDataFrame(rows_enc, build_cdc_log_schema(desc))
    t_last = max(r["cdc$time_ts"] for r in rows_enc)
    far = int(t_last.timestamp() * 1e6) + 10 * 365 * 86400 * 1_000_000
    got = {r["ck"]: r for r in apply_cdc_log(df, desc, as_of_micros=far).collect()}
    assert set(got) == {1, 2}
    assert got[1]["v2"] == "explicit" and got[2]["v2"] == "absent"


def test_ttl_row_with_null_payload_expires_to_nothing(spark):
    """TTL'd INSERT whose only content is NULL cells: after expiry the
    marker dies and nothing remains (no ghost row of pure tombstones)."""
    desc = FIXTURE_TABLES["tbl_simple"]
    gen = CdcLogGenerator(desc)
    rows_enc = gen.encode([("insert", ("a",), (1,), {"v1": None, "v2": None}, 60)])
    df = spark.createDataFrame(rows_enc, build_cdc_log_schema(desc))
    t_last = max(r["cdc$time_ts"] for r in rows_enc)
    late = int(t_last.timestamp() * 1e6) + 3600 * 1_000_000
    assert apply_cdc_log(df, desc, as_of_micros=late).collect() == []
    soon = int(t_last.timestamp() * 1e6) + 1_000_000
    got = apply_cdc_log(df, desc, as_of_micros=soon).collect()
    assert len(got) == 1 and got[0]["v1"] is None


def test_udt_delta_null_field_is_noop(spark):
    """UDT partial update: a NULL in ``fields`` is NOT a field removal
    (removal rides remove_idx) — the prior field value survives."""
    dml = [
        ("insert", ("a",), (1,), {"v": {"fields": {"a": 1, "b": 2, "c": "x"}}}),
        ("update", ("a",), (1,), {"v": {"fields": {"a": None, "b": 20}}}),
    ]
    rows = run_diff(spark, "tbl_udts", dml)
    assert _canon(rows[0]["v"]) == (1, 20, "x")


def test_udt_delta_all_null_fields_with_remove(spark):
    """UDT update whose ``fields`` are all NULL combined with remove_idx:
    only the removal acts; an all-null-fields row must not resurrect or
    clobber the struct."""
    dml = [
        ("insert", ("a",), (1,), {"v": {"fields": {"a": 1, "b": 2, "c": "x"}}}),
        ("update", ("a",), (1,), {"v": {"fields": {"a": None}, "remove_idx": [2]}}),
    ]
    rows = run_diff(spark, "tbl_udts", dml)
    assert _canon(rows[0]["v"]) == (1, 2, None)


def test_udt_overwrite_null_then_field_write(spark):
    """UDT overwrite-to-NULL (whole-cell tombstone) followed by a single
    field write: the struct rebuilds from all-null + that field."""
    dml = [
        ("insert", ("a",), (1,), {"v": {"fields": {"a": 1, "b": 2, "c": "x"}}}),
        ("update", ("a",), (1,), {"v": {"overwrite_null": True, "fields": {"b": 9}}}),
    ]
    rows = run_diff(spark, "tbl_udts", dml)
    assert _canon(rows[0]["v"]) == (None, 9, None)


def test_frozen_tuple_null_elements(spark):
    """Frozen tuple values carrying NULL elements — (None, s), (i, None),
    (None, None) — are all distinct live values, and an explicit None is
    the cell tombstone."""
    dml = [
        ("insert", ("a",), (1,), {"v": (None, "s")}),
        ("insert", ("a",), (2,), {"v": (7, None)}),
        ("insert", ("a",), (3,), {"v": (None, None)}),
        ("insert", ("a",), (4,), {"v": (1, "x")}),
        ("update", ("a",), (4,), {"v": None}),
    ]
    rows = run_diff(spark, "tbl_tuples", dml)
    by = {r["ck"]: _canon(r["v"]) for r in rows}
    assert by[1] == (None, "s") and by[2] == (7, None)
    assert by[3] == (None, None) and by[4] is None


def test_set_add_empty_delta_is_noop(spark):
    """A set delta whose add payload is the EMPTY collection (not NULL)
    must be a no-op, not an overwrite and not a tombstone."""
    dml = [
        ("insert", ("a",), (1,), {"v": {"overwrite": [1, 2]}}),
        ("update", ("a",), (1,), {"v": {"add": []}}),
    ]
    rows = run_diff(spark, "tbl_sets", dml)
    assert sorted(rows[0]["v"]) == [1, 2]


def test_set_overwrite_null_is_tombstone(spark):
    """overwrite: None = whole-cell tombstone (deleted marker, no payload);
    a later add rebuilds from empty."""
    dml = [
        ("insert", ("a",), (1,), {"v": {"overwrite": [1, 2]}}),
        ("update", ("a",), (1,), {"v": {"overwrite": None}}),
        ("update", ("a",), (1,), {"v": {"add": [9]}}),
    ]
    rows = run_diff(spark, "tbl_sets", dml)
    assert sorted(rows[0]["v"]) == [9]


def test_map_overwrite_empty_vs_null(spark):
    """overwrite {} (deleted marker + empty payload) and overwrite None
    (deleted marker only) must both leave the map absent — then a fresh
    add starts from empty on both paths."""
    dml = [
        ("insert", ("a",), (1,), {"v": {"overwrite": {1: 10}}}),
        ("update", ("a",), (1,), {"v": {"overwrite": {}}}),
        ("insert", ("b",), (1,), {"v": {"overwrite": {2: 20}}}),
        ("update", ("b",), (1,), {"v": {"overwrite": None}}),
    ]
    rows = run_diff(spark, "tbl_maps", dml)
    by = {r["pk"]: r["v"] for r in rows}
    assert by["a"] is None and by["b"] is None


def test_map_remove_absent_and_live_keys(spark):
    """Map element removal of a key that was never present alongside a
    live key: only the live key dies; removing the LAST key kills the
    cell entirely (NULL, not empty map)."""
    dml = [
        ("insert", ("a",), (1,), {"v": {"overwrite": {1: 10, 2: 20}}}),
        ("update", ("a",), (1,), {"v": {"remove": [2, 99]}}),
        ("update", ("a",), (1,), {"v": {"remove": [1]}}),
    ]
    rows = run_diff(spark, "tbl_maps", dml)
    assert rows[0]["v"] is None


def test_list_append_null_element(spark):
    """List append of a NULL element: the timeuuid cell exists with a
    NULL payload — both engine and oracle must carry it positionally."""
    dml = [
        ("insert", ("a",), (1,), {"v": {"overwrite": [7]}}),
        ("update", ("a",), (1,), {"v": {"add": [None, 9]}}),
    ]
    rows = run_diff(spark, "tbl_lists", dml)
    assert list(rows[0]["v"]) == [7, None, 9]


def test_map_delta_null_valued_entry_carried_verbatim(spark):
    """A NULL-VALUED entry inside a delta map payload: Scylla's wire never
    emits this (SET v[k]=null rides cdc$deleted_elements as a removal),
    but a defensive engine must still have defined semantics — both the
    kernel and the replay oracle carry the entry verbatim as a live key
    with a NULL value, NOT as a removal and NOT dropped."""
    dml = [
        ("insert", ("a",), (1,), {"v": {"overwrite": {1: 10, 2: 20}}}),
        ("update", ("a",), (1,), {"v": {"add": {2: None, 3: 30}}}),
    ]
    rows = run_diff(spark, "tbl_maps", dml)
    assert _canon(rows[0]["v"]) == _canon({1: 10, 2: None, 3: 30})


def test_null_payload_fuzz_differential(spark):
    """Seeded fuzz where HALF of all scalar cell writes are NULL and
    collections mix empty/None payloads — shuffled arrival + duplicate
    delivery, engine vs replay oracle."""
    import random

    rng = random.Random(909)
    for table in ("tbl_simple", "tbl_sets", "tbl_maps"):
        dml = []
        for i in range(60):
            pk = (rng.choice("abc"),)
            ck = (rng.randrange(4),)
            if table == "tbl_simple":
                cells = {
                    "v1": None if rng.random() < 0.5 else rng.randrange(100),
                    "v2": None if rng.random() < 0.5 else f"s{i}",
                }
                kind = rng.choice(["insert", "update", "row_delete"])
                dml.append((kind, pk, ck) if kind == "row_delete" else (kind, pk, ck, cells))
            else:
                mode = rng.choice(["overwrite", "add", "remove"])
                if mode == "remove":
                    cw = {"remove": [rng.randrange(6)]}
                elif table == "tbl_maps":
                    payload = (
                        None
                        if rng.random() < 0.2
                        else {rng.randrange(6): rng.randrange(100) for _ in range(2)}
                    )
                    cw = {mode: payload}
                else:
                    payload = (
                        None
                        if rng.random() < 0.2
                        else [rng.randrange(6) for _ in range(2)]
                    )
                    cw = {mode: payload}
                kind = rng.choice(["insert", "update"])
                dml.append((kind, pk, ck, {"v": cw}))
        run_diff(spark, table, dml)
