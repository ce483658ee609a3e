"""J3/R7 pre-image verification: cell-wise compare of PRE_IMAGE rows
against the materialized state (reference PreImageOperationHandler)."""

from __future__ import annotations

from datetime import datetime, timezone

from scylla_cdc_java_spark.functions.streamid import make_stream_id
from scylla_cdc_java_spark.functions.timeuuid import make_timeuuid
from scylla_cdc_java_spark.model.schema import build_cdc_log_schema
from scylla_cdc_java_spark.operators import apply_cdc_log
from scylla_cdc_java_spark.operators.preimage import preimage_report
from scylla_cdc_java_spark.testing import CdcLogGenerator, FIXTURE_TABLES

_T0 = 1_700_000_000_000_000


def _pre_row(schema, micros, seq, **values):
    row = {f.name: None for f in schema.fields}
    row.update(
        {
            "cdc$stream_id": bytearray(make_stream_id(0)),
            "cdc$time": str(make_timeuuid(micros, clock_seq_and_node=seq + 1)),
            "cdc$time_ts": datetime.fromtimestamp(micros / 1e6, tz=timezone.utc),
            "cdc$batch_seq_no": seq,
            "cdc$operation": 0,
            "cdc$end_of_batch": True,
        }
    )
    row.update(values)
    return row


def test_preimage_scalar_consistent_and_not(spark):
    desc = FIXTURE_TABLES["tbl_simple"]
    gen = CdcLogGenerator(desc)
    dml = [
        ("insert", ("a",), (1,), {"v1": 10, "v2": "x"}),
        ("insert", ("a",), (2,), {"v1": 20, "v2": None}),
    ]
    state = apply_cdc_log(gen.spark_df(spark, dml, shuffle=False), desc)
    schema = build_cdc_log_schema(desc)
    pres = [
        # consistent: checks only the cells it carries
        _pre_row(schema, _T0, 0, pk="a", ck=1, v1=10),
        # v2 mismatch (claims "y", state has "x")
        _pre_row(schema, _T0 + 1, 1, pk="a", ck=1, v2="y"),
        # row missing from state entirely
        _pre_row(schema, _T0 + 2, 2, pk="zzz", ck=9, v1=1),
        # null cells are not checked (reference: only present cells compared)
        _pre_row(schema, _T0 + 3, 3, pk="a", ck=2, v1=20),
    ]
    rep = preimage_report(spark.createDataFrame(pres, schema), state, desc)
    rows = sorted(rep.collect(), key=lambda r: r["cdc$time_micros"])
    assert [r["n_mismatch"] for r in rows] == [0, 1, 1, 0]
    assert [r["n_checked"] for r in rows] == [1, 1, 1, 1]
    assert not rows[0]["row_missing"]
    assert rows[1]["mismatched_cols"] == ["v2"]
    assert rows[2]["row_missing"] and rows[2]["mismatched_cols"] == ["v1"]


def test_preimage_collections(spark):
    desc = FIXTURE_TABLES["tbl_sets"]
    gen = CdcLogGenerator(desc)
    dml = [
        ("insert", ("a",), (1,), {"v": {"overwrite": [3, 1, 2]}}),
    ]
    state = apply_cdc_log(gen.spark_df(spark, dml, shuffle=False), desc)
    schema = build_cdc_log_schema(desc)
    pres = [
        _pre_row(schema, _T0, 0, pk="a", ck=1, v=[1, 2, 3]),  # order-insensitive match
        _pre_row(schema, _T0 + 1, 1, pk="a", ck=1, v=[1, 2]),  # content mismatch
    ]
    rep = preimage_report(spark.createDataFrame(pres, schema), state, desc)
    rows = sorted(rep.collect(), key=lambda r: r["cdc$time_micros"])
    assert rows[0]["n_mismatch"] == 0
    assert rows[1]["mismatched_cols"] == ["v"]


def test_preimage_lists_timeuuid_order(spark):
    desc = FIXTURE_TABLES["tbl_lists"]
    gen = CdcLogGenerator(desc)
    dml = [
        ("insert", ("a",), (1,), {"v": {"overwrite": [7, 8, 9]}}),
    ]
    state = apply_cdc_log(gen.spark_df(spark, dml, shuffle=False), desc)
    schema = build_cdc_log_schema(desc)
    # the pre-image carries the list in log form: map<timeuuid, elem>; keys
    # deliberately constructed so *string* order differs from time order
    k1 = str(make_timeuuid(_T0 + 10, 1))
    k2 = str(make_timeuuid(_T0 + 20, 2))
    good = _pre_row(schema, _T0, 0, pk="a", ck=1, v={k2: 8, k1: 7})
    good["v"] = {k1: 7, k2: 8, str(make_timeuuid(_T0 + 30, 3)): 9}
    bad = _pre_row(schema, _T0 + 1, 1, pk="a", ck=1, v={k1: 9, k2: 7})
    rep = preimage_report(spark.createDataFrame([good, bad], schema), state, desc)
    rows = sorted(rep.collect(), key=lambda r: r["cdc$time_micros"])
    assert rows[0]["n_mismatch"] == 0  # [7,8,9] in timeuuid order
    assert rows[1]["mismatched_cols"] == ["v"]
