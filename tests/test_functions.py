from __future__ import annotations

import random
import uuid

import pytest
from pyspark.sql import functions as F

from scylla_cdc_java_spark.functions import (
    ExponentialRetryBackoffWithJitter,
    end_of_ms,
    format_cql_date,
    format_cql_duration,
    make_stream_id,
    make_timeuuid,
    start_of_ms,
    timeuuid_micros,
    timeuuid_micros_col,
    timeuuid_ts_col,
    vnode_col,
    vnode_from_stream_id,
)


def test_timeuuid_roundtrip_pure():
    for micros in [0, 1, 1_700_000_000_000_000, 123_456_789_012_345]:
        u = make_timeuuid(micros, clock_seq_and_node=0x1234)
        assert u.version == 1
        assert timeuuid_micros(u) == micros
        assert timeuuid_micros(str(u)) == micros


def test_timeuuid_known_value():
    # A v1 uuid whose timestamp we can derive independently via the stdlib.
    u = uuid.uuid1()
    expect = (u.time - 0x01B21DD213814000) // 10
    assert timeuuid_micros(u) == expect


def test_start_end_of_ms_order():
    ms = 1_700_000_000_000
    lo, hi = start_of_ms(ms), end_of_ms(ms)
    # version bits are forced to 1 in the msb (the reference's synthetic bound
    # uuids keep their fixed clock-seq constants, which are not RFC-variant,
    # so stdlib .version is not reliable here — check the msb nibble directly)
    assert (lo.int >> 76) & 0xF == 1 and (hi.int >> 76) & 0xF == 1
    # start-of covers the whole millisecond below any real uuid in it
    real = make_timeuuid(ms * 1000 + 999, clock_seq_and_node=0)
    assert timeuuid_micros(lo) <= timeuuid_micros(real) <= timeuuid_micros(hi)
    # end_of(ms) is strictly below start_of(ms+1): no 1 ms overlap
    assert hi.time < start_of_ms(ms + 1).time


def test_timeuuid_spark_expression_matches_python(spark):
    rng = random.Random(42)
    micros = [rng.randrange(0, 2_000_000_000_000_000) for _ in range(200)]
    rows = [(str(make_timeuuid(m, clock_seq_and_node=rng.getrandbits(63))),) for m in micros]
    df = spark.createDataFrame(rows, "u string")
    got = [
        r["m"]
        for r in df.select(timeuuid_micros_col("u").alias("m")).collect()
    ]
    assert got == [timeuuid_micros(u) for (u,) in rows]
    # timestamp variant parses
    df.select(timeuuid_ts_col("u").alias("ts")).collect()


def test_vnode_extraction_pure_and_spark(spark):
    rng = random.Random(7)
    vnodes = [rng.randrange(0, 1 << 22) for _ in range(100)]
    ids = [make_stream_id(v, index=i) for i, v in enumerate(vnodes)]
    assert [vnode_from_stream_id(b) for b in ids] == vnodes
    df = spark.createDataFrame([(bytearray(b),) for b in ids], "sid binary")
    got = [r["v"] for r in df.select(vnode_col("sid").alias("v")).collect()]
    assert got == vnodes


def test_vnode_bits_outside_mask_ignored():
    # bits 0..3 and 26+ of the lower qword must not affect the vnode
    b = bytearray(make_stream_id(1234, index=5))
    b[15] |= 0x0F  # version nibble
    b[8] = 0xFF  # high bits of lower qword
    assert vnode_from_stream_id(bytes(b)) == 1234


def test_format_duration():
    assert format_cql_duration(14, 3, 0) == "1y2mo3d"
    assert format_cql_duration(0, 0, 0) == "0s"
    ns = 4 * 3_600_000_000_000 + 5 * 60_000_000_000 + 6 * 1_000_000_000 + 7
    assert format_cql_duration(0, 0, ns) == "4h5m6s7ns"
    assert format_cql_duration(-14, -3, 0) == "-1y2mo3d"


def test_format_date():
    assert format_cql_date(2024, 1, 9) == "2024-01-09"
    assert format_cql_date(33, 12, 31) == "0033-12-31"


def test_backoff_monotone_capped():
    b = ExponentialRetryBackoffWithJitter(rng=random.Random(0))
    vals = [b.backoff_ms(a) for a in range(0, 20)]
    assert all(v <= 30_000 for v in vals)
    assert b.backoff_ms(100) <= 30_000  # overflow-safe
    nojit = ExponentialRetryBackoffWithJitter(jitter_percent=0)
    assert nojit.backoff_ms(0) == 50
    assert nojit.backoff_ms(3) == 400
    assert nojit.backoff_ms(60) == 30_000


def test_task_state_serde_roundtrip():
    from scylla_cdc_java_spark.model import (
        TaskId,
        TaskState,
        task_state_from_map,
        task_state_to_map,
    )

    tid = TaskId("ks", "t", 1_700_000_000_000, 42)
    assert TaskId.from_key(tid.key()) == tid

    st = TaskState(1000, 4000, "AB" * 16, str(make_timeuuid(123456)))
    assert task_state_from_map(task_state_to_map(st)) == st
    assert st.last_consumed_micros() == 123456

    assert st.move_to_next_window(3000) == TaskState(4000, 7000)
    assert not st.has_passed(1000)
    assert st.has_passed(999)
    # reference trimTaskState: partially-overlapping windows stay untouched;
    # only a window that ended entirely before the minimum is reset, and it
    # re-spans window_size_ms from the minimum.
    assert st.trim(2000) is st
    assert st.trim(500) is st
    reset = st.trim(5000, window_size_ms=3000)
    assert reset == TaskState(5000, 8000)
    assert reset.last_consumed_time is None


# ---- property tests (hypothesis) -------------------------------------------

from hypothesis import given, settings, strategies as st


@given(st.integers(min_value=0, max_value=(1 << 59) // 10 - 1))
@settings(max_examples=200, deadline=None)
def test_timeuuid_roundtrip_property(micros):
    from scylla_cdc_java_spark.functions.timeuuid import make_timeuuid, timeuuid_micros

    assert timeuuid_micros(make_timeuuid(micros)) == micros


@given(st.integers(min_value=0, max_value=(1 << 22) - 1), st.integers(min_value=0, max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_streamid_vnode_roundtrip_property(vnode, index):
    from scylla_cdc_java_spark.functions.streamid import (
        make_stream_id,
        vnode_from_stream_id,
    )

    sid = make_stream_id(vnode, index=index)
    assert len(sid) == 16 and vnode_from_stream_id(sid) == vnode


# upper bound: the 60-bit v1 timestamp field caps wall-clock at ~year 5236;
# stay within it (same inherent limit as the reference's TimeUUID)
@given(st.integers(min_value=0, max_value=10**13))
@settings(max_examples=100, deadline=None)
def test_window_bounds_cover_ms_property(ms):
    """start_of_ms(ms) <= any uuid in ms < ... <= end_of_ms(ms), and windows
    [a,b) / [b,c) never share a uuid (the 1 ms overlap fix)."""
    from scylla_cdc_java_spark.functions.timeuuid import (
        end_of_ms,
        make_timeuuid,
        start_of_ms,
        timeuuid_micros,
    )

    lo, hi = start_of_ms(ms), end_of_ms(ms)
    assert timeuuid_micros(lo) == ms * 1000
    assert timeuuid_micros(hi) == (ms + 1) * 1000 - 1  # last tick of the ms
    inside = make_timeuuid(ms * 1000 + 500)
    assert lo.time <= inside.time <= hi.time
    nxt = start_of_ms(ms + 1)
    assert hi.time < nxt.time


def test_format_change_printer():
    from scylla_cdc_java_spark.functions.render import format_change

    row = {
        "cdc$stream_id": b"\x00" * 15 + b"\x31",
        "cdc$time": "00000000-0000-1000-8080-808080808080",
        "cdc$batch_seq_no": 0,
        "cdc$operation": 2,
        "pk": "a",
        "ck": 1,
        "v1": 42,
    }
    out = format_change(row, ["pk"], ["ck"])
    assert out.splitlines()[0].startswith("[ROW_INSERT] stream=")
    assert "PARTITION_KEY   pk = 'a'" in out
    assert "CLUSTERING_KEY  ck = 1" in out
    assert "REGULAR         v1 = 42" in out


# ---- CQL type compiler (F9) -------------------------------------------------


def test_cql_scalar_mapping():
    from pyspark.sql import types as T

    from scylla_cdc_java_spark.functions.cqltypes import parse_cql_type

    cases = {
        "text": T.StringType(),
        "BIGINT": T.LongType(),
        "blob": T.BinaryType(),
        "decimal": T.DecimalType(38, 18),
        "varint": T.DecimalType(38, 0),
        "smallint": T.ShortType(),
        "tinyint": T.ByteType(),
        "timeuuid": T.StringType(),
        "time": T.LongType(),
    }
    for s, want in cases.items():
        got, frozen = parse_cql_type(s)
        assert got == want and frozen, s
    dur, _ = parse_cql_type("duration")
    assert [f.name for f in dur.fields] == ["months", "days", "nanoseconds"]


def test_cql_nested_and_frozen():
    from pyspark.sql import types as T

    from scylla_cdc_java_spark.functions.cqltypes import parse_cql_type

    t, frozen = parse_cql_type("map<int, frozen<list<text>>>")
    assert t == T.MapType(T.IntegerType(), T.ArrayType(T.StringType()))
    assert not frozen  # outer map is bare -> non-frozen
    t2, frozen2 = parse_cql_type("frozen<map<int,text>>")
    assert frozen2 and isinstance(t2, T.MapType)
    tup, ftup = parse_cql_type("tuple<int, text, tuple<int,int>>")
    assert ftup and [f.name for f in tup.fields] == ["_1", "_2", "_3"]
    udt, fudt = parse_cql_type("addr", udts={"addr": {"street": "text", "zip": "int"}})
    assert not fudt and [f.name for f in udt.fields] == ["street", "zip"]


def test_descriptor_from_cql_and_log_schema():
    from pyspark.sql import types as T

    from scylla_cdc_java_spark.functions.cqltypes import (
        descriptor_from_cql,
        min_table_ttl_ms,
        validate_descriptor,
    )
    from scylla_cdc_java_spark.model.schema import build_cdc_log_schema

    desc = descriptor_from_cql(
        "t",
        {
            "pk": "text",
            "ck": "int",
            "vals": "list<int>",
            "tags": "set<text>",
            "props": "map<int,text>",
            "snap": "frozen<list<int>>",
        },
        ["pk"],
        ["ck"],
        ttl_seconds=86400,
    )
    validate_descriptor(desc)
    assert desc.non_frozen_collections == ["vals", "tags", "props"]
    assert desc.list_columns == ["vals"]
    log = build_cdc_log_schema(desc)
    # non-frozen list logged as map<timeuuid, elem>; frozen list stays array
    assert log["vals"].dataType == T.MapType(T.StringType(), T.IntegerType())
    assert log["snap"].dataType == T.ArrayType(T.IntegerType())
    assert "cdc$deleted_elements_vals" in log.fieldNames()
    assert "cdc$deleted_elements_snap" not in log.fieldNames()

    other = descriptor_from_cql("u", {"pk": "int"}, ["pk"], ttl_seconds=3600)
    assert min_table_ttl_ms([desc, other]) == 3600 * 1000
    no_ttl = descriptor_from_cql("w", {"pk": "int"}, ["pk"])
    assert min_table_ttl_ms([desc, no_ttl]) is None  # None-as-epoch-0 sentinel


def test_validate_descriptor_rejects_bad_tables():
    import pytest as _pytest

    from scylla_cdc_java_spark.functions.cqltypes import (
        descriptor_from_cql,
        validate_descriptor,
    )

    with _pytest.raises(ValueError, match="partition key"):
        validate_descriptor(descriptor_from_cql("t", {"a": "int"}, []))
    with _pytest.raises(ValueError, match="not declared"):
        validate_descriptor(descriptor_from_cql("t", {"a": "int"}, ["missing"]))
    with _pytest.raises(ValueError, match="unsupported CQL type"):
        descriptor_from_cql("t", {"a": "fancytype"}, ["a"])
