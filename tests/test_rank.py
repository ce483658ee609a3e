"""Two-pass distributed ranking (operators/rank.py) vs the native window."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _ref(ev):
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_first(), F.col("event_id")
    )
    return ev.select(
        "event_id",
        "event_type",
        F.row_number().over(w).alias("rrank"),
        F.ntile(4).over(w).alias("rq"),
        F.percent_rank().over(w).alias("rpr"),
        F.cume_dist().over(w).alias("rcd"),
    )


def _assert_equal(two, ref):
    j = two.join(ref, ["event_id", "event_type"])
    bad = j.where(
        (F.col("rank") != F.col("rrank"))
        | (F.col("quartile") != F.col("rq"))
        | (F.col("pr") != F.col("rpr"))
        | (F.col("cd") != F.col("rcd"))
    )
    assert bad.count() == 0
    assert j.count() == two.count() == ref.count()


def test_matches_window_on_fixture(spark):
    from scylla_cdc_java_spark.operators.rank import ranked_frames
    from scylla_cdc_java_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events").select("event_id", "event_type", "value")
    two = ranked_frames(ev, "event_type", ["value", "event_id"])
    _assert_equal(two, _ref(ev))


def test_matches_window_with_nulls_and_tiny_segments(spark):
    """NULL leading values sort first (bucket 0); a 1-row segment takes
    the pr=0 branch; a 3-row segment exercises ntile's n<t fill."""
    from scylla_cdc_java_spark.operators.rank import ranked_frames

    rows = [
        (1, "a", None), (2, "a", None), (3, "a", 0.5), (4, "a", -1.0),
        (5, "solo", 9.9),
        (6, "b", 1.0), (7, "b", 2.0), (8, "b", 3.0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    two = ranked_frames(ev, "event_type", ["value", "event_id"], n_buckets=4)
    _assert_equal(two, _ref(ev))
    solo = two.where(F.col("event_type") == "solo").first()
    assert solo["pr"] == 0.0 and solo["cd"] == 1.0 and solo["quartile"] == 1


def test_partitioning_invariant(spark):
    """Bucket boundaries are value-derived literals, so the assembled
    ranks must not depend on the input's physical partitioning (the
    RangePartitioner re-sampling bug this module exists to avoid)."""
    from scylla_cdc_java_spark.operators.rank import ranked_frames
    from scylla_cdc_java_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events").select("event_id", "event_type", "value")
    key = lambda r: (r["event_id"], r["rank"], r["quartile"], r["pr"], r["cd"])
    a = sorted(map(key, ranked_frames(ev.repartition(1), "event_type", ["value", "event_id"]).collect()))
    b = sorted(map(key, ranked_frames(ev.repartition(17), "event_type", ["value", "event_id"]).collect()))
    assert a == b
