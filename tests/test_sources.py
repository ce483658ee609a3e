"""Source-boundary robustness: timestamp representation independence.

The driver's parquet has carried three timestamp encodings across rounds
(TIMESTAMP(NANOS) → raw longs, unannotated micros → TIMESTAMP_NTZ under
Spark 4 inference, annotated micros → instant). Operators key on
epoch-µs instants, so `load_table` must yield identical values no matter
the file encoding or the ambient session timezone.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from scylla_cdc_java_spark.sources.tables import epoch_micros, load_table

SF = "/root/testdata/sf0.001"


def test_load_table_ntz_conversion_is_timezone_independent(spark):
    """The NTZ->instant conversion is timezone-EXPLICIT
    (make_timestamp(..., 'UTC')): a user-set session timezone is neither
    mutated nor able to change the produced instants — the naive-as-UTC
    reading matches DuckDB's epoch_us under any session tz."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = load_table(spark, SF, "events")
        if not any(c == "ts__ntz" or c == "ts__ns" for c in df.columns):
            return  # file carries instant-typed timestamps; nothing to do
        # the user's session timezone survives load_table untouched
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
        got = df.agg(F.min(epoch_micros(df, "ts")).alias("m")).first()["m"]
        want = duckdb.sql(
            f"SELECT min(epoch_us(ts)) FROM read_parquet('{SF}/events.parquet')"
        ).fetchone()[0]
        assert got == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_epoch_micros_matches_duckdb_for_all_timestamp_tables(spark):
    for table, col in (("events", "ts"), ("orders", "o_orderdate"), ("lineitem", "l_shipdate")):
        df = load_table(spark, SF, table)
        got = df.agg(
            F.min(epoch_micros(df, col)).alias("lo"),
            F.max(epoch_micros(df, col)).alias("hi"),
        ).first()
        want = duckdb.sql(
            f"SELECT min(epoch_us({col})), max(epoch_us({col})) "
            f"FROM read_parquet('{SF}/{table}.parquet')"
        ).fetchone()
        assert (got["lo"], got["hi"]) == want, table


def test_time_range_filter_matches_duckdb(spark):
    from scylla_cdc_java_spark.sources.tables import time_range

    df = time_range(
        load_table(spark, SF, "events"), "ts", "2024-01-02 00:00:00", "2024-01-04 00:00:00"
    )
    want = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet') "
        "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' AND ts < TIMESTAMP '2024-01-04 00:00:00'"
    ).fetchone()[0]
    assert df.count() == want
