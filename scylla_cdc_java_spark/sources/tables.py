"""Parquet table loader tolerant of TIMESTAMP(NANOS) columns.

The synthetic fixture tables are written with nanosecond-precision parquet
timestamps, which Spark's vectorized reader rejects outright
(``PARQUET_TYPE_ILLEGAL``). We flip the session to read nanos as raw longs
(``spark.sql.legacy.parquet.nanosAsLong``) and rebuild proper µs
``TimestampType`` columns with exact integer arithmetic — the conversion is
a native projection, so scans stay vectorized + codegen'd and filter/column
pushdown still reaches parquet for the untouched columns.

The ns→µs division uses ``DIV`` (integer) — ns-since-epoch exceeds double's
53-bit mantissa, so a float division would corrupt timestamps.
"""

from __future__ import annotations

from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@lru_cache(maxsize=256)
def _nanos_timestamp_columns(path: str) -> tuple[str, ...]:
    """Column names carrying parquet timestamp[ns] — metadata-only read."""
    schema = pq.read_schema(path)
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return tuple(out)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    ns_cols = _nanos_timestamp_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # keep the raw nanos long as <c>__ns: predicates on the *converted*
        # timestamp cannot push through the cast, but a range filter on the
        # raw long reaches the parquet scan (row-group stats pruning) — see
        # time_range(). Column pruning drops it when unused.
        df = df.withColumn(f"{c}__ns", F.col(c)).withColumn(
            c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000").cast("long"))
        )
    return df


def time_range(df: DataFrame, col: str, lo: str | None = None, hi: str | None = None) -> DataFrame:
    """Pushdown-friendly event-time range filter ``[lo, hi)``.

    Filters on the raw ``<col>__ns`` long when present so the predicate
    lands in PushedFilters (parquet row-group pruning at scale); falls back
    to the converted timestamp column otherwise. Bounds are
    ``YYYY-MM-DD HH:MM:SS`` UTC strings.
    """
    from datetime import datetime, timezone

    raw = f"{col}__ns"

    def ns(bound: str) -> int:
        dt = datetime.fromisoformat(bound).replace(tzinfo=timezone.utc)
        return int(dt.timestamp()) * 1_000_000_000

    if raw in df.columns:
        if lo is not None:
            df = df.where(F.col(raw) >= F.lit(ns(lo)))
        if hi is not None:
            df = df.where(F.col(raw) < F.lit(ns(hi)))
        return df
    if lo is not None:
        df = df.where(F.col(col) >= F.lit(lo).cast("timestamp"))
    if hi is not None:
        df = df.where(F.col(col) < F.lit(hi).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
