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
        df = df.withColumn(
            c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000").cast("long"))
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
