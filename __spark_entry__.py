"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``scylla_cdc_java_spark.queries.QUERIES`` — one entry per
implemented operator from SURVEY.md §2 plus the LLM-pipeline surface, each
with a DuckDB-equivalent oracle. See that module for the implementations.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Spark python workers resolve the package by name; make sure the repo root
# is importable even when the harness launches from elsewhere.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH")
    else _REPO
)

from scylla_cdc_java_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC apply kernel materializing user_state at sf0.001."""
    fn, _, _ = QUERIES["r1_apply_delta"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql, _) in QUERIES.items() if sql is not None}
