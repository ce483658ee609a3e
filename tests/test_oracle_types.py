"""Oracle output-typing lint (VERDICT r08 "Next round" #2).

Every registered oracle's FINAL select must pin integer aggregates to the
engine's result type: DuckDB ``sum(int)`` returns HUGEINT (int128 /
``decimal128(38,0)`` via arrow / ``float64`` via pandas), while Spark's
``sum`` emits LongType — equal values, divergent typed rendering, hash
mismatch on the driver but invisible locally.  This was the single root
cause of the six red driver rows across rounds 4-8.

The lint binds each oracle with LIMIT 0 (types only) and fails on any
output column carrying the HUGEINT signature.  A mutation check proves
the detector fires on a deliberately un-cast sum.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_lint import (  # noqa: E402
    hugeint_signature_cols,
    lint_oracles,
    oracle_arrow_schema,
)

SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def con():
    from scylla_cdc_java_spark.sources.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = f"{SF_DIR_ORACLE}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def test_detector_fires_on_uncast_sum(con):
    """Mutation check: the exact defect shape (un-cast sum over int) must
    be flagged, and the CAST AS BIGINT repair must clear it."""
    bad = oracle_arrow_schema(
        con, "SELECT source, sum(CAST(len(text) AS INT)) AS n FROM documents GROUP BY source"
    )
    assert hugeint_signature_cols(bad) == ["n"]
    good = oracle_arrow_schema(
        con,
        "SELECT source, CAST(sum(CAST(len(text) AS INT)) AS BIGINT) AS n "
        "FROM documents GROUP BY source",
    )
    assert hugeint_signature_cols(good) == []


def test_detector_fires_on_ubigint(con):
    schema = oracle_arrow_schema(con, "SELECT CAST(1 AS UBIGINT) AS u")
    assert hugeint_signature_cols(schema) == ["u"]


def test_all_registered_oracles_pin_integer_aggregates(con):
    """Walk the full registry: no oracle may emit a HUGEINT-signature
    output column, and every oracle must bind against the base views."""
    import __spark_entry__ as entrymod

    violations = lint_oracles(con, entrymod.oracle_sql())
    assert violations == {}, f"un-cast integer aggregate outputs: {violations}"
