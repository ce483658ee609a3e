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
    arrow_render_class,
    hugeint_signature_cols,
    lint_oracles,
    oracle_arrow_schema,
    render_risk_cols,
    spark_render_class,
    type_parity_violations,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
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
    """Walk the full registry: no oracle may emit a render-risk output
    column (decimal OR unsigned — a superset of the HUGEINT signature),
    and every oracle must bind against the base views."""
    import __spark_entry__ as entrymod

    violations = lint_oracles(con, entrymod.oracle_sql())
    assert violations == {}, f"render-risk oracle outputs: {violations}"


def test_detector_fires_on_any_decimal_output(con):
    """The generalized ban (VERDICT r09 #2): ANY decimal oracle output is
    a violation — the text_temperature_weights genus, where value-equal
    DECIMAL(18,6) columns render Decimal('0.945490') through Spark's
    typed fetch but float64 0.94549 through DuckDB's."""
    bad = oracle_arrow_schema(con, "SELECT CAST(0.5 AS DECIMAL(18,6)) AS share")
    assert render_risk_cols(bad) == ["share"]
    # bare arithmetic literals are DECIMAL in DuckDB — also caught
    lucky = oracle_arrow_schema(con, "SELECT 0.5 AS target_share")
    assert render_risk_cols(lucky) == ["target_share"]
    good = oracle_arrow_schema(
        con, "SELECT CAST(CAST(0.5 AS DECIMAL(18,6)) AS DOUBLE) AS share"
    )
    assert render_risk_cols(good) == []


def test_parity_mutation_round_to_decimal(con):
    """Mutation check for the FULL parity lint: take a clean round(x,6)
    double pair, then mutate the oracle's round into a DECIMAL cast —
    the lint must fire; same for mutating the ENGINE side to decimal."""
    from pyspark.sql import types as T

    spark_schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("share", T.DoubleType()),
        ]
    )
    clean = oracle_arrow_schema(
        con, "SELECT 'a' AS source, round(1.0/3, 6) AS share"
    )
    assert type_parity_violations(spark_schema, clean) == []
    mutated = oracle_arrow_schema(
        con, "SELECT 'a' AS source, CAST(1.0/3 AS DECIMAL(18,6)) AS share"
    )
    v = type_parity_violations(spark_schema, mutated)
    assert v and "decimal" in v[0]
    # engine-side decimal is equally poisonous (Spark renders object
    # Decimal('…0') with trailing scale zeros)
    spark_dec = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("share", T.DecimalType(18, 6)),
        ]
    )
    v2 = type_parity_violations(spark_dec, clean)
    assert v2 and "decimal" in v2[0]


def test_parity_catches_hugeint_class_mismatch(con):
    """The original r04-r08 bug shape through the new lint: Spark long vs
    DuckDB HUGEINT is BOTH a decimal output and a class mismatch."""
    from pyspark.sql import types as T

    spark_schema = T.StructType([T.StructField("n", T.LongType())])
    hug = oracle_arrow_schema(con, "SELECT sum(CAST(1 AS INT)) AS n")
    assert type_parity_violations(spark_schema, hug) != []
    fixed = oracle_arrow_schema(con, "SELECT CAST(sum(CAST(1 AS INT)) AS BIGINT) AS n")
    assert type_parity_violations(spark_schema, fixed) == []


def test_parity_int_vs_float_mismatch(con):
    """int-rendered-as-float is the render divergence itself ('5' vs
    '5.0') — must fire even with no decimal anywhere."""
    from pyspark.sql import types as T

    spark_schema = T.StructType([T.StructField("n", T.LongType())])
    flt = oracle_arrow_schema(con, "SELECT CAST(5 AS DOUBLE) AS n")
    v = type_parity_violations(spark_schema, flt)
    assert v and "mismatch" in v[0]


def test_parity_benign_pairs_pass(con):
    """Width-collapsed ints, strings, bools, timestamps, dates, arrays of
    doubles: all legitimate cross-engine pairs stay clean."""
    from pyspark.sql import types as T

    spark_schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("s", T.StringType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("d", T.DateType()),
            T.StructField("arr", T.ArrayType(T.DoubleType())),
        ]
    )
    sch = oracle_arrow_schema(
        con,
        "SELECT CAST(1 AS BIGINT) AS i, 'x' AS s, true AS b, "
        "TIMESTAMP '2020-01-01' AS ts, DATE '2020-01-01' AS d, "
        "[CAST(1.5 AS DOUBLE)] AS arr",
    )
    assert type_parity_violations(spark_schema, sch) == []
    assert spark_render_class(T.LongType()) == arrow_render_class(sch.field("i").type)


def test_full_registry_spark_vs_oracle_parity(con, spark):
    """THE genus-killer walk (VERDICT r09 #2): for every registered gate,
    build the engine DataFrame (analysis only — no job for batch gates)
    and compare its Spark schema to the oracle's LIMIT-0 arrow schema by
    render class. Streaming/exec-at-build gates are skipped here (they
    run real jobs at build; check_contract covers them per-row with the
    same function)."""
    import __spark_entry__ as entrymod
    from tests.test_plans import _AUDIT_SKIP

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = {}
    for name, fn in qs.items():
        if name in _AUDIT_SKIP or name not in oracles:
            continue
        # schemas are SF-invariant: build the engine frame at the small SF
        # (analysis + any build-time collects stay cheap), lint the oracle
        # at its own SF — only the TYPES are compared
        df = fn(spark, SF_DIR)
        v = type_parity_violations(df.schema, oracle_arrow_schema(con, oracles[name]))
        if v:
            bad[name] = v
    assert bad == {}, f"typed-fetch parity violations: {bad}"
