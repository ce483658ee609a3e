"""Oracle output-typing lint: kill the HUGEINT class for good.

Root cause of the r04-r08 red driver rows (VERDICT r08 "What's wrong" #1):
DuckDB's ``sum`` over an integer column returns HUGEINT (int128), which
arrow surfaces as ``decimal128(38, 0)`` and pandas as ``float64`` — so a
value-equal column renders ``1435.0`` through the driver's typed fetch
path while Spark's LongType renders ``1435``.  Equal values, different
bytes, hash mismatch; invisible to a ``fetchall()``-based checker because
DuckDB hands HUGEINT to Python as a plain ``int``.

The fix is a CAST in the oracle's final select; this module is the lint
that holds the line: probe each registered oracle's output schema through
arrow (LIMIT 0 — types only, no data) and flag any column whose type is
the HUGEINT signature.  Spark cannot emit ``decimal128(38, 0)`` unless a
query deliberately casts to DECIMAL(38,0) — no registered gate does — so
any hit is an un-cast integer aggregate.
"""

from __future__ import annotations

import pyarrow as pa


def oracle_arrow_schema(con, sql: str) -> pa.Schema:
    """Bind *sql* against *con*'s views and return the arrow output schema
    without materializing rows (outer LIMIT 0)."""
    inner = sql.strip().rstrip(";")
    return con.sql(f"SELECT * FROM ({inner}) __lint_q LIMIT 0").fetch_arrow_table().schema


def hugeint_signature_cols(schema: pa.Schema) -> list[str]:
    """Column names whose arrow type betrays an un-cast 128-bit integer:
    decimal128(38, 0) (DuckDB HUGEINT) or uint64 (UBIGINT) — both render
    differently from Spark's LongType through a pandas/arrow fetch."""
    bad = []
    for field in schema:
        t = field.type
        if pa.types.is_decimal(t) and t.precision == 38 and t.scale == 0:
            bad.append(field.name)
        elif t == pa.uint64():
            bad.append(field.name)
    return bad


def render_risk_cols(schema: pa.Schema) -> list[str]:
    """Superset of the HUGEINT signature: every output column whose arrow
    type is render-divergent between the two engines' typed fetch paths —
    ANY decimal (DuckDB's fetch_df converts DECIMAL to float64 ``0.94549``
    while Spark's toPandas keeps ``Decimal('0.945490')`` — equal values,
    different bytes; the r04-r09 ``text_temperature_weights`` root cause)
    and any unsigned integer. The repair is always the same: cast the
    oracle's (and, for decimals, the engine's) OUTPUT column to the render
    type — BIGINT for integer aggregates, DOUBLE for ratios/money edges;
    decimals stay interior math types only."""
    bad = []
    for field in schema:
        t = field.type
        if pa.types.is_decimal(t) or (pa.types.is_integer(t) and not pa.types.is_signed_integer(t)):
            bad.append(field.name)
    return bad


def spark_render_class(dt) -> str:
    """Collapse a pyspark DataType to its typed-fetch render class — two
    columns hash identically through the driver's arrow/pandas fetch iff
    their classes match (int widths collapse: 5 renders '5' at any width;
    int-vs-float does NOT: '5' vs '5.0' was the HUGEINT bug)."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, T.DoubleType):
        return "float"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.ArrayType):
        return f"array<{spark_render_class(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{spark_render_class(dt.keyType)},{spark_render_class(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{spark_render_class(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    if isinstance(dt, T.NullType):
        return "null"
    return f"other:{dt.simpleString()}"


def arrow_render_class(t: pa.DataType) -> str:
    """Arrow-side twin of :func:`spark_render_class`."""
    if pa.types.is_signed_integer(t):
        return "int"
    if pa.types.is_unsigned_integer(t):
        return "uint"
    if t == pa.float64():
        return "float"
    if t == pa.float32() or t == pa.float16():
        return "float32"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) or pa.types.is_fixed_size_binary(t):
        return "binary"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"array<{arrow_render_class(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{arrow_render_class(t.key_type)},{arrow_render_class(t.item_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{t.field(i).name}:{arrow_render_class(t.field(i).type)}" for i in range(t.num_fields))
        return f"struct<{inner}>"
    if pa.types.is_null(t):
        return "null"
    return f"other:{t}"


# Gate output columns allowed to be DECIMAL on either side.  TARGET: stays
# empty forever — a decimal OUTPUT column is typed-fetch poison by
# construction; decimals are interior math types, cast at the edge.
ALLOWED_DECIMAL_OUTPUTS: frozenset[str] = frozenset()


def type_parity_violations(
    spark_schema, arrow_schema: pa.Schema, allow_decimal: frozenset = ALLOWED_DECIMAL_OUTPUTS
) -> list[str]:
    """Full engine-vs-oracle output-typing parity (VERDICT r09 #2): match
    columns by name, collapse each side to its render class, and report

    * any class mismatch (e.g. Spark int vs oracle decimal — HUGEINT),
    * any DECIMAL output on EITHER side (unless allowlisted),
    * any unsigned integer on the oracle side.

    Returns human-readable ``"col: spark=X oracle=Y"`` strings; empty list
    means the pair cannot hash-diverge on typing through a typed fetch."""
    out: list[str] = []
    sclasses = {f.name: spark_render_class(f.dataType) for f in spark_schema.fields}
    aclasses = {f.name: arrow_render_class(f.type) for f in arrow_schema}
    for name, sc in sclasses.items():
        ac = aclasses.get(name)
        if ac is None:
            continue  # column-name parity is schema_ok's job, not ours
        if ("decimal" in sc or "decimal" in ac) and name not in allow_decimal:
            out.append(f"{name}: decimal output (spark={sc} oracle={ac})")
        elif "uint" in ac:
            out.append(f"{name}: unsigned oracle output (spark={sc} oracle={ac})")
        elif sc != ac:
            out.append(f"{name}: render-class mismatch (spark={sc} oracle={ac})")
    return out


def lint_oracles(con, oracles: dict[str, str]) -> dict[str, list[str]]:
    """Map of oracle name -> offending output columns (empty if clean).
    Oracle-side-only walk (no Spark session needed): flags every
    render-risk output type — decimals and unsigned ints, a superset of
    the original HUGEINT signature. Oracles that fail to bind are
    reported under ``__bind_error__:name``."""
    violations: dict[str, list[str]] = {}
    for name, sql in oracles.items():
        try:
            schema = oracle_arrow_schema(con, sql)
        except Exception as e:  # noqa: BLE001
            violations[f"__bind_error__:{name}"] = [str(e)[:200]]
            continue
        bad = [c for c in render_risk_cols(schema) if c not in ALLOWED_DECIMAL_OUTPUTS]
        if bad:
            violations[name] = bad
    return violations
