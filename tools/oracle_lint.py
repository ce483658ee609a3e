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


def lint_oracles(con, oracles: dict[str, str]) -> dict[str, list[str]]:
    """Map of oracle name -> offending output columns (empty if clean).
    Oracles that fail to bind are reported under ``__bind_error__:name``."""
    violations: dict[str, list[str]] = {}
    for name, sql in oracles.items():
        try:
            schema = oracle_arrow_schema(con, sql)
        except Exception as e:  # noqa: BLE001
            violations[f"__bind_error__:{name}"] = [str(e)[:200]]
            continue
        bad = hugeint_signature_cols(schema)
        if bad:
            violations[name] = bad
    return violations
