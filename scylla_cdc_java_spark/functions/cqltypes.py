"""CQL type-string → Spark type compiler (F9) and descriptor builder.

Implements the §1.2 type mapping of SURVEY.md — the Spark-side equivalent
of the reference's recursive driver-type translation
(Driver3SchemaFactory.translateCdcColumnDataType,
scylla-cdc-driver3/.../Driver3SchemaFactory.java:542-625, and the
CqlType enum, scylla-cdc-base/.../model/worker/ChangeSchema.java:13-45):

* every native scalar maps to the nearest lossless Spark type (DECIMAL
  fidelity caps documented below);
* ``list<T>``/``set<T>`` → ``array<T>``, ``map<K,V>`` → ``map<K,V>``,
  ``tuple<...>`` → struct with positional ``_1.._n`` fields, UDTs (via a
  registry) → named structs;
* ``frozen<...>`` marks atomicity: a NON-frozen collection column has
  partial-update (delta) semantics in the CDC log, which is exactly what
  ``CdcTableDescriptor.non_frozen_collections`` / ``list_columns`` drive
  (ChangeSchema.isAtomic, ChangeSchema.java:173-219);
* DURATION has no lossless Spark native type (DayTimeIntervalType cannot
  hold months) → ``struct<months:long, days:long, nanoseconds:long>``.

Fidelity notes (documented, matching SURVEY §1.2): DECIMAL → (38,18) can
lose precision vs Java BigDecimal; VARINT → (38,0) caps at 38 digits.
"""

from __future__ import annotations

from pyspark.sql import types as T

from ..model.schema import CdcTableDescriptor

_SCALARS: dict[str, T.DataType] = {
    "ascii": T.StringType(),
    "text": T.StringType(),
    "varchar": T.StringType(),
    "bigint": T.LongType(),
    "counter": T.LongType(),
    "blob": T.BinaryType(),
    "boolean": T.BooleanType(),
    "decimal": T.DecimalType(38, 18),
    "varint": T.DecimalType(38, 0),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "int": T.IntegerType(),
    "smallint": T.ShortType(),
    "tinyint": T.ByteType(),
    "timestamp": T.TimestampType(),
    "uuid": T.StringType(),
    "timeuuid": T.StringType(),
    "inet": T.StringType(),
    "date": T.DateType(),
    "time": T.LongType(),
    "duration": T.StructType(
        [
            T.StructField("months", T.LongType()),
            T.StructField("days", T.LongType()),
            T.StructField("nanoseconds", T.LongType()),
        ]
    ),
}


def _split_args(s: str) -> list[str]:
    """Split generic args on top-level commas: ``int, frozen<map<int,text>>``."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def parse_cql_type(
    s: str, udts: dict[str, dict[str, str]] | None = None
) -> tuple[T.DataType, bool]:
    """Parse a CQL type string → ``(spark_type, frozen)``.

    ``frozen`` reports whether the OUTERMOST type is frozen (scalars are
    implicitly atomic/frozen; a bare collection is non-frozen).
    """
    s = s.strip()
    low = s.lower()
    if low.startswith("frozen<") and low.endswith(">"):
        inner, _ = parse_cql_type(s[7:-1], udts)
        return inner, True
    if low in _SCALARS:
        return _SCALARS[low], True
    if low.startswith("list<") and s.endswith(">"):
        elem, _ = parse_cql_type(s[5:-1], udts)
        return T.ArrayType(elem), False
    if low.startswith("set<") and s.endswith(">"):
        elem, _ = parse_cql_type(s[4:-1], udts)
        return T.ArrayType(elem), False
    if low.startswith("map<") and s.endswith(">"):
        k, v = _split_args(s[4:-1])
        kt, _ = parse_cql_type(k, udts)
        vt, _ = parse_cql_type(v, udts)
        return T.MapType(kt, vt), False
    if low.startswith("tuple<") and s.endswith(">"):
        args = _split_args(s[6:-1])
        fields = [
            T.StructField(f"_{i + 1}", parse_cql_type(a, udts)[0])
            for i, a in enumerate(args)
        ]
        return T.StructType(fields), True  # tuples are always frozen in CQL
    if udts and low in udts:
        fields = [
            T.StructField(n, parse_cql_type(t, udts)[0])
            for n, t in udts[low].items()
        ]
        return T.StructType(fields), False  # bare UDT = non-frozen
    raise ValueError(f"unsupported CQL type: {s!r}")


def descriptor_from_cql(
    name: str,
    columns: dict[str, str],
    partition_keys: list[str],
    clustering_keys: list[str] | None = None,
    udts: dict[str, dict[str, str]] | None = None,
    ttl_seconds: int | None = None,
) -> CdcTableDescriptor:
    """Build a CdcTableDescriptor from CQL column declarations.

    Non-frozen collection/UDT columns are detected from the type strings
    and flagged for delta semantics; non-frozen LISTs additionally go on
    ``list_columns`` (logged as ``map<timeuuid, elem>``,
    Driver3SchemaFactory.java:189-229). ``ttl_seconds`` carries the
    table's ``cdc = {'ttl': ...}`` property (S9,
    Driver3CommonCQL.fetchTableTTL, Driver3CommonCQL.java:15-61).
    """
    fields, non_frozen, lists = [], [], []
    pk_set = set(partition_keys) | set(clustering_keys or [])
    for col, type_str in columns.items():
        dt, frozen = parse_cql_type(type_str, udts)
        fields.append(T.StructField(col, dt))
        if not frozen and col not in pk_set:
            non_frozen.append(col)
            if type_str.strip().lower().startswith("list<"):
                lists.append(col)
    desc = CdcTableDescriptor(
        name=name,
        base_schema=T.StructType(fields),
        partition_keys=list(partition_keys),
        clustering_keys=list(clustering_keys or []),
        non_frozen_collections=non_frozen,
        list_columns=lists,
    )
    desc.ttl_seconds = ttl_seconds  # S9 table property (None = disabled/0)
    return desc


def validate_descriptor(desc: CdcTableDescriptor) -> None:
    """S10 analog of the reference's table validation
    (Driver3MasterCQL.validateTable, Driver3MasterCQL.java:397-419):
    structural checks before a source/apply is built."""
    names = [f.name for f in desc.base_schema.fields]
    if len(set(names)) != len(names):
        raise ValueError(f"{desc.name}: duplicate column names")
    if not desc.partition_keys:
        raise ValueError(f"{desc.name}: at least one partition key required")
    for c in [*desc.partition_keys, *desc.clustering_keys]:
        if c not in names:
            raise ValueError(f"{desc.name}: primary key column {c!r} not declared")
    for c in desc.non_frozen_collections:
        dt = desc.base_field(c).dataType
        if not isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            raise ValueError(
                f"{desc.name}: non-frozen column {c!r} must be collection/UDT, got {dt}"
            )
    for c in desc.list_columns:
        if c not in desc.non_frozen_collections:
            raise ValueError(f"{desc.name}: list column {c!r} must be non-frozen")


def min_table_ttl_ms(descs: list[CdcTableDescriptor]) -> int | None:
    """A4: minimum TTL across tables, ``None``-as-epoch-0 sentinel semantics
    (GenerationBasedCDCMetadataModel.java:86-90): a table with no/zero TTL
    keeps everything → the minimum is 'no expiry' (None)."""
    ttls = [getattr(d, "ttl_seconds", None) for d in descs]
    if any(t is None or t == 0 for t in ttls) or not ttls:
        return None
    return min(ttls) * 1000
