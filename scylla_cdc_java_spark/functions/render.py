"""Display/render scalar functions (F4/F5).

F4: CQL DURATION rendering — sign-aware unit decomposition
``y mo d h m s ms us ns`` (reference: model/worker/cql/CqlDuration.java:46-76).
F5: CQL DATE rendering — zero-padded ``YYYY-MM-DD``
(reference: model/worker/cql/CqlDate.java:46-56).

These are formatting-only; the engine keeps DURATION as a
``struct<months,days,nanoseconds>`` column (no lossless Spark native type —
DayTimeIntervalType cannot hold months).
"""

from __future__ import annotations

_NS_PER = {
    "h": 3_600_000_000_000,
    "m": 60_000_000_000,
    "s": 1_000_000_000,
    "ms": 1_000_000,
    "us": 1_000,
    "ns": 1,
}


def format_cql_duration(months: int, days: int, nanoseconds: int) -> str:
    """Render a (months, days, ns) duration like the reference: ``1y2mo3d4h...``."""
    negative = months < 0 or days < 0 or nanoseconds < 0
    if negative:
        months, days, nanoseconds = -months, -days, -nanoseconds
    parts: list[str] = []
    years, months = divmod(months, 12)
    if years:
        parts.append(f"{years}y")
    if months:
        parts.append(f"{months}mo")
    if days:
        parts.append(f"{days}d")
    for unit, size in _NS_PER.items():
        q, nanoseconds = divmod(nanoseconds, size)
        if q:
            parts.append(f"{q}{unit}")
    body = "".join(parts) or "0s"
    return ("-" if negative else "") + body


def format_change(row: dict, pk_cols: list[str], ck_cols: list[str]) -> str:
    """K2: render one change row the way the reference Printer does —
    operation, change id, then every column with its kind
    (scylla-cdc-printer/.../Main.java:97-151: header :104-110, per-column
    kind/name/value :112-141).
    """
    from ..model.ops import OperationType

    op = OperationType(int(row["cdc$operation"])).name
    sid = row.get("cdc$stream_id")
    sid_hex = bytes(sid).hex().upper() if sid is not None else "?"
    lines = [
        f"[{op}] stream={sid_hex} time={row.get('cdc$time', row.get('cdc$time_ts'))}"
        f" seq={row.get('cdc$batch_seq_no')}"
    ]
    kinds = {**{c: "PARTITION_KEY" for c in pk_cols}, **{c: "CLUSTERING_KEY" for c in ck_cols}}
    for name, value in row.items():
        if name.startswith("cdc$"):
            continue
        kind = kinds.get(name, "REGULAR")
        lines.append(f"  {kind:15s} {name} = {value!r}")
    return "\n".join(lines)


def format_cql_date(year: int, month: int, day: int) -> str:
    """Zero-padded ISO date string (handles years < 1000 like the reference)."""
    sign = "-" if year < 0 else ""
    return f"{sign}{abs(year):04d}-{month:02d}-{day:02d}"
