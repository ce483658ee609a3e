"""Pure-Python DML replay oracle.

Independently replays the *logical* DML script (not the CDC encoding) with
CQL visibility semantics and returns the expected final rows. Written
deliberately without reference to the Spark kernel so the differential test
has two genuinely separate implementations (mirrors the byte-compare oracle
of ReplicatorCorrectnessTestIT.verifyResult).
"""

from __future__ import annotations

from pyspark.sql import types as T

from ..model.schema import CdcTableDescriptor


def _cmp_bound(ck, bound, inclusive, is_left) -> bool:
    for a, b in zip(ck, bound):
        if b is None:
            break
        if a == b:
            continue
        return a > b if is_left else a < b
    return inclusive


def replay_dml(desc: CdcTableDescriptor, dml: list[tuple]) -> list[dict]:
    state: dict[tuple, dict[tuple, dict]] = {}  # pk -> ck -> {"marker", "cells"}
    names = [f.name for f in desc.base_schema.fields]

    def cell_apply(row: dict, col: str, cw) -> None:
        dt = desc.base_field(col).dataType
        cells = row["cells"]
        if col in desc.non_frozen_collections:
            if isinstance(dt, T.StructType):
                fnames = [f.name for f in dt.fields]
                cur = dict(cells.get(col) or dict.fromkeys(fnames))
                if cw.get("overwrite_null"):
                    cur = dict.fromkeys(fnames)
                for n, v in (cw.get("fields") or {}).items():
                    if v is not None:
                        cur[n] = v
                for i in cw.get("remove_idx") or []:
                    cur[fnames[int(i)]] = None
                if any(v is not None for v in cur.values()):
                    cells[col] = cur
                else:
                    cells.pop(col, None)
                return
            is_list = col in desc.list_columns
            is_map = isinstance(dt, T.MapType) and not is_list
            if "overwrite" in cw:
                cur = {} if is_map else []
                payload = cw.get("overwrite")
            else:
                payload = cw.get("add")
                prev = cells.get(col)
                cur = dict(prev or {}) if is_map else list(prev or [])
            if payload is not None:
                if is_map:
                    cur.update(payload)
                elif is_list:
                    cur.extend(payload)
                else:
                    cur = sorted(set(cur) | set(payload))
            for e in cw.get("remove") or []:
                if is_map:
                    cur.pop(e, None)
                elif is_list:
                    pass  # list removal is positional (timeuuid); generator does not emit it
                else:
                    cur = [x for x in cur if x != e]
            if cur:
                cells[col] = cur
            else:
                cells.pop(col, None)
            return
        if cw is None:
            cells.pop(col, None)
        else:
            if isinstance(dt, T.StructType) and isinstance(cw, dict):
                cw = tuple(cw.get(f.name) for f in dt.fields)
            cells[col] = cw

    for stmt in dml:
        kind, pk_t = stmt[0], stmt[1]
        part = state.setdefault(pk_t, {})
        if kind in ("insert", "update"):
            ck_t, cellwrites = stmt[2], stmt[3]
            row = part.get(ck_t)
            if row is None:
                row = part[ck_t] = {"marker": False, "cells": {}}
            if kind == "insert":
                row["marker"] = True
            for col, cw in cellwrites.items():
                cell_apply(row, col, cw)
            if not row["marker"] and not row["cells"]:
                del part[ck_t]
        elif kind == "row_delete":
            part.pop(stmt[2], None)
        elif kind == "partition_delete":
            part.clear()
        elif kind == "range_delete":
            (lo, lo_incl), (hi, hi_incl) = stmt[2], stmt[3]
            doomed = [
                ck
                for ck in part
                if _cmp_bound(ck, lo, lo_incl, True) and _cmp_bound(ck, hi, hi_incl, False)
            ]
            for ck in doomed:
                del part[ck]
        else:
            raise ValueError(kind)

    out = []
    for pk_t, part in state.items():
        for ck_t, row in part.items():
            if not row["marker"] and not row["cells"]:
                continue
            rec = dict(zip(desc.partition_keys, pk_t))
            rec.update(zip(desc.clustering_keys, ck_t))
            for col in desc.regular_columns:
                v = row["cells"].get(col)
                dt = desc.base_field(col).dataType
                if v is not None and isinstance(dt, T.StructType) and isinstance(v, dict):
                    v = tuple(v[f.name] for f in dt.fields)
                rec[col] = v
            out.append({n: rec.get(n) for n in names})
    return out
