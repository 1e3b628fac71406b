"""Pure-Python replay oracle: computes the expected final table state from a
raw changefeed log, independent of the Spark engine (SURVEY §5 — golden
state, not golden files).

Semantics being oracled: collapse exact duplicate deliveries by event
identity (table, op, wall, logical, key); order every event by
(wall, logical, offset); apply in order — c/u/r upsert, d delete; ignore
control rows (resolved messages, tombstones/blank values)."""

from __future__ import annotations

import json
from typing import Any

import pandas as pd


def parse_event(key: str | None, value: str | None, pk_name: str) -> dict[str, Any] | None:
    """→ dict(op, wall, logical, pk, after) or None for control rows."""
    if value is None or not value.strip():
        return None
    doc = json.loads(value)
    if "payload" in doc and isinstance(doc["payload"], dict):
        doc = doc["payload"]
    if doc.get("resolved") is not None:
        return None
    before, after = doc.get("before"), doc.get("after")
    op = doc.get("op")
    if op not in ("c", "u", "d", "r"):
        op = "d" if after is None else ("c" if before is None else "u")
    src = doc.get("source") or {}
    hlc = src.get("ts_hlc")
    if hlc:
        parts = str(hlc).split(".")
        wall, logical = int(parts[0]), int(parts[1]) if len(parts) > 1 else 0
    else:
        wall, logical = int(doc.get("ts_ns") or 0), 0
    pk = None
    if after and pk_name in after:
        pk = after[pk_name]
    elif key:
        k = json.loads(key)
        pk = k[0] if isinstance(k, list) else k.get(pk_name)
    elif before and pk_name in before:
        pk = before[pk_name]
    return {"op": op, "wall": wall, "logical": logical, "pk": pk, "after": after}


def replay(
    log: pd.DataFrame,
    pk_name: str = "doc_id",
    seed_rows: list[dict[str, Any]] | None = None,
) -> dict[Any, dict[str, Any]]:
    """Final state keyed by pk. ``seed_rows`` are pre-stream table contents
    (the initial-scan phase), applied before every streamed event."""
    state: dict[Any, dict[str, Any]] = {}
    for row in seed_rows or []:
        state[row[pk_name]] = dict(row)

    events = []
    seen = set()
    for r in log.sort_values("offset").itertuples():
        ev = parse_event(r.key, r.value, pk_name)
        if ev is None or ev["pk"] is None:
            continue
        ident = (ev["op"], ev["wall"], ev["logical"], ev["pk"])
        if ident in seen:
            continue  # duplicate delivery
        seen.add(ident)
        events.append((ev["wall"], ev["logical"], r.offset, ev))

    for _, _, _, ev in sorted(events, key=lambda t: (t[0], t[1], t[2])):
        if ev["op"] == "d":
            state.pop(ev["pk"], None)
        else:
            state[ev["pk"]] = dict(ev["after"])
    return state


def assert_state_equal(spark_rows: list[dict[str, Any]], oracle: dict[Any, dict[str, Any]], pk_name: str = "doc_id"):
    got = {r[pk_name]: r for r in spark_rows}
    assert set(got) == set(oracle), (
        f"key sets differ: extra={sorted(set(got) - set(oracle))[:5]} "
        f"missing={sorted(set(oracle) - set(got))[:5]}"
    )
    for k, want in oracle.items():
        have = got[k]
        for col, v in want.items():
            hv = have[col]
            if isinstance(v, list):
                hv = list(hv) if hv is not None else None
            assert hv == v, f"pk={k} col={col}: engine={hv!r} oracle={v!r}"
