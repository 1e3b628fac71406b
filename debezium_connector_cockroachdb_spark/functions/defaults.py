"""Column default-value literal parsing (C14).

CockroachDB annotates column defaults with ``:::TYPE`` casts
(``'PENDING':::STRING``, ``0:::INT8``, ``ARRAY['a','b']:::STRING[]``);
function defaults (``now()``, ``gen_random_uuid()``, ...) must be *skipped*
so the database computes them. Reference:
CockroachDBDefaultValueConverter.java:41-59 (entry), :143-158 (vector),
:164-210 (per-type parse), :212-218 (strip casts), :220-226 (unquote).
Pure driver-side Python — defaults are metadata, never per-row work.
"""

from __future__ import annotations

import re
from decimal import Decimal
from typing import Any

_FUNCTION_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*\s*\(.*\)$")


def strip_type_casts(raw: str) -> str:
    """Remove trailing ``:::TYPE`` / ``::TYPE`` annotations (repeatedly)."""
    s = raw.strip()
    while True:
        m = re.search(r":{2,3}[A-Za-z_][A-Za-z0-9_ \[\]\(\),]*$", s)
        if not m:
            return s.strip()
        s = s[: m.start()].strip()


def unquote(s: str) -> str:
    """Strip one layer of single quotes; un-double embedded quotes."""
    if len(s) >= 2 and s[0] == "'" and s[-1] == "'":
        return s[1:-1].replace("''", "'")
    return s


def parse_default_literal(raw: str | None, crdb_type: str) -> tuple[bool, Any]:
    """→ (has_value, value). has_value=False means "skip: let the engine
    compute" (function call defaults) or unparseable."""
    if raw is None:
        return (False, None)
    s = strip_type_casts(raw)
    if not s or s.upper() == "NULL":
        return (True, None)
    if _FUNCTION_RE.match(s) and not s.upper().startswith("ARRAY"):
        return (False, None)  # now(), gen_random_uuid(), current_timestamp()

    t = re.sub(r"\(.*\)", "", crdb_type.strip().upper()).strip()
    try:
        if t.endswith("[]") or s.upper().startswith("ARRAY["):
            inner = s[s.find("[") + 1 : s.rfind("]")]
            if not inner.strip():
                return (True, [])
            parts = _split_top_level(inner)
            elem_t = t[:-2] if t.endswith("[]") else "STRING"
            vals = [parse_default_literal(p, elem_t)[1] for p in parts]
            return (True, vals)
        if t in {"BOOL", "BOOLEAN"}:
            return (True, unquote(s).lower() in {"true", "t", "1", "yes", "y", "on"})
        if t in {"INT2", "SMALLINT", "INT4", "INT", "INTEGER", "INT8", "BIGINT", "SERIAL"}:
            return (True, int(unquote(s)))
        if t in {"FLOAT4", "REAL", "FLOAT8", "FLOAT", "DOUBLE PRECISION", "DOUBLE"}:
            return (True, float(unquote(s)))
        if t in {"NUMERIC", "DECIMAL", "DEC"}:
            return (True, Decimal(unquote(s)))  # digit-exact, never float
        if t == "VECTOR":
            body = unquote(s).strip().strip("[]")
            return (True, [float(x) for x in body.split(",")] if body else [])
        return (True, unquote(s))
    except (ValueError, ArithmeticError):
        return (False, None)


def _split_top_level(s: str) -> list[str]:
    """Split on commas not inside quotes (for ARRAY[...] bodies)."""
    parts, buf, in_q = [], [], False
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "'":
            if in_q and i + 1 < len(s) and s[i + 1] == "'":
                buf.append("''")
                i += 2
                continue
            in_q = not in_q
            buf.append(ch)
        elif ch == "," and not in_q:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
        i += 1
    if buf:
        parts.append("".join(buf).strip())
    return parts
