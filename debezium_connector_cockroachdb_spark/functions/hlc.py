"""Hybrid Logical Clock timestamp parsing (C15).

CockroachDB HLC strings have the shape ``"<wall_nanos>.<logical>"`` — e.g.
``"1772695406971781718.0000000000"``. The integer part is nanoseconds since
epoch; the fractional part is a *logical counter*, NOT sub-nanoseconds.

Reference semantics: ``parseResolvedTimestamp``
(CockroachDBStreamingChangeEventSource.java:1272-1295) — null / empty /
malformed input falls back to epoch (wall=0, logical=0); a missing dot means
logical=0. Fixtures: CockroachDBHeartbeatTest.java:22-78.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HLC_RE = r"^\d+(\.\d+)?$"


def hlc_wall_ns(col: Column) -> Column:
    """Wall-clock nanoseconds component of an HLC string; 0 on malformed."""
    c = F.trim(col)
    return (
        F.when(c.isNull() | (c == ""), F.lit(0).cast("long"))
        .when(~c.rlike(_HLC_RE), F.lit(0).cast("long"))
        .otherwise(F.get(F.split(c, r"\."), 0).cast("long"))
    )


def hlc_logical(col: Column) -> Column:
    """Logical-counter component of an HLC string; 0 when absent/malformed."""
    c = F.trim(col)
    frac = F.get(F.split(c, r"\."), 1)
    return (
        F.when(c.isNull() | (c == "") | ~c.rlike(_HLC_RE), F.lit(0).cast("long"))
        .otherwise(F.coalesce(frac.cast("long"), F.lit(0).cast("long")))
    )


def hlc_string(wall_ns: Column, logical: Column) -> Column:
    """Format back to the canonical ``<wall>.<10-digit logical>`` shape."""
    return F.concat_ws(".", wall_ns.cast("string"), F.lpad(logical.cast("string"), 10, "0"))


def parse_hlc(s: str | None) -> tuple[int, int]:
    """Driver-side (pure-Python) HLC parse with identical fallback rules."""
    if not s or not s.strip():
        return (0, 0)
    s = s.strip()
    parts = s.split(".")
    try:
        wall = int(parts[0])
        logical = int(parts[1]) if len(parts) > 1 and parts[1] else 0
        if wall < 0 or logical < 0 or len(parts) > 2:
            return (0, 0)
        return (wall, logical)
    except ValueError:
        return (0, 0)
