"""Arrow/pandas-UDF envelope parser — the alternative hot path.

The default parser (envelope.parse_changefeed) is a single JVM ``from_json``
pass: whole-stage codegen, digit-exact decimals, zero Python. This module
provides the equivalent as a vectorized ``mapInPandas`` kernel (Arrow
batches in/out, batch-granular Python, never per-row dispatch at the Spark
level) for two reasons:

  1. parity with the reference's per-event Jackson pipeline is easiest to
     audit in plain Python (same code a unit test can call directly);
  2. payload shapes the JSON reader can't express (conditional nesting,
     heterogeneous unions) have an escape hatch that stays Arrow-batched.

Semantics are pinned to envelope.parse_changefeed by an equivalence test
(tests/test_envelope_arrow.py): identical output for identical input.
"""

from __future__ import annotations

import base64
import binascii
import datetime
import json
import re
from collections.abc import Iterator
from decimal import Decimal, InvalidOperation
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.converters import ColumnSpec
from ..functions.hlc import parse_hlc
from .envelope import output_image_struct

_OPS = {"c", "u", "d", "r"}


def _parse_one(
    key: str | None,
    value: str | None,
    topic: str | None,
    specs: list[ColumnSpec],
    pk_name: str,
    initial_scan: bool,
) -> dict[str, Any]:
    out: dict[str, Any] = {
        # topic-suffix fallback applies to control rows too (matches the
        # JVM parser, which derives table_name unconditionally — S4)
        "table_name": topic.rsplit(".", 1)[-1] if topic else None,
        "op": None, "commit_wall_ns": 0, "commit_logical": 0,
        "resolved": None, "is_control": False, "is_malformed": False,
        "pk": None, "after_keys": None, "before": None, "after": None,
    }
    blank = value is None or not value.strip()
    if blank:
        out["is_control"] = True
        return out
    try:
        # parse_float=Decimal: digit-exact decimals, same contract as the
        # JVM parser's DecimalType from_json (dbz#2256 regression)
        doc = json.loads(value, parse_float=Decimal)
        if not isinstance(doc, dict):
            raise ValueError("not an object")
    except ValueError:
        out["is_control"] = True
        out["is_malformed"] = True
        return out
    if isinstance(doc.get("payload"), dict):  # P1 unwrap
        doc = doc["payload"]
    if doc.get("resolved") is not None:
        out["is_control"] = True
        out["resolved"] = str(doc["resolved"])
        return out

    before, after = doc.get("before"), doc.get("after")
    op = doc.get("op")
    if not (isinstance(op, str) and op.lower() in _OPS):  # D2 fallback
        op = "d" if after is None else ("c" if before is None else "u")
    else:
        op = op.lower()
    if initial_scan:
        op = "r"  # D3
    out["op"] = op

    src = doc.get("source") or {}
    hlc = src.get("ts_hlc")
    if hlc is not None:
        out["commit_wall_ns"], out["commit_logical"] = parse_hlc(str(hlc))
    else:
        out["commit_wall_ns"] = int(doc.get("ts_ns") or 0)

    if src.get("table_name"):
        out["table_name"] = src["table_name"]  # source block wins (S5)

    names = {s.name for s in specs}

    def image(img: dict | None) -> dict | None:
        if img is None:
            return None
        return {s.name: _coerce(img.get(s.name), s) for s in specs}

    out["before"] = image(before if isinstance(before, dict) else None)
    out["after"] = image(after if isinstance(after, dict) else None)
    if isinstance(after, dict):
        out["after_keys"] = sorted(after.keys())

    pk = None
    if out["after"] is not None and out["after"].get(pk_name) is not None:
        pk = out["after"][pk_name]
    elif key:
        try:
            k = json.loads(key)
            pk = k[0] if isinstance(k, list) and k else (k.get(pk_name) if isinstance(k, dict) else None)
        except ValueError:
            pk = None
    if pk is None and out["before"] is not None:
        pk = out["before"].get(pk_name)
    out["pk"] = pk
    _ = names
    return out


_UTC = datetime.timezone.utc
_HOUR_OFFSET_RE = re.compile(r"([+-]\d{2})$")
_ZONED_RE = re.compile(r"(Z|[+-]\d{2}:\d{2})$")
_B64_RE = re.compile(r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$")
_HEX_RE = re.compile(r"^([0-9a-fA-F]{2})*$")


def _normalize_zoned(s: str) -> str:
    """CockroachDBTemporalConversions.java:137-166 analogue: widen trailing
    hour-only offsets to +HH:MM; zoneless → UTC."""
    s = _HOUR_OFFSET_RE.sub(r"\1:00", s.strip())
    if s.endswith("Z"):
        return s[:-1] + "+00:00"
    if not _ZONED_RE.search(s):
        return s + "+00:00"
    return s


def _epoch_micros(dt: datetime.datetime) -> int:
    td = dt.astimezone(_UTC) - datetime.datetime(1970, 1, 1, tzinfo=_UTC)
    return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds


def _decode_bytes(v: str) -> bytes | None:
    """decode_bytes_literal twin (…Provider.java:358-388): \\x/\\X hex
    literal, well-formed base64 fallback, null on undecodable."""
    if v.startswith(("\\x", "\\X")):
        hx = v[2:]
        return bytes.fromhex(hx) if _HEX_RE.match(hx) else None
    if _B64_RE.match(v):
        try:
            return base64.b64decode(v)
        except (binascii.Error, ValueError):
            return None
    return None


def _coerce(v: Any, spec: ColumnSpec) -> Any:
    """Python-side analogue of converters.post_convert — full §1.2 type
    coverage, semantics pinned to the JVM path by the all-types
    equivalence test (CockroachDBAllTypesIT.java:44-161 analogue)."""
    if v is None:
        return None
    t = spec.crdb_type.strip().upper().split("(")[0].strip()
    try:
        if t in {"STRING", "TEXT", "VARCHAR", "CHAR", "NAME", "UUID", "INET", "ENUM",
                 "JSON", "JSONB", "INTERVAL", "GEOGRAPHY", "GEOMETRY", "BIT", "VARBIT"}:
            return v if isinstance(v, str) else json.dumps(v)
        if t in {"INT2", "INT4", "INT", "INTEGER", "INT8", "BIGINT", "SERIAL"}:
            return int(v)
        if t in {"FLOAT4", "FLOAT8", "FLOAT", "REAL", "DOUBLE PRECISION", "DOUBLE"}:
            return float(v)
        if t in {"BOOL", "BOOLEAN"}:
            if isinstance(v, bool):
                return v
            return str(v).strip().lower() in {"true", "t", "1", "yes", "y", "on"}
        if t in {"NUMERIC", "DECIMAL", "DEC"}:
            # digit-exact: v is Decimal (parse_float) / int / str; rescale
            # half-up like the JVM DecimalType conversion
            d = v if isinstance(v, Decimal) else Decimal(str(v))
            s = spec.scale if spec.scale is not None else 18
            from decimal import ROUND_HALF_UP

            return d.quantize(Decimal(1).scaleb(-s), rounding=ROUND_HALF_UP)
        if t in {"BYTEA", "BYTES", "BLOB"}:
            if spec.binary_mode not in ("bytes", "base64", "hex"):
                # KeyError escapes the null-on-bad-value net: a config
                # error must fail loudly, not null-fill
                raise KeyError(f"unknown binary.handling.mode {spec.binary_mode!r}")
            decoded = _decode_bytes(str(v))
            if decoded is None or spec.binary_mode == "bytes":
                return decoded
            if spec.binary_mode == "base64":
                return base64.b64encode(decoded).decode("ascii")
            return decoded.hex()
        if t == "DATE":
            return datetime.date.fromisoformat(str(v).strip())
        if t == "TIME":
            tm = datetime.time.fromisoformat(str(v).strip())
            return (tm.hour * 3600 + tm.minute * 60 + tm.second) * 1_000_000 + tm.microsecond
        if t == "TIMETZ":
            return _HOUR_OFFSET_RE.sub(r"\1:00", str(v).strip())
        if t == "TIMESTAMP":
            return _epoch_micros(datetime.datetime.fromisoformat(_normalize_zoned(str(v))))
        if t in {"TIMESTAMPTZ", "TIMESTAMP WITH TIME ZONE"}:
            dt = datetime.datetime.fromisoformat(_normalize_zoned(str(v)))
            return dt.astimezone(_UTC).replace(tzinfo=None)  # session TZ = UTC
        if t.endswith("[]"):
            return list(v) if isinstance(v, list) else None
        if t == "VECTOR":
            return [float(x) for x in v] if isinstance(v, list) else None
    except (ValueError, TypeError, InvalidOperation):
        return None  # JVM converters null out unparseable values
    return v if isinstance(v, str) else json.dumps(v)  # unknown type → optional string


def parsed_schema(specs: list[ColumnSpec], pk_type: T.DataType) -> T.StructType:
    img = output_image_struct(specs)
    return T.StructType(
        [
            T.StructField("seq", T.LongType(), False),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("topic", T.StringType(), True),
            T.StructField("table_name", T.StringType(), True),
            T.StructField("op", T.StringType(), True),
            T.StructField("commit_wall_ns", T.LongType(), True),
            T.StructField("commit_logical", T.LongType(), True),
            T.StructField("resolved", T.StringType(), True),
            T.StructField("is_control", T.BooleanType(), False),
            T.StructField("is_malformed", T.BooleanType(), False),
            T.StructField("pk", pk_type, True),
            T.StructField("after_keys", T.ArrayType(T.StringType()), True),
            T.StructField("before", img, True),
            T.StructField("after", img, True),
        ]
    )


def parse_changefeed_arrow(
    df: DataFrame,
    specs: list[ColumnSpec],
    pk_name: str,
    initial_scan: bool = False,
) -> DataFrame:
    """Same contract as envelope.parse_changefeed, via mapInPandas."""
    from ..functions.converters import spark_output_type

    pk_spec = next(s for s in specs if s.name == pk_name)
    pk_type = spark_output_type(pk_spec)
    schema = parsed_schema(specs, pk_type)
    pk_py = {"string": str, "bigint": int, "int": int}.get(pk_type.simpleString(), str)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _parse_one(k, v, t, specs, pk_name, initial_scan)
                for k, v, t in zip(pdf["key"], pdf["value"], pdf["topic"])
            ]
            out = pd.DataFrame(rows)
            out.insert(0, "seq", pdf["offset"].values)
            out.insert(1, "ts_ms", pdf["ts_ms"].values)
            out.insert(2, "topic", pdf["topic"].values)
            out["pk"] = out["pk"].map(lambda x: pk_py(x) if x is not None else None)
            yield out[[f.name for f in schema.fields]]

    return df.mapInPandas(run, schema)
