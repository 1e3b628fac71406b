"""Scalar conversion fixtures (FIXTURES.md §5; reference:
CockroachDBChangeRecordEmitterTest.java:41-119,
CockroachDBTemporalConversionsTest.java,
CockroachDBValueConverterProvider.java:358-388)."""

import datetime
from decimal import Decimal

from pyspark.sql import functions as F

from debezium_connector_cockroachdb_spark.functions.converters import (
    ColumnSpec,
    bytes_to_hex_literal,
    convert_bool,
    convert_date,
    convert_time_micros,
    convert_timestamp_micros,
    decode_bytes_literal,
    json_parse_type,
    normalize_zoned_time,
    normalize_zoned_timestamp_string,
    post_convert,
)
from debezium_connector_cockroachdb_spark.functions.defaults import parse_default_literal


def one(spark, expr, value, typ="string"):
    df = spark.createDataFrame([(value,)], f"v {typ}")
    return df.select(expr(F.col("v")).alias("r")).collect()[0]["r"]


def test_bool_literals(spark):
    for v, want in [("true", True), ("t", True), ("1", True), ("yes", True),
                    ("TRUE", True), ("false", False), ("f", False), ("0", False),
                    ("no", False), (None, None)]:
        assert one(spark, convert_bool, v) is want


def test_bytes_hex_literal(spark):
    assert one(spark, decode_bytes_literal, "\\x01ff") == bytearray(b"\x01\xff")
    # odd-length hex → null (decodeBytesLiteral …Provider.java:358-388)
    assert one(spark, decode_bytes_literal, "\\x1ff") is None
    # base64 fallback
    assert one(spark, decode_bytes_literal, "AQL/") == bytearray(b"\x01\x02\xff")
    assert one(spark, decode_bytes_literal, None) is None


def test_bytes_hex_roundtrip(spark):
    df = spark.createDataFrame([("\\x01ff",)], "v string")
    r = df.select(bytes_to_hex_literal(decode_bytes_literal(F.col("v"))).alias("r")).collect()[0]["r"]
    assert r == "\\x01ff"


def test_timestamp_micros_utc(spark):
    # "2026-06-08T11:01:45.883" → micros UTC (zoneless interpreted UTC)
    want = int(datetime.datetime(2026, 6, 8, 11, 1, 45, 883000, tzinfo=datetime.timezone.utc).timestamp() * 1e6)
    assert one(spark, convert_timestamp_micros, "2026-06-08T11:01:45.883") == want
    # Z-suffixed and offset forms
    assert one(spark, convert_timestamp_micros, "2026-06-08T11:01:45.883Z") == want
    assert one(spark, convert_timestamp_micros, "2026-06-08T13:01:45.883+02:00") == want
    assert one(spark, convert_timestamp_micros, "2026-06-08T13:01:45.883+02") == want  # hour-only offset


def test_zoned_timestamp_normalize_string(spark):
    assert one(spark, normalize_zoned_timestamp_string, "2026-06-08T09:01:45.883Z") == "2026-06-08T09:01:45.883Z"
    assert one(spark, normalize_zoned_timestamp_string, "2026-06-08T11:01:45.883+02") == "2026-06-08T09:01:45.883Z"
    assert one(spark, normalize_zoned_timestamp_string, "2026-06-08T09:01:45.883") == "2026-06-08T09:01:45.883Z"


def test_time_micros(spark):
    assert one(spark, convert_time_micros, "11:01:45.883") == 39_705_883_000


def test_timetz_normalize(spark):
    assert one(spark, normalize_zoned_time, "11:01:45.883+02") == "11:01:45.883+02:00"
    assert one(spark, normalize_zoned_time, "11:01:45.883+02:30") == "11:01:45.883+02:30"


def test_date(spark):
    assert one(spark, convert_date, "2026-06-08") == datetime.date(2026, 6, 8)


def test_decimal_exact_through_from_json(spark):
    """dbz#2256: decimals must survive digit-exact (never via double)."""
    spec = ColumnSpec("d", "DECIMAL", precision=38, scale=18)
    t = json_parse_type(spec)
    df = spark.createDataFrame([('{"d": 9999999999.999999999000000000}',)], "v string")
    r = df.select(F.from_json("v", f"d {t.simpleString()}").getField("d").alias("d")).collect()[0]["d"]
    assert r == Decimal("9999999999.999999999000000000")


def test_vector_parse_type():
    spec = ColumnSpec("v", "VECTOR")
    assert json_parse_type(spec).simpleString() == "array<double>"


def test_int_array_native():
    spec = ColumnSpec("tokens", "INT4[]")
    assert json_parse_type(spec).simpleString() == "array<int>"


def test_default_literals():
    assert parse_default_literal("'PENDING':::STRING", "STRING") == (True, "PENDING")
    assert parse_default_literal("0:::INT8", "INT8") == (True, 0)
    # function defaults are skipped (DB computes them)
    assert parse_default_literal("current_timestamp():::TIMESTAMPTZ", "TIMESTAMPTZ") == (False, None)
    assert parse_default_literal("gen_random_uuid()", "UUID") == (False, None)
    assert parse_default_literal("ARRAY['a','b']:::STRING[]", "STRING[]") == (True, ["a", "b"])
    assert parse_default_literal("'it''s':::STRING", "STRING") == (True, "it's")
    assert parse_default_literal("12.340:::DECIMAL", "DECIMAL") == (True, Decimal("12.340"))
    assert parse_default_literal("'[1.5,2.5]':::VECTOR", "VECTOR") == (True, [1.5, 2.5])
    assert parse_default_literal("NULL", "STRING") == (True, None)


def test_post_convert_dispatch(spark):
    df = spark.createDataFrame([("\\x0a",)], "v string")
    r = df.select(post_convert(ColumnSpec("b", "BYTES"), F.col("v")).alias("r")).collect()[0]["r"]
    assert r == bytearray(b"\x0a")


def test_bytes_uppercase_hex_prefix(spark):
    r"""Reference decodeBytesLiteral accepts both '\x' and '\X' prefixes;
    an uppercase literal must hex-decode, never fall through to base64."""
    df = spark.range(1).select(
        decode_bytes_literal(F.lit("\\X01ff")).alias("b"),
        decode_bytes_literal(F.lit("\\Xzz")).alias("bad_hex"),
    )
    row = df.collect()[0]
    assert row["b"] == b"\x01\xff"
    assert row["bad_hex"] is None


def test_bytes_invalid_base64_nulls(spark):
    """Undecodable non-hex input yields null like the reference, instead of
    unbase64's lenient garbage decode."""
    df = spark.range(1).select(
        decode_bytes_literal(F.lit("!!not base64!!")).alias("bad"),
        decode_bytes_literal(F.lit("AQ==")).alias("good"),
    )
    row = df.collect()[0]
    assert row["bad"] is None
    assert row["good"] == b"\x01"


def test_binary_handling_modes(spark):
    """binary.handling.mode (…Provider.java:309-340): bytes | base64 | hex
    output shaping of decoded bytea values."""
    from pyspark.sql import types as T

    from debezium_connector_cockroachdb_spark.functions.converters import (
        post_convert,
        spark_output_type,
    )

    lit = F.lit("\\x01ff")
    by = ColumnSpec("b", "BYTEA", binary_mode="bytes")
    b64 = ColumnSpec("b", "BYTEA", binary_mode="base64")
    hx = ColumnSpec("b", "BYTEA", binary_mode="hex")
    row = spark.range(1).select(
        post_convert(by, lit).alias("bytes"),
        post_convert(b64, lit).alias("b64"),
        post_convert(hx, lit).alias("hex"),
    ).collect()[0]
    assert bytes(row["bytes"]) == b"\x01\xff"
    assert row["b64"] == "Af8="
    assert row["hex"] == "01ff"
    assert isinstance(spark_output_type(by), T.BinaryType)
    assert isinstance(spark_output_type(b64), T.StringType)
    assert isinstance(spark_output_type(hx), T.StringType)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="binary.handling.mode"):
        spark.range(1).select(post_convert(ColumnSpec("b", "BYTEA", binary_mode="raw"), lit))
