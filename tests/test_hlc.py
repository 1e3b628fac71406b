"""HLC parsing fixtures from CockroachDBHeartbeatTest.java:22-78."""

import pytest
from pyspark.sql import functions as F

from debezium_connector_cockroachdb_spark.functions.hlc import (
    hlc_logical,
    hlc_string,
    hlc_wall_ns,
    parse_hlc,
)

CASES = [
    ("1772695406971781718.0000000000", 1772695406971781718, 0),
    ("1772695406971781718.0000000042", 1772695406971781718, 42),
    ("123456789", 123456789, 0),  # no dot → logical 0
    ("", 0, 0),
    ("   ", 0, 0),
    (None, 0, 0),
    ("not-a-ts", 0, 0),
    ("12.34.56", 0, 0),
]


@pytest.mark.parametrize("s,wall,logical", CASES)
def test_parse_hlc_python(s, wall, logical):
    assert parse_hlc(s) == (wall, logical)


def test_parse_hlc_spark(spark):
    df = spark.createDataFrame([(s,) for s, _, _ in CASES], "hlc string")
    got = df.select(
        F.col("hlc"), hlc_wall_ns(F.col("hlc")).alias("w"), hlc_logical(F.col("hlc")).alias("l")
    ).collect()
    expect = {s: (w, l) for s, w, l in CASES}
    for r in got:
        assert (r["w"], r["l"]) == expect[r["hlc"]], r["hlc"]


def test_hlc_roundtrip(spark):
    df = spark.createDataFrame([(1772695406971781718, 42)], "w long, l long")
    s = df.select(hlc_string(F.col("w"), F.col("l")).alias("s")).collect()[0]["s"]
    assert s == "1772695406971781718.0000000042"
    assert parse_hlc(s) == (1772695406971781718, 42)
