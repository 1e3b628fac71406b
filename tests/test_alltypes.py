"""Full type-matrix round-trip through the real envelope parser — the
CockroachDBAllTypesIT.java:44-161 analogue (every column type through
insert semantics, plus the BYTES-primary-key table)."""

import datetime
from decimal import Decimal

from pyspark.sql import Row

from debezium_connector_cockroachdb_spark.functions.converters import ColumnSpec
from debezium_connector_cockroachdb_spark.sources.envelope import parse_changefeed

ALLTYPES_SPECS = [
    ColumnSpec("id", "INT8", nullable=False),
    ColumnSpec("c_bool", "BOOL"),
    ColumnSpec("c_int2", "INT2"),
    ColumnSpec("c_int4", "INT4"),
    ColumnSpec("c_float", "FLOAT8"),
    ColumnSpec("c_dec", "DECIMAL", 10, 3),
    ColumnSpec("c_str", "STRING"),
    ColumnSpec("c_bytes", "BYTES"),
    ColumnSpec("c_date", "DATE"),
    ColumnSpec("c_time", "TIME"),
    ColumnSpec("c_timetz", "TIMETZ"),
    ColumnSpec("c_ts", "TIMESTAMP"),
    ColumnSpec("c_tstz", "TIMESTAMPTZ"),
    ColumnSpec("c_interval", "INTERVAL"),
    ColumnSpec("c_jsonb", "JSONB"),
    ColumnSpec("c_uuid", "UUID"),
    ColumnSpec("c_inet", "INET"),
    ColumnSpec("c_int_arr", "INT8[]"),
    ColumnSpec("c_str_arr", "STRING[]"),
    ColumnSpec("c_vector", "VECTOR"),
    ColumnSpec("c_geog", "GEOGRAPHY"),
]

AFTER = (
    '{"id":7,"c_bool":"t","c_int2":12,"c_int4":3400,"c_float":2.5,'
    '"c_dec":1234567.890,"c_str":"hello","c_bytes":"\\\\x01ff",'
    '"c_date":"2026-06-08","c_time":"11:01:45.883","c_timetz":"11:01:45.883+02",'
    '"c_ts":"2026-06-08T11:01:45.883","c_tstz":"2026-06-08T09:01:45.883Z",'
    '"c_interval":"1 day 02:00:00","c_jsonb":"{\\"k\\": 1}",'
    '"c_uuid":"a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11","c_inet":"192.168.0.1",'
    '"c_int_arr":[1,2,3],"c_str_arr":["a","b"],"c_vector":[1.5,2.5,3.5],'
    '"c_geog":"POINT(1 2)"}'
)


def test_alltypes_insert_roundtrip(spark):
    raw = spark.createDataFrame(
        [Row(topic="crdb.public.alltypes", partition=0, offset=1, ts_ms=0,
             key="[\"7\"]", value=f'{{"after":{AFTER},"op":"c","ts_ns":123}}')],
        "topic string, partition int, offset long, ts_ms long, key string, value string",
    )
    [r] = parse_changefeed(raw, ALLTYPES_SPECS, "id").collect()
    a = r["after"]
    assert r["pk"] == 7 and r["op"] == "c"
    assert a["c_bool"] is True
    assert a["c_int2"] == 12 and a["c_int4"] == 3400
    assert a["c_float"] == 2.5
    assert a["c_dec"] == Decimal("1234567.890")
    assert a["c_str"] == "hello"
    assert bytes(a["c_bytes"]) == b"\x01\xff"
    assert a["c_date"] == datetime.date(2026, 6, 8)
    assert a["c_time"] == 39_705_883_000  # micros since midnight
    assert a["c_timetz"] == "11:01:45.883+02:00"
    want_us = int(datetime.datetime(2026, 6, 8, 11, 1, 45, 883000,
                                    tzinfo=datetime.timezone.utc).timestamp() * 1e6)
    assert a["c_ts"] == want_us
    assert a["c_tstz"] == datetime.datetime(2026, 6, 8, 9, 1, 45, 883000)  # session TZ = UTC
    assert a["c_interval"] == "1 day 02:00:00"
    assert a["c_jsonb"] == '{"k": 1}'
    assert a["c_uuid"] == "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11"
    assert a["c_inet"] == "192.168.0.1"
    assert list(a["c_int_arr"]) == [1, 2, 3]
    assert list(a["c_str_arr"]) == ["a", "b"]
    assert list(a["c_vector"]) == [1.5, 2.5, 3.5]
    assert a["c_geog"] == "POINT(1 2)"


def test_bytes_primary_key_through_iud(spark, tmp_path):
    """BYTES PK through insert/update/delete (taxlots analogue): the delete
    key decodes from the bytea hex literal in the message key."""
    from pyspark.sql import types as T

    from debezium_connector_cockroachdb_spark.sources.lake import SnapshotTable

    specs = [ColumnSpec("taxlot_id", "BYTES", nullable=False), ColumnSpec("note", "STRING")]
    rows = [
        ('["\\\\x01aa"]', '{"after":{"taxlot_id":"\\\\x01aa","note":"n1"},"op":"c","ts_ns":100}', 1),
        ('["\\\\x01bb"]', '{"after":{"taxlot_id":"\\\\x01bb","note":"n2"},"op":"c","ts_ns":101}', 2),
        ('["\\\\x01aa"]', '{"after":{"taxlot_id":"\\\\x01aa","note":"n1v2"},"op":"u","ts_ns":102}', 3),
        ('["\\\\x01bb"]', '{"op":"d","ts_ns":103}', 4),
    ]
    raw = spark.createDataFrame(
        [Row(topic="t", partition=0, offset=o, ts_ms=0, key=k, value=v) for k, v, o in rows],
        "topic string, partition int, offset long, ts_ms long, key string, value string",
    )
    parsed = parse_changefeed(raw, specs, "taxlot_id")
    got = {r["seq"]: r for r in parsed.collect()}
    assert bytes(got[4]["pk"]) == b"\x01\xbb"  # delete key from message key

    # apply through the snapshot table (binary merge key)
    from debezium_connector_cockroachdb_spark.operators.dedup import dedupe_batch
    schema = T.StructType([
        T.StructField("taxlot_id", T.BinaryType(), True),
        T.StructField("note", T.StringType(), True),
    ])
    table = SnapshotTable.create(str(tmp_path / "taxlots"), schema, "taxlot_id", num_buckets=4)
    dd = dedupe_batch(parsed.filter(~parsed.is_control), "pk")
    from pyspark.sql import functions as F
    updates = dd.select(
        F.coalesce(F.col("after.taxlot_id"), F.col("pk")).alias("taxlot_id"),
        F.col("after.note").alias("note"),
        "op", "commit_wall_ns", "commit_logical", "seq",
    )
    table.merge(spark, updates, "b1")
    state = {bytes(r["taxlot_id"]): r["note"] for r in table.read_state(spark).collect()}
    assert state == {b"\x01\xaa": "n1v2"}
