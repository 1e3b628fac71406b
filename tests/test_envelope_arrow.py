"""Equivalence: the Arrow mapInPandas parser must produce exactly what the
JVM from_json parser produces, row for row, over the full generated
scenario mix (dups, tombstones, resolved, deletes, both key shapes)."""

from debezium_connector_cockroachdb_spark.sources.envelope import parse_changefeed
from debezium_connector_cockroachdb_spark.sources.envelope_arrow import parse_changefeed_arrow
from debezium_connector_cockroachdb_spark.sources.generator import (
    TOKENIZED_SEQUENCES_SPECS,
    GeneratorConfig,
    event_log,
)


def norm_rows(rows):
    out = {}
    for r in rows:
        d = r.asDict(recursive=True)
        keys = d.pop("after_keys")
        d["after_keys"] = sorted(keys) if keys is not None else None
        for img in ("before", "after"):
            if d[img] is not None and d[img].get("tokens") is not None:
                d[img]["tokens"] = list(d[img]["tokens"])
        out[d["seq"]] = d
    return out


def test_arrow_parser_matches_jvm_parser(spark):
    cfg = GeneratorConfig(num_keys=40, num_events=400, resolved_every=100,
                          dup_pct=5, tombstone_pct=50, n_files=2)
    raw = event_log(spark, cfg)
    jvm = norm_rows(parse_changefeed(raw, TOKENIZED_SEQUENCES_SPECS, "doc_id").collect())
    arrow = norm_rows(parse_changefeed_arrow(raw, TOKENIZED_SEQUENCES_SPECS, "doc_id").collect())
    assert set(jvm) == set(arrow)
    for seq in jvm:
        assert jvm[seq] == arrow[seq], f"seq={seq}\njvm={jvm[seq]}\narrow={arrow[seq]}"


def test_arrow_parser_initial_scan_and_malformed(spark):
    rows = [
        ("t", 0, 1, 0, '["a"]', '{"after":{"doc_id":"a","tokens":[1],"n_tok":1,"source":"cc"},"op":"c","ts_ns":5}'),
        ("t", 0, 2, 0, '["b"]', "NOT JSON"),
    ]
    raw = spark.createDataFrame(rows, "topic string, partition int, offset long, ts_ms long, key string, value string")
    got = {r["seq"]: r for r in parse_changefeed_arrow(raw, TOKENIZED_SEQUENCES_SPECS, "doc_id", initial_scan=True).collect()}
    assert got[1]["op"] == "r"
    assert got[2]["is_malformed"] and got[2]["is_control"]


def test_arrow_parser_matches_jvm_on_alltypes(spark):
    """Full §1.2 type matrix through BOTH parsers — the Arrow path must
    round-trip every type the JVM path does (bytea, temporals, decimal
    included), byte-for-byte (CockroachDBAllTypesIT.java:44-161 analogue)."""
    from test_alltypes import AFTER, ALLTYPES_SPECS

    rows = [
        ("crdb.public.alltypes", 0, 1, 0, '["7"]', f'{{"after":{AFTER},"op":"c","ts_ns":123}}'),
        # delete with key-only pk, hour-only tz offsets, null value fields
        ("crdb.public.alltypes", 0, 2, 0, '["9"]', '{"op":"d","ts_ns":124}'),
    ]
    raw = spark.createDataFrame(
        rows, "topic string, partition int, offset long, ts_ms long, key string, value string"
    )
    from debezium_connector_cockroachdb_spark.sources.envelope_arrow import (
        parse_changefeed_arrow,
    )

    jvm = {r["seq"]: r.asDict(recursive=True)
           for r in parse_changefeed(raw, ALLTYPES_SPECS, "id").collect()}
    arrow = {r["seq"]: r.asDict(recursive=True)
             for r in parse_changefeed_arrow(raw, ALLTYPES_SPECS, "id").collect()}
    assert set(jvm) == set(arrow)
    for seq in jvm:
        j, a = jvm[seq], arrow[seq]
        for img in ("before", "after"):
            if j[img] is not None:
                for k in j[img]:
                    jv, av = j[img][k], a[img][k]
                    if isinstance(jv, (bytes, bytearray)) or isinstance(av, (bytes, bytearray)):
                        jv = bytes(jv) if jv is not None else None
                        av = bytes(av) if av is not None else None
                    if isinstance(jv, list) or isinstance(av, list):
                        jv = list(jv) if jv is not None else None
                        av = list(av) if av is not None else None
                    assert jv == av, f"seq={seq} col={k}: jvm={jv!r} arrow={av!r}"
        for k in ("op", "commit_wall_ns", "commit_logical", "is_control", "is_malformed", "table_name"):
            assert j[k] == a[k], f"seq={seq} {k}"
