"""Generator determinism + scenario coverage of the synthetic changefeed."""

import json

from debezium_connector_cockroachdb_spark.sources.generator import (
    GeneratorConfig,
    event_log,
    seed_table,
    write_log,
)


def small_cfg(**kw):
    defaults = dict(num_keys=50, num_events=600, resolved_every=100, n_files=4,
                    dup_pct=5, tombstone_pct=50, same_ts_every=37)
    defaults.update(kw)
    return GeneratorConfig(**defaults)


def test_deterministic_across_runs_and_parallelism(spark):
    cfg = small_cfg()
    a = sorted(event_log(spark, cfg).collect(), key=lambda r: r["offset"])
    b = sorted(event_log(spark, cfg).repartition(13).collect(), key=lambda r: r["offset"])
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_log_contains_all_scenarios(spark):
    cfg = small_cfg()
    rows = event_log(spark, cfg).collect()
    by_off = {r["offset"]: r for r in rows}
    vals = [r["value"] for r in rows if r["value"]]
    docs = [json.loads(v) for v in vals]
    ops = {d.get("op") for d in docs if "op" in d}
    assert {"c", "u", "d"} <= ops
    assert any("resolved" in d for d in docs)                      # resolved control rows
    assert any(r["value"] is None for r in rows)                   # tombstones
    # duplicates: offset 4i+1 rows replicate offset 4i rows exactly
    dups = [r for r in rows if r["offset"] % 4 == 1]
    assert dups
    for d in dups[:10]:
        orig = by_off[d["offset"] - 1]
        assert (d["key"], d["value"]) == (orig["key"], orig["value"])
    # same-HLC transactions exist (borrowed wall with logical=1)
    hlcs = [d["source"]["ts_hlc"] for d in docs if d.get("source")]
    assert any(h.endswith(".0000000001") for h in hlcs)
    # both key shapes
    keys = [r["key"] for r in rows if r["key"]]
    assert any(k.startswith("[") for k in keys) and any(k.startswith("{") for k in keys)


def test_resolved_guarantee_holds(spark):
    """A resolved timestamp promises no later event carries an older HLC."""
    cfg = small_cfg()
    rows = sorted(event_log(spark, cfg).collect(), key=lambda r: r["offset"])
    frontier = 0
    for r in rows:
        if not r["value"]:
            continue
        d = json.loads(r["value"])
        if "resolved" in d:
            frontier = max(frontier, int(d["resolved"].split(".")[0]))
        elif d.get("source"):
            wall = int(d["source"]["ts_hlc"].split(".")[0])
            assert wall > frontier, f"event at offset {r['offset']} violates resolved frontier"


def test_write_log_and_registry(spark, tmp_path):
    out = str(tmp_path / "log")
    cfg = small_cfg(evolve_at=300)
    write_log(spark, cfg, out)
    back = spark.read.parquet(out)
    assert back.count() > cfg.num_events
    reg = json.load(open(f"{out}/_schema/v2.json"))
    assert [c["name"] for c in reg["columns"]][-1] == "lang"
    # evolved events actually carry the new field
    evolved = [r for r in back.collect()
               if r["value"] and '"lang"' in r["value"]]
    assert evolved


def test_seed_table_shape(spark):
    cfg = small_cfg()
    df = seed_table(spark, cfg)
    rows = df.collect()
    assert len(rows) == cfg.num_keys // 2
    for r in rows[:5]:
        assert r["n_tok"] == len(r["tokens"])
