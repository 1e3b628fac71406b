"""Deterministic changefeed event-log generator (S1/S2 stand-in).

The reference creates a CockroachDB ``CREATE CHANGEFEED ... WITH envelope=
'enriched', resolved='10s', initial_scan=...`` and consumes it from Kafka
(CockroachDBStreamingChangeEventSource.java:952-1034, :487-600). This
sandbox has no CockroachDB/Kafka, so this module *materializes the
equivalent record stream*: enriched envelopes over the tokenized-sequences
table with interleaved resolved messages, injected duplicate deliveries,
same-HLC multi-row transactions, deletes, post-delete tombstones, both
message-key shapes, and a mid-stream schema-evolution switch — every
scenario of FIXTURES.md §4, all derived from seeded hash arithmetic over
``spark.range`` (no RNG at generation time → byte-identical across runs and
parallelism levels).

Offset layout: each logical event ``i`` owns offsets ``4i..4i+3``:
  4i   the event itself
  4i+1 duplicate delivery (when injected; identical key+value)
  4i+2 tombstone after delete (null value; ignored by apply)
  4i+3 resolved control message (every ``resolved_every`` events)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.converters import ColumnSpec

TOKENIZED_SEQUENCES_SPECS: list[ColumnSpec] = [
    ColumnSpec("doc_id", "STRING", nullable=False),
    ColumnSpec("tokens", "INT4[]", nullable=False),
    ColumnSpec("n_tok", "INT4", nullable=False),
    ColumnSpec("source", "STRING", nullable=False),
]

TOKENIZED_SEQUENCES_SPECS_V2: list[ColumnSpec] = TOKENIZED_SEQUENCES_SPECS + [
    ColumnSpec("lang", "STRING", nullable=True),  # mid-stream ADD COLUMN
]

SOURCES = ["cc", "web", "books", "code"]
LANGS = ["en", "de", "fr", "ja"]
VOCAB = 50257
TABLE = "tokenized_sequences"
TOPIC = f"crdb.public.{TABLE}"


@dataclass(frozen=True)
class GeneratorConfig:
    num_keys: int = 1000
    num_events: int = 10_000
    seed: int = 42
    base_wall_ns: int = 1_772_000_000_000_000_000
    step_ns: int = 1_000
    insert_pct: int = 30
    delete_pct: int = 10  # remainder are updates
    dup_pct: int = 3
    tombstone_pct: int = 40  # of deletes
    hot_key_pct: int = 0  # % of events hitting key 0 (skew mode)
    same_ts_every: int = 37  # every k-th event borrows the previous HLC
    resolved_every: int = 1_000
    evolve_at: int | None = None  # seq at which the `lang` column appears
    n_files: int = 8
    n_partitions: int = 4
    key_shape_mix: bool = True  # alternate array / object message keys
    max_tok: int = 16


def _rnd(seed: int, tag: str, *cols: Column) -> Column:
    """Deterministic pseudo-random in [0, 100)."""
    return F.pmod(F.xxhash64(F.lit(seed), F.lit(tag), *cols), F.lit(100))


def doc_id_col(key_idx: Column) -> Column:
    return F.concat(F.lit("doc-"), F.lpad(key_idx.cast("string"), 8, "0"))


def tokens_col(doc_id: Column, version: Column, max_tok: int) -> Column:
    """Deterministic token array per (doc, version)."""
    n = (F.pmod(F.xxhash64(doc_id, version), F.lit(max_tok - 3)) + 4).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.pmod(F.xxhash64(doc_id, version, i), F.lit(VOCAB)).cast("int"),
    )


def seed_table(spark: SparkSession, cfg: GeneratorConfig) -> DataFrame:
    """Pre-existing table contents for the initial-scan/snapshot phase
    (W4): the first half of the key space exists before the stream starts,
    at version -1."""
    n = max(cfg.num_keys // 2, 1)
    df = spark.range(n)
    doc = doc_id_col(F.col("id"))
    toks = tokens_col(doc, F.lit(-1), cfg.max_tok)
    return df.select(
        doc.alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).alias("n_tok"),
        F.element_at(
            F.array(*[F.lit(s) for s in SOURCES]),
            (F.pmod(F.xxhash64(doc, F.lit("src")), F.lit(len(SOURCES))) + 1).cast("int"),
        ).alias("source"),
    )


def _event_frame(spark: SparkSession, cfg: GeneratorConfig) -> DataFrame:
    df = spark.range(cfg.num_events).withColumnRenamed("id", "i")
    i = F.col("i")
    s = cfg.seed

    hot = _rnd(s, "hot", i) < cfg.hot_key_pct
    key_idx = F.when(hot, F.lit(0)).otherwise(F.pmod(F.xxhash64(F.lit(s), F.lit("key"), i), F.lit(cfg.num_keys)))
    doc = doc_id_col(key_idx)

    opr = _rnd(s, "op", i)
    op = (
        F.when(opr < cfg.delete_pct, F.lit("d"))
        .when(opr < cfg.delete_pct + cfg.insert_pct, F.lit("c"))
        .otherwise(F.lit("u"))
    )

    borrows = (F.pmod(i, F.lit(cfg.same_ts_every)) == 0) & (i > 0)
    eff = F.when(borrows, i - 1).otherwise(i)
    wall = F.lit(cfg.base_wall_ns) + eff * F.lit(cfg.step_ns)
    logical = F.when(borrows, F.lit(1)).otherwise(F.lit(0)).cast("long")
    ts_hlc = F.concat(wall.cast("string"), F.lit("."), F.lpad(logical.cast("string"), 10, "0"))

    return df.select(
        i, key_idx.alias("key_idx"), doc.alias("doc_id"), op.alias("op"),
        wall.alias("wall"), logical.alias("logical"), ts_hlc.alias("ts_hlc"),
    )


def _value_json(cfg: GeneratorConfig, evolved: bool) -> Column:
    i, doc, op, wall, ts_hlc = F.col("i"), F.col("doc_id"), F.col("op"), F.col("wall"), F.col("ts_hlc")
    toks = tokens_col(doc, i, cfg.max_tok)
    img_fields = [
        doc.alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).alias("n_tok"),
        F.element_at(
            F.array(*[F.lit(x) for x in SOURCES]),
            (F.pmod(F.xxhash64(doc, F.lit("src")), F.lit(len(SOURCES))) + 1).cast("int"),
        ).alias("source"),
    ]
    if evolved:
        img_fields.append(
            F.element_at(
                F.array(*[F.lit(x) for x in LANGS]),
                (F.pmod(F.xxhash64(doc, F.lit("lang")), F.lit(len(LANGS))) + 1).cast("int"),
            ).alias("lang")
        )
    after = F.when(op != "d", F.struct(*img_fields))
    src_block = F.struct(
        F.lit("defaultdb").alias("database_name"),
        F.lit("public").alias("schema_name"),
        F.lit(TABLE).alias("table_name"),
        ts_hlc.alias("ts_hlc"),
    )
    # ignoreNullFields (default) drops `after` for deletes, matching the
    # enriched-envelope delete shape (after:null ≡ absent for from_json)
    return F.to_json(
        F.struct(after.alias("after"), op.alias("op"), wall.alias("ts_ns"), src_block.alias("source"))
    )


def _key_json(cfg: GeneratorConfig) -> Column:
    doc = F.col("doc_id")
    obj = F.to_json(F.struct(doc.alias("doc_id")))
    arr = F.to_json(F.array(doc))
    if not cfg.key_shape_mix:
        return arr
    return F.when(F.pmod(F.col("i"), F.lit(2)) == 0, arr).otherwise(obj)


def event_log(spark: SparkSession, cfg: GeneratorConfig) -> DataFrame:
    """The full raw record stream in RAW_LOG_SCHEMA column order."""
    ev = _event_frame(spark, cfg)
    i = F.col("i")

    if cfg.evolve_at is not None:
        value = F.when(i >= cfg.evolve_at, _value_json(cfg, True)).otherwise(_value_json(cfg, False))
    else:
        value = _value_json(cfg, False)

    common = [
        F.lit(TOPIC).alias("topic"),
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(cfg.n_partitions)).cast("int").alias("partition"),
        (F.col("wall") / 1_000_000).cast("long").alias("ts_ms"),
    ]

    data = ev.select(*common, (i * 4).alias("offset"), _key_json(cfg).alias("key"), value.alias("value"))

    dups = (
        ev.filter(_rnd(cfg.seed, "dup", i) < cfg.dup_pct)
        .select(*common, (i * 4 + 1).alias("offset"), _key_json(cfg).alias("key"), value.alias("value"))
    )

    tombs = (
        ev.filter((F.col("op") == "d") & (_rnd(cfg.seed, "tomb", i) < cfg.tombstone_pct))
        .select(*common, (i * 4 + 2).alias("offset"), _key_json(cfg).alias("key"),
                F.lit(None).cast("string").alias("value"))
    )

    # strictly below every wall that can still arrive (a later event may
    # borrow THIS event's wall in a same-HLC txn, so stay 1ns under it)
    res_wall = F.col("wall") - 1
    resolved = (
        ev.filter((F.pmod(i, F.lit(cfg.resolved_every)) == 0) & (i > 0))
        .select(
            F.lit(TOPIC).alias("topic"), F.lit(0).cast("int").alias("partition"),
            (F.col("wall") / 1_000_000).cast("long").alias("ts_ms"),
            (i * 4 + 3).alias("offset"),
            F.lit(None).cast("string").alias("key"),
            F.to_json(
                F.struct(F.concat(res_wall.cast("string"), F.lit(".0000000000")).alias("resolved"))
            ).alias("value"),
        )
    )

    cols = ["topic", "partition", "offset", "ts_ms", "key", "value"]
    return (
        data.select(cols)
        .unionByName(dups.select(cols))
        .unionByName(tombs.select(cols))
        .unionByName(resolved.select(cols))
    )


def write_log(spark: SparkSession, cfg: GeneratorConfig, out_dir: str) -> None:
    """Materialize the log as ``n_files`` parquet files ordered by offset —
    the replay source for both batch and streaming ingest. Also writes the
    schema-registry descriptors (the information_schema analogue the
    pipeline consults on drift, CockroachDBSchema.java:76-89)."""
    import json
    import os

    (
        event_log(spark, cfg)
        .repartitionByRange(cfg.n_files, "offset")
        .sortWithinPartitions("offset")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    reg_dir = os.path.join(out_dir, "_schema")
    os.makedirs(reg_dir, exist_ok=True)

    def dump(specs: list[ColumnSpec], ver: int) -> None:
        with open(os.path.join(reg_dir, f"v{ver}.json"), "w") as f:
            json.dump(
                {"version": ver, "columns": [
                    {"name": c.name, "crdb_type": c.crdb_type, "nullable": c.nullable,
                     **({"default": c.default_sql} if c.default_sql else {})}
                    for c in specs
                ]},
                f,
            )

    dump(TOKENIZED_SEQUENCES_SPECS, 1)
    if cfg.evolve_at is not None:
        dump(TOKENIZED_SEQUENCES_SPECS_V2, 2)
