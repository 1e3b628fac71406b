"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC full-replay pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data operator suite, DuckDB-verified at
sf0.01 (see debezium_connector_cockroachdb_spark/plans/driver_queries.py).
"""

from __future__ import annotations

import os
import shutil
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from debezium_connector_cockroachdb_spark.plans import driver_queries as _dq  # noqa: E402

_WORK = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_work")


def _run_cdc_replay(spark: SparkSession, sf_dir: str, tag: str) -> DataFrame:
    """Flagship: deterministic changefeed log (scaled off the sf dir's
    documents table) replayed through snapshot + streaming phases into the
    snapshot table; returns the final user-facing state."""
    from debezium_connector_cockroachdb_spark.sources.generator import (
        GeneratorConfig,
        seed_table,
        write_log,
    )
    from debezium_connector_cockroachdb_spark.streaming.pipeline import (
        CDCPipeline,
        IngestConfig,
    )

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    cfg = GeneratorConfig(
        num_keys=max(n_docs, 10),
        num_events=max(n_docs * 10, 100),
        resolved_every=max(n_docs, 100),
        n_files=4,
        dup_pct=4,
        tombstone_pct=40,
        hot_key_pct=10,
        evolve_at=max(n_docs * 5, 50),
    )
    base = os.path.join(_WORK, f"entry_{tag}_{cfg.num_events}")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    log_dir = os.path.join(base, "log")
    write_log(spark, cfg, log_dir)
    icfg = IngestConfig(
        log_dir=log_dir,
        table_path=os.path.join(base, "table"),
        metrics_path=os.path.join(base, "metrics"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        errors_path=os.path.join(base, "errors"),
        num_buckets=16,
        max_files_per_trigger=2,
    )
    pipe = CDCPipeline(spark, icfg)
    pipe.run_to_completion(seed_df=seed_table(spark, cfg))
    return pipe.read_state()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _run_cdc_replay(spark, "/root/testdata/sf0.001", "sf0001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = dict(_dq.queries())
    # full pipeline replay: stateful + streaming, not SQL-expressible →
    # rows-only check (oracle equivalence is covered by
    # tests/test_pipeline.py against the pure-Python replay oracle)
    qs["cdc_full_replay"] = lambda spark, sf_dir: _run_cdc_replay(spark, sf_dir, "q")
    return qs


def oracle_sql() -> dict[str, str]:
    return dict(_dq.oracle_sql())
