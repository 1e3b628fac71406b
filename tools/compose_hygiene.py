#!/usr/bin/env python
"""Composed corpus-hygiene dry run (round-5 scale rehearsal): one pipeline
chaining curation → exact dedup → benchmark decontamination → sequence
packing (slices) → pack assembly over an organically-grown synthetic corpus
(bench.synth_scale_dir — letter-rotated copies, no cross-copy duplicate
inflation beyond the rotation period).

Each stage materializes to parquet scratch (the engine's no-persist staging
doctrine) so per-stage wall shares are honest; output is ONE JSON line:

  {"factor": F, "n_docs": ..., "stages": {name: {"secs": s, "rows": n}}}

Run at two factors (e.g. 10 and 100) and compare per-stage ratios: a stage
whose wall grows much faster than input size is the scale defect this
rehearsal exists to catch.

Usage: [HYG_FACTOR=100] [SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1] \
       python tools/compose_hygiene.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (synth_scale_dir + session/scratch conventions)
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    factor = int(os.environ.get("HYG_FACTOR", "100"))
    spark = bench.build_spark(bench.CPUS)
    scratch = os.path.join(bench.SCRATCH, f"hygiene_{os.getpid()}")
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)

    from debezium_connector_cockroachdb_spark.operators import text, text_dedup
    from debezium_connector_cockroachdb_spark.operators.packing import (
        assemble_packs,
        pack_sequences_slices,
    )

    src_dir = bench.SF_DIR if factor <= 1 else bench.synth_scale_dir(spark, factor)
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    stages: dict[str, dict] = {}

    def stage(name: str, df, path: str):
        t0 = time.time()
        df.write.mode("overwrite").parquet(path)
        out = spark.read.parquet(path)
        n = out.count()
        stages[name] = {"secs": round(time.time() - t0, 2), "rows": n}
        return out

    # 1) curation: quality/length gates, computed inline so `text` rides
    #    through (map-only — no join back onto the corpus). No language
    #    gate here: the organic synth letter-rotates copies, which is
    #    rotation-invariant for the structural quality score but (by
    #    design) defeats the stopword language id — gating on lang would
    #    collapse every factor back to the copy-0 corpus and void the
    #    scale rehearsal.
    t = F.col("text")
    curated = stage(
        "curation",
        docs.select(
            "doc_id", "text",
            text.token_count(t).alias("n_tokens"),
            text.quality_score(t).alias("quality"),
        ).filter(
            (F.col("quality") >= 0.5) & (F.col("n_tokens") >= 5)
        ).select("doc_id", "text", "n_tokens"),
        f"{scratch}/curated",
    )

    # 2) exact dedup (min-id keeper per normalized fingerprint)
    deduped = stage(
        "exact_dedup", text_dedup.dedup_exact(curated), f"{scratch}/deduped"
    )

    # 3) decontamination vs an eval split (every 50th ORIGINAL document):
    #    13-char shingles (short n-grams are ubiquitous English and would
    #    flag everything), drop docs with ≥80% overlap — the eval docs'
    #    own corpus copies hit 100% and are removed, unrelated docs share
    #    almost no 13-grams and survive
    n_base = spark.read.parquet(f"{bench.SF_DIR}/documents.parquet").count()
    evalset = docs.filter((F.col("doc_id") < n_base) & (F.col("doc_id") % 50 == 0))
    contam = text_dedup.benchmark_contamination(deduped, evalset, n=13)
    clean = stage(
        "decontamination",
        deduped.join(
            contam.filter(F.col("n_contaminated") * 5 < F.col("n_shingles") * 4)
            .select("doc_id"),
            "doc_id",
        ),
        f"{scratch}/clean",
    )

    # 4) packing: boundary-spanning slice rows at a 2048-token window
    lens = clean.select("doc_id", F.col("n_tokens").cast("long").alias("n_tok"))
    slices = stage(
        "packing_slices", pack_sequences_slices(lens, capacity=2048), f"{scratch}/slices"
    )

    # 5) assembly: one row per pack with ordered segment lists
    stage("pack_assembly", assemble_packs(slices), f"{scratch}/packs")

    total = round(sum(s["secs"] for s in stages.values()), 2)
    print(json.dumps({
        "metric": "composed_corpus_hygiene",
        "factor": factor,
        "sf": bench.SF_DIR,
        "cpus": bench.CPUS,
        "n_docs": docs.count(),
        "total_secs": total,
        "stages": stages,
    }))
    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
