#!/usr/bin/env python
"""Round-6 measurement harness (guide §1): times individual operator
queries with the SAME methodology as bench.py (.count(), same session
config, same staged-scratch side effects), at an arbitrary sf dir.

Usage:
    python tools/prof_r06.py sf1.0 embedding_neardup minhash_lsh_pairs ...
    python tools/prof_r06.py sf1.0 --repeats 2 --explain plans/r06 <names...>

Special names:
    embedding_neardup_auto / stream_dedup_jvm / ann_cosine_topk_lsh_auto —
    the extra bench rows bench.py times outside queries().

This file is measurement-only; bench.py stays frozen.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark  # noqa: E402  (frozen bench's session config)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf", help="sf dir name under /root/testdata or absolute path")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--explain", default=None, help="dir to write explain('formatted')")
    ap.add_argument("--suffix", default="", help="filename suffix for explain files")
    args = ap.parse_args()

    sf_dir = args.sf if os.path.isabs(args.sf) else f"/root/testdata/{args.sf}"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)

    from pyspark.sql import functions as F

    from debezium_connector_cockroachdb_spark.operators import similarity
    from debezium_connector_cockroachdb_spark.plans import driver_queries as dq

    qs = dq.queries()

    def get_df(name):
        if name == "embedding_neardup_auto":
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            n_emb = emb.count()
            return similarity.embedding_near_duplicates(
                emb, threshold=0.4, n_planes=None, n_vectors=n_emb
            )
        if name == "ann_cosine_topk_lsh_auto":
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            qdf = emb.filter(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            return similarity.cosine_topk_lsh(emb, qdf, k=3, n_planes=None)
        if name == "stream_dedup_jvm":
            return dq.q_stream_dedup(spark, sf_dir, engine="jvm")
        return qs[name](spark, sf_dir)

    out = {}
    for name in args.names:
        secs = []
        n = None
        for r in range(args.repeats):
            spark.sparkContext.setJobDescription(f"prof:{name}#{r}")
            t0 = time.time()
            n = get_df(name).count()
            secs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"secs": secs, "min": min(secs), "rows": n}
        print(json.dumps({name: out[name]}), flush=True)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                get_df(name).explain("formatted")
            with open(os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
    print(json.dumps({"summary": {k: v["min"] for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
