#!/usr/bin/env python
"""Decompose minhash_lsh_pairs cost at sf1.0: sig compute/write, band-join
candidate volume, distinct, sig-attach joins."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "sf1.0"
sf_dir = f"/root/testdata/{SF}"
spark = build_spark(32)

from debezium_connector_cockroachdb_spark.functions.hashing import (  # noqa: E402
    MINHASH_A, MINHASH_B, MINHASH_P, md5_48,
)
from debezium_connector_cockroachdb_spark.operators import text_dedup  # noqa: E402
from debezium_connector_cockroachdb_spark.plans import driver_queries as dq  # noqa: E402

k = dq.MINHASH_K_ORACLE
print("k =", k)

t0 = time.time()
sh = dq._staged_shingles(spark, sf_dir)
n_sh = sh.count()
print(f"staged shingles: {n_sh} rows, {time.time()-t0:.1f}s (incl. staging if first)")

# sig compute as-is (md5 inside each min agg), write to scratch
t0 = time.time()
sig = text_dedup.minhash_signatures(None, k, 5, shingles=sh)
sig.write.mode("overwrite").parquet("/tmp/probe_sig_a")
print(f"sig write (md5 in aggs): {time.time()-t0:.1f}s")

# sig compute with pre-projected hash
t0 = time.time()
h = md5_48(F.col("shingle"))
pre = sh.select("doc_id", h.alias("_h"))
mins = [
    F.min((F.col("_h") * F.lit(MINHASH_A[j]) + F.lit(MINHASH_B[j])) % F.lit(MINHASH_P)).alias(f"mh{j}")
    for j in range(k)
]
sig2 = pre.groupBy("doc_id").agg(*mins)
sig2.write.mode("overwrite").parquet("/tmp/probe_sig_b")
print(f"sig write (pre-projected md5): {time.time()-t0:.1f}s")

# identical?
a = spark.read.parquet("/tmp/probe_sig_a")
b = spark.read.parquet("/tmp/probe_sig_b")
print("sig diff rows:", a.exceptAll(b).count() + b.exceptAll(a).count())

sig = a
rows = k // 4
band_cols = [
    F.struct(F.lit(bb).alias("band"), *[F.col(f"mh{bb * rows + r}").alias(f"v{r}") for r in range(rows)]).alias(f"b{bb}")
    for bb in range(4)
]
buckets = sig.select(F.col("doc_id"), F.explode(F.array(*band_cols)).alias("bk"))
aa = buckets.select(F.col("doc_id").alias("id_a"), "bk")
bb_ = buckets.select(F.col("doc_id").alias("id_b"), "bk")
t0 = time.time()
n_join = aa.join(bb_, "bk").filter(F.col("id_a") < F.col("id_b")).count()
print(f"band-join rows: {n_join}, {time.time()-t0:.1f}s")
t0 = time.time()
cand = aa.join(bb_, "bk").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct()
n_cand = cand.count()
print(f"distinct candidates: {n_cand}, {time.time()-t0:.1f}s")
spark.stop()
