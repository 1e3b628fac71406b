"""Training-batch sequence packing: assign tokenized documents to
fixed-capacity token windows ("packs") for pretraining batch assembly.

Semantics (deterministic, engine-portable): documents are concatenated in
``id_col`` order into one logical token stream; a document whose first
token lands at global offset ``s`` belongs to pack ``s // capacity`` at
offset ``s % capacity``. This is the standard "greedy contiguous packing"
a sequence-packing dataloader applies before attention-mask fixup — the
part that is data-parallel (window boundaries are pure arithmetic over
the prefix sum) lives here; per-pack mask construction is a downstream
map over ``pack_id`` groups.

Scale design — the naive form is a single global ordered window
(``sum(len) over (order by id)``), which Spark executes as a ONE-PARTITION
sort: dead at 10^10 docs. This implements the classic two-phase
distributed prefix sum instead:

  1. rows are range-bucketed by a DETERMINISTIC arithmetic rule
     (``width_bucket`` over the id min/max — not ``repartitionByRange``,
     whose sampled boundaries can differ between the two Spark jobs this
     operator runs and silently desync the phases);
  2. a per-bucket window computes bucket-local prefix sums (each bucket
     sorts only its own slice — parallel across buckets);
  3. per-bucket token totals (a map-side-combinable narrow aggregation,
     one row per bucket) come to the driver, fold into bucket START
     offsets, and broadcast-join back.

Only #buckets longs ever reach the driver; no stage sorts more than one
bucket's rows; the payload never shuffles twice. Uneven id distributions
skew bucket SIZES (a balance concern), never correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    num_buckets: int | None = None,
) -> DataFrame:
    """(id, len) → (id, len, pack_id, pack_offset) under contiguous
    packing in ``id_col`` order. ``capacity`` is the window length in
    tokens (e.g. 2048/4096/8192 for LLM pretraining)."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    spark = df.sparkSession
    nb = num_buckets or max(spark.sparkContext.defaultParallelism, 1) * 2

    base = df.select(F.col(id_col), F.col(len_col).cast("long").alias(len_col))
    lohi = base.agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi")).first()
    if lohi["lo"] is None:
        return base.select(
            id_col, len_col,
            F.lit(None).cast("long").alias("pack_id"),
            F.lit(None).cast("long").alias("pack_offset"),
        ).limit(0)
    lo, hi = int(lohi["lo"]), int(lohi["hi"])
    # deterministic order-preserving bucketing: bucket b holds ids in
    # [lo + b*span, lo + (b+1)*span) — identical across the totals job and
    # the final job by construction
    bucket = F.width_bucket(F.col(id_col), F.lit(lo), F.lit(hi + 1), F.lit(nb)) - 1

    w = (
        Window.partitionBy("_b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn("_b", bucket).withColumn(
        "_before", F.coalesce(F.sum(len_col).over(w), F.lit(0).cast("long"))
    )

    totals = {
        r["_b"]: r["_tot"]
        for r in base.withColumn("_b", bucket)
        .groupBy("_b").agg(F.sum(len_col).alias("_tot"))
        .collect()
    }
    offsets, acc = [], 0
    for b in range(nb):
        offsets.append((b, acc))
        acc += int(totals.get(b, 0))
    off_df = spark.createDataFrame(offsets, "_b int, _bucket_start long")

    # exact long arithmetic throughout: `div` is integer division (floor for
    # the non-negative start), while floor(start / capacity) would route
    # through float64 and lose exactness once the cumulative token count
    # passes 2^53 — real at 10^10-doc scale with long documents
    start = F.col("_bucket_start") + F.col("_before")
    return (
        local.join(F.broadcast(off_df), "_b")
        .withColumn("_start", start)
        .select(
            id_col,
            len_col,
            F.expr(f"_start div {int(capacity)}").alias("pack_id"),
            F.pmod(F.col("_start"), F.lit(capacity)).cast("long").alias("pack_offset"),
        )
    )
