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


def _global_starts(
    df: DataFrame,
    id_col: str,
    len_col: str,
    num_buckets: int | None,
) -> DataFrame | None:
    """Shared core: (id, len) → (id, len, _start) where ``_start`` is each
    document's first-token offset in the concatenated id-ordered stream —
    the two-phase distributed prefix sum described in the module docstring.
    Returns None for an empty input."""
    spark = df.sparkSession
    nb = num_buckets or max(spark.sparkContext.defaultParallelism, 1) * 2

    base = df.select(F.col(id_col), F.col(len_col).cast("long").alias(len_col))
    lohi = base.agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi")).first()
    if lohi["lo"] is None:
        return None
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

    return (
        local.join(F.broadcast(off_df), "_b")
        .withColumn("_start", F.col("_bucket_start") + F.col("_before"))
        .select(id_col, len_col, "_start")
    )


def pack_sequences(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    num_buckets: int | None = None,
) -> DataFrame:
    """(id, len) → (id, len, pack_id, pack_offset) under contiguous
    packing in ``id_col`` order. ``capacity`` is the window length in
    tokens (e.g. 2048/4096/8192 for LLM pretraining). A document longer
    than ``capacity`` is reported at its start position only — use
    :func:`pack_sequences_slices` for the boundary-spanning slice rows a
    packing dataloader actually consumes."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    starts = _global_starts(df, id_col, len_col, num_buckets)
    if starts is None:
        return df.sparkSession.createDataFrame(
            # backtick-quote caller names: non-identifier columns like
            # `n-tok` / `doc id` are supported on the non-empty path too
            [], f"`{id_col}` {df.schema[id_col].dataType.simpleString()}, "
                f"`{len_col}` long, pack_id long, pack_offset long"
        )
    # exact long arithmetic throughout: `div` is integer division (floor for
    # the non-negative start), while floor(start / capacity) would route
    # through float64 and lose exactness once the cumulative token count
    # passes 2^53 — real at 10^10-doc scale with long documents
    return starts.select(
        id_col,
        len_col,
        F.expr(f"_start div {int(capacity)}").alias("pack_id"),
        F.pmod(F.col("_start"), F.lit(capacity)).cast("long").alias("pack_offset"),
    )


def pack_sequences_slices(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    num_buckets: int | None = None,
) -> DataFrame:
    """Boundary-spanning packing: one row per (document × pack it
    overlaps), so over-capacity and window-crossing documents emit the
    slice rows a packing dataloader consumes instead of silently
    overflowing their window.

    Output per row: ``pack_id``, ``slice_start``/``slice_len`` (the token
    range WITHIN the document) and ``pack_offset`` (where that slice lands
    inside the pack). Every pack's slices sum to exactly ``capacity``
    except the final pack; concatenating a document's slices in pack order
    reproduces tokens [0, len). Zero-length documents emit no rows.

    Scale shape: pure arithmetic on the same two-phase prefix sum as
    :func:`pack_sequences` — the span explode (sequence of pack ids) is
    map-side, no extra shuffle; a document of L tokens fans out to
    ceil(L/capacity)+1 rows at most."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    starts = _global_starts(df, id_col, len_col, num_buckets)
    if starts is None:
        return df.sparkSession.createDataFrame(
            [], f"`{id_col}` {df.schema[id_col].dataType.simpleString()}, "
                f"`{len_col}` long, pack_id long, slice_start long, "
                f"slice_len long, pack_offset long"
        )
    cap = int(capacity)
    # exact long div via the fixed internal aliases only — interpolating
    # len_col into an expr string would mis-parse non-identifier column
    # names ("n-tok", reserved words) that F.col handles fine
    first = F.expr(f"_start div {cap}")
    last = F.expr(f"_last_tok div {cap}")
    g0 = F.greatest(F.col("_start"), F.col("pack_id") * cap)
    g1 = F.least(F.col("_start") + F.col(len_col), (F.col("pack_id") + 1) * cap)
    return (
        starts.filter(F.col(len_col) > 0)
        .withColumn("_last_tok", F.col("_start") + F.col(len_col) - F.lit(1))
        .select(
            id_col, len_col, "_start",
            F.explode(F.sequence(first, last)).alias("pack_id"),
        )
        .select(
            id_col,
            len_col,
            F.col("pack_id").cast("long").alias("pack_id"),
            (g0 - F.col("_start")).cast("long").alias("slice_start"),
            (g1 - g0).cast("long").alias("slice_len"),
            (g0 - F.col("pack_id") * cap).cast("long").alias("pack_offset"),
        )
    )


def assemble_packs(
    slices: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Pack assembly: fold the slice rows of :func:`pack_sequences_slices`
    into one row per pack — the ordered segment lists a packed-batch
    dataloader consumes directly (``pack_offsets``/``slice_lens`` ARE the
    block-diagonal attention-mask spec: token t attends within the segment
    whose [offset, offset+len) contains t; ``doc_ids``/``slice_starts``
    say which document range fills each segment).

    Output per pack: ``pack_id``, ``n_slices``, ``n_tokens``, and the
    four parallel arrays ordered by ``pack_offset``.

    Scale shape: ONE shuffle on ``pack_id`` (uniform by construction —
    packs are fixed-capacity), and the aggregation buffer is bounded by
    ``capacity`` entries per pack (every slice holds ≥1 token), so no
    group can outgrow a constant regardless of corpus size."""
    seg = F.struct(
        F.col("pack_offset"), F.col(id_col), F.col("slice_start"), F.col("slice_len")
    )
    return (
        slices.groupBy("pack_id")
        .agg(F.sort_array(F.collect_list(seg)).alias("_segs"))
        .select(
            "pack_id",
            F.size("_segs").alias("n_slices"),
            F.aggregate(
                "_segs", F.lit(0).cast("long"), lambda a, s: a + s["slice_len"]
            ).alias("n_tokens"),
            F.transform("_segs", lambda s: s[id_col]).alias("doc_ids"),
            F.transform("_segs", lambda s: s["pack_offset"]).alias("pack_offsets"),
            F.transform("_segs", lambda s: s["slice_start"]).alias("slice_starts"),
            F.transform("_segs", lambda s: s["slice_len"]).alias("slice_lens"),
        )
    )
