"""Snapshot-table lake format: Iceberg-style semantics on plain parquet.

This image ships no Iceberg/Delta runtime jar, so the engine provides its own
minimal table format with the four properties the CDC sink needs (swap for
real Iceberg by replacing this module with ``MERGE INTO`` — the call sites
are identical):

  1. **Atomic commits** — each commit writes an immutable ``v{N}.json``
     snapshot and atomically flips a ``_current`` pointer (``os.replace``).
     Readers pin a snapshot; a crashed writer leaves garbage files but never
     a torn table.
  2. **Exactly-once replay** — every merge records its ``batch_key`` in the
     snapshot; re-merging an already-applied batch is a no-op. Combined with
     Structured Streaming's checkpointed offsets this is the engine's
     exactly-once story (reference analogue: the Kafka-Connect source offset
     map, CockroachDBOffsetContext.java:98-112 — offsets flushed only after
     records are produced → at-least-once upstream, dedup makes it effective
     exactly-once).
  3. **Bucket-pruned copy-on-write MERGE** — rows hash into ``num_buckets``
     by ``xxhash64(pk)``; a merge rewrites only the buckets its updates
     touch. At 10^10 rows with 4096 buckets, a micro-batch touching 1% of
     keys rewrites ~41 buckets, not the table. Deletes persist as tombstone
     rows (``_deleted``) so the commit-timestamp guard keeps working for
     late/out-of-order events that arrive after the delete.
  4. **Schema evolution** — add-column / type-widen are metadata-only
     commits; old data files are aligned (null-fill / cast) at read time,
     exactly Iceberg's lazy evolution.

System columns stored per row: ``_deleted``, ``_commit_wall_ns``,
``_commit_logical``, ``_commit_seq`` — the HLC ordering key that implements
the reference's "apply in commit order, last wins" contract (SURVEY §2.4).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_COLS = ["_deleted", "_commit_wall_ns", "_commit_logical", "_commit_seq"]

_META_FIELDS = [
    T.StructField("_deleted", T.BooleanType(), False),
    T.StructField("_commit_wall_ns", T.LongType(), False),
    T.StructField("_commit_logical", T.LongType(), False),
    T.StructField("_commit_seq", T.LongType(), False),
]


def _physical_schema(user_schema: T.StructType) -> T.StructType:
    return T.StructType(list(user_schema.fields) + _META_FIELDS)


class SnapshotTable:
    """One lake table. Single-writer (the streaming query), many-reader."""

    def __init__(self, path: str, meta: dict[str, Any]):
        self.path = path
        self.meta = meta
        # optimistic-concurrency base: the table version this handle last
        # observed committed; _write_version refuses to flip _current if
        # another writer advanced it meanwhile
        self._base_version = meta["version"]

    # ---------------- lifecycle ----------------

    @classmethod
    def create(
        cls,
        path: str,
        schema: T.StructType,
        pk_col: str,
        num_buckets: int = 16,
        properties: dict[str, str] | None = None,
    ) -> "SnapshotTable":
        os.makedirs(os.path.join(path, "metadata"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        meta = {
            "format_version": 1,
            "table_uuid": str(uuid.uuid4()),
            "version": 0,
            "pk_col": pk_col,
            "num_buckets": num_buckets,
            "schemas": [{"id": 0, "spark": schema.jsonValue()}],
            "current_schema_id": 0,
            "files": [],
            "applied": {},
            "frontier": {"wall_ns": 0, "logical": 0, "hlc": "0.0"},
            "properties": properties or {},
            "summary": {},
        }
        t = cls(path, meta)
        t._write_version(meta)
        return t

    @classmethod
    def load(cls, path: str, version: int | None = None) -> "SnapshotTable":
        """Load the current snapshot, or — time travel — any retained
        ``version`` (every commit's manifest is immutable; reads pin it,
        so historical state is exact as long as gc_orphans hasn't expired
        the version)."""
        if version is None:
            with open(os.path.join(path, "metadata", "_current")) as f:
                version = int(f.read().strip())
        vfile = os.path.join(path, "metadata", f"v{version}.json")
        if not os.path.exists(vfile):
            raise FileNotFoundError(
                f"version {version} not retained at {path} (expired by gc_orphans?)"
            )
        with open(vfile) as f:
            return cls(path, json.load(f))

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(os.path.join(path, "metadata", "_current"))

    def _write_version(self, meta: dict[str, Any]) -> None:
        v = meta["version"]
        mdir = os.path.join(self.path, "metadata")
        cur = os.path.join(mdir, "_current")
        # optimistic-concurrency check (best-effort CAS — a real catalog
        # service would make this atomic; the single-writer contract makes
        # the remaining race window a misconfiguration detector, not a
        # correctness mechanism): refuse to clobber a commit this handle
        # never saw.
        if os.path.exists(cur):
            with open(cur) as f:
                actual = int(f.read().strip())
            if actual != self._base_version:
                raise RuntimeError(
                    f"concurrent commit detected: table at version {actual}, "
                    f"this writer last saw {self._base_version} — reload the "
                    "table and retry (single-writer contract violated)"
                )
        vfile = os.path.join(mdir, f"v{v}.json")
        with open(vfile + ".tmp", "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(vfile + ".tmp", vfile)
        with open(cur + ".tmp", "w") as f:
            f.write(str(v))
        os.replace(cur + ".tmp", cur)  # the atomic commit point
        self.meta = meta
        self._base_version = v

    # ---------------- schema ----------------

    @property
    def schema(self) -> T.StructType:
        sid = self.meta["current_schema_id"]
        entry = next(s for s in self.meta["schemas"] if s["id"] == sid)
        return T.StructType.fromJson(entry["spark"])

    def _schema_by_id(self, sid: int) -> T.StructType:
        entry = next(s for s in self.meta["schemas"] if s["id"] == sid)
        return T.StructType.fromJson(entry["spark"])

    @property
    def pk_col(self) -> str:
        return self.meta["pk_col"]

    def evolve_schema(
        self, new_schema: T.StructType, defaults: dict[str, Any] | None = None
    ) -> int:
        """Metadata-only commit: add-column / type-widen (E2 analogue —
        the reference re-reads information_schema and overwrites the
        registration, CockroachDBSchema.java:76-89; here old files align
        lazily at read time).

        ``defaults`` (C14): parsed column-default values keyed by column
        name; rows written before a column existed read back its default
        instead of null (function defaults are never registered — the DB
        computes those, CockroachDBDefaultValueConverter.java:41-59)."""
        old = self.schema
        if new_schema.jsonValue() == old.jsonValue():
            return self.meta["current_schema_id"]
        # pk stability: bucket membership of existing files was frozen under
        # xxhash64(pk) at the pk's current type — dropping the pk or
        # changing its type would hash new updates into different buckets
        # and duplicate keys. Reject both.
        pk = self.pk_col
        new_by_name = {f.name: f for f in new_schema.fields}
        if pk not in new_by_name:
            raise ValueError(f"schema evolution cannot drop the pk column {pk!r}")
        old_pk_type = next(f for f in old.fields if f.name == pk).dataType
        if new_by_name[pk].dataType != old_pk_type:
            raise ValueError(
                f"schema evolution cannot change the pk column type "
                f"({old_pk_type.simpleString()} -> {new_by_name[pk].dataType.simpleString()}): "
                "bucket assignment hashes the pk at its type and existing "
                "file bucket membership is frozen"
            )
        meta = json.loads(json.dumps(self.meta))
        sid = max(s["id"] for s in meta["schemas"]) + 1
        entry = {"id": sid, "spark": new_schema.jsonValue()}
        if defaults:
            entry["defaults"] = {k: v for k, v in defaults.items() if _json_safe(v)}
        meta["schemas"].append(entry)
        meta["current_schema_id"] = sid
        meta["version"] += 1
        meta["summary"] = {"op": "evolve-schema", "schema_id": sid}
        self._write_version(meta)
        return sid

    # ---------------- read ----------------

    @property
    def merge_mode(self) -> str:
        return self.meta.get("properties", {}).get("write.merge.mode", "cow")

    @property
    def max_deltas_per_bucket(self) -> int:
        return int(self.meta.get("properties", {}).get("mor.max-deltas-per-bucket", "8"))

    @property
    def compact_min_delta_ratio(self) -> float:
        """Size-ratio gate on MoR auto-compaction (LSM-style): a bucket
        past the file-count trigger only compacts once its delta ROWS
        reach this fraction of its base rows. Without it, steady
        micro-batches that touch every bucket force a full-table rewrite
        every ``max_deltas_per_bucket`` batches — at 10^10 rows with 1%
        updates per batch that is ~12x write amplification (a compaction
        storm); with the ratio gate each compaction rewrites at most
        (1 + 1/ratio) bytes per delta byte folded in, so write
        amplification stays bounded as the table grows."""
        return float(self.meta.get("properties", {}).get("mor.compact-min-delta-ratio", "0.2"))

    @property
    def hard_max_deltas_per_bucket(self) -> int:
        """Read-health bound: a bucket exceeding this many delta files
        compacts regardless of the size ratio (every reader of the bucket
        pays per-file open + arg-max fan-in)."""
        return int(
            self.meta.get("properties", {}).get(
                "mor.hard-max-deltas-per-bucket", str(8 * self.max_deltas_per_bucket)
            )
        )

    def _read_files(self, spark: SparkSession, files: list[dict[str, Any]]) -> DataFrame:
        """Read a set of data files, aligning every schema version to the
        current one (null-fill added columns, cast widened columns)."""
        cur_user = self.schema
        cur_phys = _physical_schema(cur_user)
        cur_entry = next(s for s in self.meta["schemas"] if s["id"] == self.meta["current_schema_id"])
        defaults = cur_entry.get("defaults", {})
        if not files:
            return spark.createDataFrame([], cur_phys)
        by_sid: dict[int, list[str]] = {}
        for fe in files:
            by_sid.setdefault(fe["schema_id"], []).append(os.path.join(self.path, fe["path"]))
        parts: list[DataFrame] = []
        for sid, paths in by_sid.items():
            phys = _physical_schema(self._schema_by_id(sid))
            df = spark.read.schema(phys).parquet(*paths)
            parts.append(_align(df, cur_phys, defaults))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read_raw(self, spark: SparkSession, buckets: set[int] | None = None) -> DataFrame:
        """All current rows incl. tombstones + system columns. Under MoR,
        buckets carrying delta files are resolved at read time: per-key
        arg-max over (wall, logical, seq) across base+deltas — identical
        ordering to the CoW merge guard, so both modes yield the same
        state. Delta-free buckets pass through without a shuffle.
        ``buckets`` restricts the scan to those buckets (keys hash to
        exactly one bucket, so per-bucket reads are self-contained)."""
        files = self.meta["files"]
        if buckets is not None:
            files = [fe for fe in files if fe["bucket"] in buckets]
        delta_buckets = {fe["bucket"] for fe in files if fe.get("kind") == "delta"}
        if not delta_buckets:
            return self._read_files(spark, files)
        plain = [fe for fe in files if fe["bucket"] not in delta_buckets]
        mixed = [fe for fe in files if fe["bucket"] in delta_buckets]
        resolved = _argmax_rows(self._read_files(spark, mixed), self.pk_col)
        return self._read_files(spark, plain).unionByName(resolved)

    def read_state(self, spark: SparkSession) -> DataFrame:
        """User-facing table state (live rows, user columns)."""
        user_cols = [f.name for f in self.schema.fields]
        return self.read_raw(spark).filter(~F.col("_deleted")).select(*user_cols)

    # ---------------- merge ----------------

    def merge(
        self,
        spark: SparkSession,
        updates: DataFrame,
        batch_key: str,
        frontier_hlc: str | None = None,
        broadcast_threshold: int = 2_000_000,
        frontier_provider=None,
    ) -> dict[str, Any]:
        """Dispatch on the table's write mode.

        ``frontier_provider`` (optional ``() -> str|None``) is consulted
        right before the metadata commit — it lets callers derive the
        resolved frontier from an ``observe()`` on the update plan itself
        (available only after the staging action ran) instead of paying a
        separate aggregation pass.

        * ``cow`` (default) — copy-on-write: join against touched buckets,
          rewrite them. Read-optimized; write cost ∝ touched-bucket size.
        * ``mor`` — merge-on-read: append the deduped updates as delta
          files (NO join, write cost ∝ update count); readers resolve
          per-key arg-max lazily; buckets auto-compact when their delta
          count exceeds ``mor.max-deltas-per-bucket``. This is the
          update-heavy-workload mode: a micro-batch touching 1% of keys in
          every bucket writes 1% of the data instead of 100%.
        """
        if self.merge_mode == "mor":
            return self._merge_mor(spark, updates, batch_key, frontier_hlc, frontier_provider)
        return self._merge_cow(spark, updates, batch_key, frontier_hlc, broadcast_threshold, frontier_provider)

    def _merge_cow(
        self,
        spark: SparkSession,
        updates: DataFrame,
        batch_key: str,
        frontier_hlc: str | None = None,
        broadcast_threshold: int = 2_000_000,
        frontier_provider=None,
    ) -> dict[str, Any]:
        """Apply a deduped update set (ONE row per pk — caller runs
        ``dedupe_batch`` first; Iceberg MERGE has the same one-match-row
        rule). Expected update columns: user columns + ``op`` +
        ``commit_wall_ns`` + ``commit_logical`` + ``seq``.

        Guard: an update only lands if its (wall, logical, seq) exceeds the
        stored commit of the matching row — late/stale events are no-ops
        (FIXTURES scenario 12); replayed batch_keys are skipped entirely.
        """
        if batch_key in self.meta["applied"]:
            return {"skipped": True, "batch_key": batch_key, "version": self.meta["version"]}

        pk = self.pk_col
        user_fields = self.schema.fields
        user_cols = [f.name for f in user_fields]
        nb = self.meta["num_buckets"]

        # ONE pass over the (parse→dedup) update chain: normalize to the
        # physical row image and stage it as parquet. Downstream consumers
        # (bucket probe, both join sides) read the staged columnar files —
        # deliberately NOT .persist(): Spark's in-memory cache collapses on
        # nested array/struct rows (70s+ builds vs a sub-second parquet
        # round-trip) and the update count comes free from the footers.
        u_rows_plan = updates.select(
            *[F.col(c) for c in user_cols],
            F.pmod(F.xxhash64(F.col(pk)), F.lit(nb)).cast("int").alias("_bucket"),
            (F.col("op") == "d").alias("_deleted"),
            F.col("commit_wall_ns").alias("_commit_wall_ns"),
            F.col("commit_logical").alias("_commit_logical"),
            F.col("seq").alias("_commit_seq"),
        )
        staging = os.path.join(self.path, "staging", batch_key.replace(":", "_"))
        # repartition on _bucket so partitionBy emits ≤1 file per bucket
        # (without it every task writes a sliver into every bucket dir)
        par_u = min(nb, max(spark.sparkContext.defaultParallelism, 1) * 2)
        u_rows_plan.repartition(par_u, "_bucket").write.mode("overwrite").partitionBy("_bucket").parquet(staging)
        n_updates, per_bucket, u_ranges = _staged_stats(staging, pk)
        touched = sorted(per_bucket)
        # file-level pruning inside touched buckets (Iceberg column-stats
        # analogue): a target file whose pk [min,max] cannot intersect the
        # bucket's update range holds no update pk — carry it untouched
        # instead of rewriting it. Safe for the not-matched insert path
        # too: a pruned file cannot contain any update pk by construction.
        target_files: list[dict[str, Any]] = []
        carry_files: list[dict[str, Any]] = []
        pruned_files = 0
        for fe in self.meta["files"]:
            if fe["bucket"] not in per_bucket:
                carry_files.append(fe)
                continue
            ur = u_ranges.get(fe["bucket"])
            if (
                ur is not None and "pk_min" in fe
                and (fe["pk_max"] < ur[0] or fe["pk_min"] > ur[1])
            ):
                carry_files.append(fe)
                pruned_files += 1
            else:
                target_files.append(fe)

        obs = Observation()
        new_version = self.meta["version"] + 1
        rel_dir = f"data/v{new_version}"
        out_dir = os.path.join(self.path, rel_dir)
        new_files: list[dict[str, Any]] = []
        if touched:
            u_rows = spark.read.parquet(staging)  # partition discovery restores _bucket
            # the anti join consumes the UNHINTED plan: its update side is
            # the LEFT (streamed) side there, where a broadcast hint is
            # invalid (Spark warns and ignores it) — AQE picks its strategy
            u_rows_anti = u_rows
            # broadcast only when the update set is genuinely small — a
            # forced broadcast of a big batch builds its hash relation
            # single-threaded on the driver (measured serial-fraction
            # killer); above the threshold AQE picks the join from runtime
            # stats of the staged files
            if n_updates <= broadcast_threshold:
                u_rows = F.broadcast(u_rows)

            tgt = self._read_files(spark, target_files)
            tgt_b = tgt.withColumn("_bucket", F.pmod(F.xxhash64(F.col(pk)), F.lit(nb)).cast("int"))

            newer = _commit_gt("u", "t")
            # matched path: keep target unless the update is strictly newer
            tcols = [F.col(f"t.{c}") for c in user_cols + ["_bucket"] + META_COLS]
            ucols = [F.col(f"u.{c}") for c in user_cols + ["_bucket"] + META_COLS]
            matched = (
                tgt_b.alias("t")
                .join(u_rows.alias("u"), on=F.col(f"t.{pk}") == F.col(f"u.{pk}"), how="left")
                .select(
                    F.when(F.col(f"u.{pk}").isNull() | ~newer, F.struct(*tcols))
                    .otherwise(F.struct(*ucols))
                    .alias("r"),
                    (F.col(f"u.{pk}").isNotNull() & newer).alias("_applied"),
                    F.col(f"u.{pk}").isNotNull().alias("_matched"),
                )
            )
            # not-matched path: brand-new keys (incl. tombstones for deletes
            # of unseen keys — guards against late older inserts
            # resurrecting them)
            unmatched = (
                u_rows_anti.alias("u")
                .join(tgt_b.select(pk).alias("t"), on=F.col(f"u.{pk}") == F.col(f"t.{pk}"), how="left_anti")
                .select(F.struct(*[F.col(c) for c in user_cols + ["_bucket"] + META_COLS]).alias("r"),
                        F.lit(True).alias("_applied"), F.lit(False).alias("_matched"))
            )
            result = matched.unionByName(unmatched).select("r.*", "_applied", "_matched")
            result = result.observe(
                obs,
                F.count(F.lit(1)).alias("rows_written"),
                F.sum(F.when(F.col("_applied") & F.col("_matched") & F.col("_deleted"), 1).otherwise(0)).alias("deleted"),
                F.sum(F.when(F.col("_applied") & F.col("_matched") & ~F.col("_deleted"), 1).otherwise(0)).alias("updated"),
                F.sum(F.when(F.col("_applied") & ~F.col("_matched"), 1).otherwise(0)).alias("inserted"),
                F.sum(F.when(~F.col("_applied") & F.col("_matched"), 1).otherwise(0)).alias("stale_or_kept"),
            ).drop("_applied", "_matched")
            # partitionBy splits files per bucket regardless; the repartition
            # count only sets write parallelism — cap it near the core count
            # so tiny merges don't schedule one task per bucket
            par = min(len(touched), max(spark.sparkContext.defaultParallelism, 1) * 2)
            (
                result.repartition(par, "_bucket")
                .write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(out_dir)
            )
            sid = self.meta["current_schema_id"]
            new_files = _collect_data_files(self.path, out_dir, rel_dir, sid, pk=pk)
            stats = {k: int(v) for k, v in obs.get.items()}
        else:
            stats = {"rows_written": 0, "deleted": 0, "updated": 0, "inserted": 0, "stale_or_kept": 0}
        stats["pruned_files"] = pruned_files

        meta = json.loads(json.dumps(self.meta))
        meta["version"] = new_version
        meta["files"] = carry_files + new_files
        meta["applied"][batch_key] = new_version
        if frontier_provider is not None and frontier_hlc is None:
            frontier_hlc = frontier_provider()
        if frontier_hlc:
            from ..functions.hlc import parse_hlc

            wall, logical = parse_hlc(frontier_hlc)
            if (wall, logical) >= (meta["frontier"]["wall_ns"], meta["frontier"]["logical"]):
                meta["frontier"] = {"wall_ns": wall, "logical": logical, "hlc": frontier_hlc}
        stats.update({"n_updates": n_updates, "touched_buckets": len(touched), "frontier_hlc": frontier_hlc})
        meta["summary"] = {"op": "merge", "batch_key": batch_key, **stats, "committed_at": time.time()}
        self._write_version(meta)
        shutil.rmtree(staging, ignore_errors=True)
        return {"skipped": False, "batch_key": batch_key, "version": new_version, **stats}


    def _merge_mor(
        self,
        spark: SparkSession,
        updates: DataFrame,
        batch_key: str,
        frontier_hlc: str | None = None,
        frontier_provider=None,
    ) -> dict[str, Any]:
        """Append-only apply: normalized update rows land as delta files in
        their buckets; no target scan, no join. Exactly-once and the
        commit-ts guard hold because read-time resolution is the same
        arg-max the CoW guard implements."""
        if batch_key in self.meta["applied"]:
            return {"skipped": True, "batch_key": batch_key, "version": self.meta["version"]}

        pk = self.pk_col
        user_cols = [f.name for f in self.schema.fields]
        nb = self.meta["num_buckets"]

        u_rows = updates.select(
            *[F.col(c) for c in user_cols],
            F.pmod(F.xxhash64(F.col(pk)), F.lit(nb)).cast("int").alias("_bucket"),
            (F.col("op") == "d").alias("_deleted"),
            F.col("commit_wall_ns").alias("_commit_wall_ns"),
            F.col("commit_logical").alias("_commit_logical"),
            F.col("seq").alias("_commit_seq"),
        )
        # ONE Spark pass total: the delta write IS the apply; update count
        # and touched buckets come from the written parquet footers
        new_version = self.meta["version"] + 1
        rel_dir = f"data/v{new_version}"
        out_dir = os.path.join(self.path, rel_dir)
        par_u = min(nb, max(spark.sparkContext.defaultParallelism, 1) * 2)
        u_rows.repartition(par_u, "_bucket").write.mode("overwrite").partitionBy("_bucket").parquet(out_dir)
        scanned = _scan_bucket_dir(out_dir, pk)  # ONE footer pass, shared
        n_updates, per_bucket, _ = _staged_stats(out_dir, pk, scanned=scanned)
        touched = sorted(per_bucket)
        sid = self.meta["current_schema_id"]
        new_files = _collect_data_files(
            self.path, out_dir, rel_dir, sid, pk=pk, kind="delta", scanned=scanned
        )

        meta = json.loads(json.dumps(self.meta))
        meta["version"] = new_version
        meta["files"] = meta["files"] + new_files
        meta["applied"][batch_key] = new_version
        if frontier_provider is not None and frontier_hlc is None:
            frontier_hlc = frontier_provider()
        if frontier_hlc:
            from ..functions.hlc import parse_hlc

            wall, logical = parse_hlc(frontier_hlc)
            if (wall, logical) >= (meta["frontier"]["wall_ns"], meta["frontier"]["logical"]):
                meta["frontier"] = {"wall_ns": wall, "logical": logical, "hlc": frontier_hlc}
        stats = {"n_updates": n_updates, "touched_buckets": len(touched),
                 "delta_files": len(new_files), "frontier_hlc": frontier_hlc}
        meta["summary"] = {"op": "merge-mor", "batch_key": batch_key, **stats,
                           "committed_at": time.time()}
        self._write_version(meta)

        # auto-compaction: a bucket compacts when its delta FILE count
        # passes the soft trigger AND its delta ROWS reach
        # compact_min_delta_ratio of its base rows (LSM-style size-ratio —
        # see the property docstrings: the file trigger alone forces a
        # full-table rewrite every max_deltas batches once steady
        # micro-batches touch every bucket), or unconditionally at the
        # hard file cap (read health). Manifests written before row counts
        # existed fall back to the file trigger alone.
        to_compact = self._compaction_victims(meta["files"])
        if to_compact:
            stats["compacted_buckets"] = len(to_compact)
            t0 = time.time()
            self.compact(spark, to_compact)
            stats["compact_secs"] = round(time.time() - t0, 3)
        return {"skipped": False, "batch_key": batch_key, "version": self.meta["version"], **stats}

    def _compaction_victims(self, files: list[dict[str, Any]]) -> list[int]:
        d_files: dict[int, int] = {}
        d_rows: dict[int, int] = {}
        b_rows: dict[int, int] = {}
        # legacy fallback is PER BUCKET: only a bucket whose own entries
        # predate manifest row counts loses the ratio gate — a single
        # never-rewritten legacy file elsewhere must not reinstate the
        # full-table compaction storm for every other bucket
        rows_known: dict[int, bool] = {}
        for fe in files:
            b = fe["bucket"]
            if "rows" not in fe:
                rows_known[b] = False
            if fe.get("kind") == "delta":
                d_files[b] = d_files.get(b, 0) + 1
                d_rows[b] = d_rows.get(b, 0) + fe.get("rows", 0)
            else:
                b_rows[b] = b_rows.get(b, 0) + fe.get("rows", 0)
        soft, hard = self.max_deltas_per_bucket, self.hard_max_deltas_per_bucket
        ratio = self.compact_min_delta_ratio
        out = []
        for b, n in d_files.items():
            if n <= soft:
                continue
            if n > hard or not rows_known.get(b, True):
                out.append(b)
            elif d_rows.get(b, 0) >= ratio * b_rows.get(b, 0):
                out.append(b)
        return sorted(out)

    def compact(self, spark: SparkSession, buckets: list[int] | None = None) -> dict[str, Any]:
        """Collapse base+delta files of the given buckets (default: every
        bucket with deltas) into fresh base files via read-time arg-max."""
        files = self.meta["files"]
        if buckets is None:
            buckets = sorted({fe["bucket"] for fe in files if fe.get("kind") == "delta"})
        bucket_set = set(buckets)
        victims = [fe for fe in files if fe["bucket"] in bucket_set]
        keep = [fe for fe in files if fe["bucket"] not in bucket_set]
        if not victims:
            return {"compacted": 0, "version": self.meta["version"]}
        resolved = _argmax_rows(self._read_files(spark, victims), self.pk_col)
        # tombstone GC: the resolved-timestamp frontier guarantees no event
        # below it can still arrive (W1), so a delete tombstone older than
        # the frontier has nothing left to guard against — purge it
        frontier_wall = int(self.meta["frontier"]["wall_ns"])
        if frontier_wall > 0:
            resolved = resolved.filter(
                ~(F.col("_deleted") & (F.col("_commit_wall_ns") < frontier_wall))
            )
        resolved = resolved.withColumn(
            "_bucket",
            F.pmod(F.xxhash64(F.col(self.pk_col)), F.lit(self.meta["num_buckets"])).cast("int"),
        )
        new_version = self.meta["version"] + 1
        rel_dir = f"data/v{new_version}"
        out_dir = os.path.join(self.path, rel_dir)
        par = min(len(bucket_set), max(spark.sparkContext.defaultParallelism, 1) * 2)
        resolved.repartition(par, "_bucket").write.mode("overwrite").partitionBy("_bucket").parquet(out_dir)
        sid = self.meta["current_schema_id"]
        new_files = _collect_data_files(self.path, out_dir, rel_dir, sid, pk=self.pk_col)
        meta = json.loads(json.dumps(self.meta))
        meta["version"] = new_version
        meta["files"] = keep + new_files
        meta["summary"] = {"op": "compact", "buckets": buckets, "committed_at": time.time()}
        self._write_version(meta)
        return {"compacted": len(buckets), "version": new_version}

    def table_changes(
        self, spark: SparkSession, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Change-data-feed read (the inverse of the apply path: table
        state back OUT as a change stream, Delta-CDF/Iceberg-changelog
        analogue): row-level differences between two retained snapshot
        versions, keyed by pk.

        Output: the user columns (post-image; pre-image for deletes),
        ``_change_type`` ∈ {insert, update_postimage, delete} and the
        winning commit tuple. Distributed as one pk-keyed full-outer join
        between the two pinned snapshots — no log scan, no state.

        Manifest-level bucket pruning: a bucket whose (path, kind) file
        set is identical in both manifests holds byte-identical rows with
        identical commit tuples on both sides, so it cannot contribute a
        diff — such buckets are skipped driver-side before any scan. At
        10^10 rows a micro-batch touches ~1% of buckets; the CDF read then
        scans ~2% of the table instead of 200%."""
        old_t = SnapshotTable.load(self.path, from_version)
        new_t = SnapshotTable.load(self.path, to_version) if to_version is not None else self

        def _by_bucket(files: list[dict[str, Any]]) -> dict[int, set]:
            d: dict[int, set] = {}
            for fe in files:
                d.setdefault(fe["bucket"], set()).add((fe["path"], fe.get("kind")))
            return d

        ob, nb = _by_bucket(old_t.meta["files"]), _by_bucket(new_t.meta["files"])
        changed = {
            b for b in set(ob) | set(nb) if ob.get(b) != nb.get(b)
        }
        user_cols = [f.name for f in new_t.schema.fields]
        pk = self.pk_col
        o = _align(old_t.read_raw(spark, buckets=changed), _physical_schema(new_t.schema)).select(
            F.col(pk).alias("_o_pk"),
            *[F.col(c).alias(f"_o_{c}") for c in user_cols if c != pk],
            *[F.col(c).alias(f"_o_{c}") for c in META_COLS],
        )
        n = new_t.read_raw(spark, buckets=changed)
        j = n.join(o, n[pk] == o["_o_pk"], "full_outer")
        same_commit = (
            (F.col("_commit_wall_ns") == F.col("_o__commit_wall_ns"))
            & (F.col("_commit_logical") == F.col("_o__commit_logical"))
            & (F.col("_commit_seq") == F.col("_o__commit_seq"))
        )
        old_live = F.col("_o_pk").isNotNull() & ~F.col("_o__deleted")
        new_live = F.col(pk).isNotNull() & ~F.col("_deleted")
        change = (
            F.when(~old_live & new_live, F.lit("insert"))
            .when(old_live & ~new_live, F.lit("delete"))
            .when(old_live & new_live & ~same_commit, F.lit("update_postimage"))
        )
        out_cols = [F.coalesce(F.col(pk), F.col("_o_pk")).alias(pk)] + [
            # delete rows carry the pre-image (the post-image is a tombstone)
            F.when(F.col("_deleted").isNotNull() & F.col("_deleted"), F.col(f"_o_{c}"))
            .otherwise(F.col(c)).alias(c)
            for c in user_cols if c != pk
        ]
        return (
            j.withColumn("_change_type", change)
            .filter(F.col("_change_type").isNotNull())
            .select(
                *out_cols,
                "_change_type",
                *[F.col(c) for c in META_COLS if c != "_deleted"],
            )
        )

    def compact_fragmented(
        self, spark: SparkSession, max_files_per_bucket: int = 4
    ) -> dict[str, Any]:
        """Maintenance policy: fold any bucket whose file count exceeds the
        threshold (delta piles under MoR, pruned-carry + fresh files under
        CoW) back into a single base file. Small files are the silent
        10^10-row killer — every merge's bucket scan pays per-file open
        cost; this keeps it O(1) per bucket."""
        per_bucket: dict[int, int] = {}
        for fe in self.meta["files"]:
            per_bucket[fe["bucket"]] = per_bucket.get(fe["bucket"], 0) + 1
        victims = sorted(b for b, n in per_bucket.items() if n > max_files_per_bucket)
        if not victims:
            return {"compacted": 0, "version": self.meta["version"]}
        return self.compact(spark, victims)

    def gc_orphans(self, retain_versions: int = 2) -> dict[str, int]:
        """Remove data files not referenced by the current snapshot and
        metadata/staging left behind by superseded commits or crashed
        writers (Iceberg's remove-orphan-files + expire-snapshots). Call
        only when no reader is pinned to an older snapshot and no writer is
        mid-merge — the same operational contract as Iceberg's maintenance
        actions. ``retain_versions`` keeps that many trailing metadata
        versions for debugging/time-travel of the manifest (data files of
        superseded versions are removed regardless — they are what costs
        storage at 10^10 rows)."""
        referenced = {os.path.normpath(fe["path"]) for fe in self.meta["files"]}
        removed_data = removed_meta = removed_staging = 0
        surviving: set[str] = set()  # data paths still on disk after expiry
        data_root = os.path.join(self.path, "data")
        if os.path.isdir(data_root):
            for vdir in sorted(os.listdir(data_root)):
                vpath = os.path.join(data_root, vdir)
                for root, _dirs, fns in os.walk(vpath):
                    for fn in fns:
                        full = os.path.join(root, fn)
                        rel = os.path.normpath(os.path.relpath(full, self.path))
                        if rel not in referenced:
                            os.remove(full)
                            removed_data += 1
                        else:
                            surviving.add(rel)
                # drop now-empty version dirs bottom-up
                for root, dirs, fns in list(os.walk(vpath, topdown=False)):
                    if not os.listdir(root):
                        os.rmdir(root)
        staging_root = os.path.join(self.path, "staging")
        if os.path.isdir(staging_root):
            for d in os.listdir(staging_root):
                shutil.rmtree(os.path.join(staging_root, d), ignore_errors=True)
                removed_staging += 1
        mdir = os.path.join(self.path, "metadata")
        keep_from = self.meta["version"] - max(retain_versions - 1, 0)
        for fn in os.listdir(mdir):
            if fn.startswith("v") and fn.endswith(".json"):
                try:
                    v = int(fn[1:-5])
                except ValueError:
                    continue
                if v < keep_from:
                    os.remove(os.path.join(mdir, fn))
                    removed_meta += 1
        # time-travel contract: a retained metadata version must be
        # READABLE — data files are expired against the current snapshot
        # only, so an older retained manifest may now reference removed
        # files. Drop such manifests so load(version=) fails fast with the
        # intended "not retained" error instead of succeeding and then
        # blowing up mid-scan on missing parquet (lake.load contract).
        # Membership is tested against the surviving-path set built during
        # the expiry walk above — one metadata pass total, not
        # O(retained_versions × files) stat calls on the driver.
        for fn in os.listdir(mdir):
            if not (fn.startswith("v") and fn.endswith(".json")):
                continue
            try:
                v = int(fn[1:-5])
            except ValueError:
                continue
            if v == self.meta["version"]:
                continue
            with open(os.path.join(mdir, fn)) as f:
                old = json.load(f)
            if any(
                os.path.normpath(fe["path"]) not in surviving for fe in old["files"]
            ):
                os.remove(os.path.join(mdir, fn))
                removed_meta += 1
        return {"data_files": removed_data, "metadata_files": removed_meta,
                "staging_dirs": removed_staging}


def _scan_footer(fp: str, pk: str | None) -> tuple[int, tuple | None]:
    """ONE footer read: (num_rows, pk (min,max) or None). Ranges are None
    when stats are absent or non-JSON-able (binary pk)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(fp).metadata
    n = md.num_rows
    if pk is None or md.num_row_groups == 0:
        return n, None
    col_idx = None
    rg0 = md.row_group(0)
    for i in range(rg0.num_columns):
        if rg0.column(i).path_in_schema == pk:
            col_idx = i
            break
    if col_idx is None:
        return n, None
    mn = mx = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(col_idx).statistics
        if st is None or not st.has_min_max:
            return n, None
        mn = st.min if mn is None else min(mn, st.min)
        mx = st.max if mx is None else max(mx, st.max)
    if isinstance(mn, bytes) or isinstance(mx, bytes):
        return n, None
    return n, (mn, mx)


def _scan_bucket_dir(root: str, pk: str | None) -> list[dict[str, Any]]:
    """Footer scan of a ``_bucket=``-partitioned dir: one pyarrow metadata
    read per file, thread-pooled (pyarrow releases the GIL; a micro-batch
    writing #tasks×#buckets files must not serialize ~1000 footer reads on
    the driver — measured as a 2.6x throughput regression before pooling).
    Returns [{path(abs), bucket, rows, range}]."""
    from concurrent.futures import ThreadPoolExecutor

    todo: list[tuple[str, int]] = []
    if not os.path.isdir(root):
        return []
    for bdir in sorted(os.listdir(root)):
        if not bdir.startswith("_bucket="):
            continue
        b = int(bdir.split("=")[1])
        for fn in sorted(os.listdir(os.path.join(root, bdir))):
            if fn.endswith(".parquet"):
                todo.append((os.path.join(root, bdir, fn), b))
    if not todo:
        return []
    with ThreadPoolExecutor(max_workers=min(16, len(todo))) as pool:
        scanned = list(pool.map(lambda t: _scan_footer(t[0], pk), todo))
    return [
        {"path": fp, "bucket": b, "rows": n, "range": r}
        for (fp, b), (n, r) in zip(todo, scanned)
    ]


def _staged_stats(
    root: str, pk: str | None = None, scanned: list[dict[str, Any]] | None = None
) -> tuple[int, dict[int, int], dict[int, tuple]]:
    """(total rows, rows per bucket, pk-range per bucket) of a
    ``_bucket=``-partitioned parquet dir, from file footers — driver-side
    metadata only, no Spark job (exactly what Iceberg manifests store)."""
    per_bucket: dict[int, int] = {}
    ranges: dict[int, tuple] = {}
    complete: dict[int, bool] = {}
    for e in _scan_bucket_dir(root, pk) if scanned is None else scanned:
        b = e["bucket"]
        per_bucket[b] = per_bucket.get(b, 0) + e["rows"]
        if pk is not None:
            if e["range"] is None:
                complete[b] = False
            elif complete.get(b, True):
                complete[b] = True
                mn, mx = e["range"]
                if b in ranges:
                    ranges[b] = (min(ranges[b][0], mn), max(ranges[b][1], mx))
                else:
                    ranges[b] = (mn, mx)
    for b, ok in complete.items():
        if not ok:
            ranges.pop(b, None)
    per_bucket = {b: n for b, n in per_bucket.items() if n}
    ranges = {b: r for b, r in ranges.items() if b in per_bucket}
    return sum(per_bucket.values()), per_bucket, ranges


def _collect_data_files(
    table_path: str, out_dir: str, rel_dir: str, sid: int,
    pk: str | None = None, kind: str | None = None,
    scanned: list[dict[str, Any]] | None = None,
) -> list[dict[str, Any]]:
    """Manifest entries for a freshly-written ``_bucket=``-partitioned dir,
    with per-file pk min/max from the footers (the Iceberg column-stats
    analogue; drives file-level pruning in the CoW merge)."""
    files: list[dict[str, Any]] = []
    for e in _scan_bucket_dir(out_dir, pk) if scanned is None else scanned:
        fe: dict[str, Any] = {
            "path": f"{rel_dir}/{os.path.relpath(e['path'], out_dir)}",
            "bucket": e["bucket"], "schema_id": sid,
            # per-file row count from the same footer pass — drives the
            # size-ratio compaction policy without any extra I/O (the
            # Iceberg manifest record_count analogue)
            "rows": e["rows"],
        }
        if kind:
            fe["kind"] = kind
        if e["range"] is not None:
            fe["pk_min"], fe["pk_max"] = e["range"]
        files.append(fe)
    return files


def _argmax_rows(df: DataFrame, pk_col: str) -> DataFrame:
    """One surviving physical row per key by max (wall, logical, seq) —
    the read-time twin of the CoW merge guard.

    Two-phase arg-max (same shape as operators/dedup.last_writer_wins,
    where it measured 64s → ~4s on a 2M-row batch): phase 1 aggregates
    ONLY the 3-long ordering tuple per key — map-side combinable, and the
    aggregation never touches the nested token payload (a payload-wide
    ``max(struct(...))`` forces ObjectHashAggregate into its sort-based
    fallback past 128 groups, and sorting nested arrays is brutal). Phase
    2 joins the winners back; the winner side is (pk + 3 longs) so the
    shuffle-hash build is tiny, and the payload side is hashed, never
    sorted. Catalyst folds the ordering-equality filter into the join
    keys, so the payload shuffle hashes on (wall, logical, seq, pk) —
    which also spreads a hot key's delta rows across partitions
    (skew-immune, unlike a pk-partitioned window).

    One row per key then holds WITHOUT a trailing dedup because no two
    stored rows can share the full (pk, wall, logical, seq) tuple: seq is
    the globally-unique log offset (redeliveries arrive under fresh
    offsets, the Kafka composite folds the partition into the low bits),
    a micro-batch's offset range never overlaps another's, and replayed
    batches are dropped by the batch_key guard before anything is
    written. A dropDuplicates here would re-introduce exactly the
    payload-wide aggregate this function exists to avoid (Catalyst plans
    it as a first(<payload>) SortAggregate over nested arrays)."""
    ordering = ["_commit_wall_ns", "_commit_logical", "_commit_seq"]
    win = df.groupBy(pk_col).agg(
        F.max(F.struct(*[F.col(c) for c in ordering])).alias("_win")
    )
    cond = F.lit(True)
    for c in ordering:
        cond = cond & (F.col(c) == F.col(f"_win.{c}"))
    return (
        df.join(win.hint("shuffle_hash"), pk_col)
        .filter(cond)
        .select(*df.columns)
    )


def _commit_gt(a: str, b: str):
    """(wall, logical, seq) lexicographic strictly-greater between aliases."""
    return F.struct(
        F.col(f"{a}._commit_wall_ns"), F.col(f"{a}._commit_logical"), F.col(f"{a}._commit_seq")
    ) > F.struct(
        F.col(f"{b}._commit_wall_ns"), F.col(f"{b}._commit_logical"), F.col(f"{b}._commit_seq")
    )


def _json_safe(v: Any) -> bool:
    try:
        json.dumps(v)
        return True
    except (TypeError, ValueError):
        return False


def _align(
    df: DataFrame, to_schema: T.StructType, defaults: dict[str, Any] | None = None
) -> DataFrame:
    """Align a file's rows to ``to_schema``: cast widened columns; fill
    columns the file predates with their registered default (C14) or null."""
    have = {f.name: f for f in df.schema.fields}
    defaults = defaults or {}
    cols = []
    for f in to_schema.fields:
        if f.name in have:
            src = F.col(f.name)
            cols.append(src.cast(f.dataType).alias(f.name) if have[f.name].dataType != f.dataType else src)
        elif f.name in defaults:
            cols.append(F.lit(defaults[f.name]).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
