#!/bin/bash
# Round-5 adjudication of the flagship cdc_full_apply local[32] regression
# (BENCH_r04: min-of-2 24.0->31.0s, cold repeat 134.8s). Five controlled
# configs, same seed/input/level, best-of-4 with warmup, run strictly
# sequentially (concurrent Spark jobs silently halve numbers on this host):
#   A zstd + compaction cadence ratio 0.2 (shipped defaults)
#   B lz4  + ratio 0.2                      (codec axis)
#   C zstd + ratio 0                        (cadence axis)
#   D lz4  + ratio 0                        (both off)
#   E zstd + ratio 0.2 + 16 small batches   (the ledger's storm regime)
# Output: one JSON line per config in _work/ab_flagship_r05.jsonl
set -u
cd "$(dirname "$0")/.."
OUT=_work/ab_flagship_r05.jsonl
: > "$OUT"
LZ4='{"spark.sql.parquet.compression.codec":"lz4","spark.io.compression.codec":"lz4"}'

run() {
  local tag="$1"; shift
  echo "== $tag ==" >&2
  local line rc tmp
  # bench output goes to a temp file so rc is the bench's own exit status
  # (a `| tail -1` pipeline would report tail's rc instead)
  tmp=$(mktemp)
  env "$@" BENCH_SKIP_OPERATORS=1 BENCH_WARMUP=1 BENCH_REPEATS=4 \
        SPARK_GRAFT_CPUS=32 python bench.py >"$tmp" 2>>"_work/ab_flagship_stderr.log"
  rc=$?
  line=$(tail -1 "$tmp")
  rm -f "$tmp"
  if [ $rc -ne 0 ] || [ -z "$line" ]; then
    echo "!! $tag FAILED (rc=$rc) — see _work/ab_flagship_stderr.log" >&2
    printf '{"config":"%s","error":"bench failed rc=%d"}\n' "$tag" "$rc" >> "$OUT"
    return
  fi
  printf '{"config":"%s","result":%s}\n' "$tag" "$line" >> "$OUT"
}

run zstd_ratio02
run lz4_ratio02  BENCH_EXTRA_CONF="$LZ4"
run zstd_ratio0  BENCH_MOR_RATIO=0
run lz4_ratio0   BENCH_EXTRA_CONF="$LZ4" BENCH_MOR_RATIO=0
run zstd_ratio02_16batches BENCH_TRIGGER_FILES=2
echo DONE >&2
