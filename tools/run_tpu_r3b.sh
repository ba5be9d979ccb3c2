#!/usr/bin/env bash
# Round-3 follow-up: 64-slot serving configs under a FULL load (128 requests
# — the r3a runs submitted only 32 requests to 64 slots, so half the batch
# decoded garbage), plus the retuned headline bench.
set -u
OUT="${1:-/tmp/tpu_r3b}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH=.:/root/.axon_site

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  echo "exit=$? (see $OUT/$name.{out,err})"
  tail -3 "$OUT/$name.err"
  cat "$OUT/$name.out"
}

run bench_b1_default 1800 python bench.py
run serving_flat_int8_64_full 5400 python tools/bench_serving.py \
  --max-batch 64 --kv-dtype int8 --requests 128
run serving_paged_int8_64_full 5400 python tools/bench_serving.py \
  --max-batch 64 --paged --kv-dtype int8 --requests 128
run serving_paged_int8_64_half 5400 python tools/bench_serving.py \
  --max-batch 64 --paged --kv-dtype int8 --requests 128 --n-pages 257
run serving_paged_bf16_64_full 5400 python tools/bench_serving.py \
  --max-batch 64 --paged --requests 128
