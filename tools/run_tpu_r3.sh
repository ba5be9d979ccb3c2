#!/usr/bin/env bash
# Round-3 TPU measurement batch: the composed serving configs + regression
# re-checks on the real chip.
# Usage: PYTHONPATH=.:/root/.axon_site bash tools/run_tpu_r3.sh [outdir]
set -u
OUT="${1:-/tmp/tpu_r3}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH=.:/root/.axon_site

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  echo "exit=$? (see $OUT/$name.{out,err})"
  tail -5 "$OUT/$name.err"
  cat "$OUT/$name.out"
}

# 1. headline regression checks (bf16 + int8 KV at B=1 post-MSA-fix)
run bench_b1 1800 python bench.py
run bench_b1_kvint8 1800 python bench.py --kv-dtype int8

# 2. serving: the newly composed configs, mixed load at max_batch 32/64
#    (baselines r2: flat bf16 717, paged bf16 738.6 @32; flat int8 1128 @64)
run serving_paged_int8_32 3600 python tools/bench_serving.py \
  --max-batch 32 --paged --kv-dtype int8
run serving_paged_int8_64 3600 python tools/bench_serving.py \
  --max-batch 64 --paged --kv-dtype int8
run serving_flat_int8_64 3600 python tools/bench_serving.py \
  --max-batch 64 --kv-dtype int8
# int8 half-footprint pool: the memory headroom is the point — same load in
# half the KV HBM (257 pages hold the flat-equivalent bf16 load; int8 rows
# are half-size so 129 pages hold the same tokens)
run serving_paged_int8_64_half 3600 python tools/bench_serving.py \
  --max-batch 64 --paged --kv-dtype int8 --n-pages 257
# preemption under load (ROADMAP item: pool sized to actually run dry)
run serving_paged_preempt 3600 python tools/bench_serving.py \
  --max-batch 32 --paged --n-pages 65

# 3. paged x lookup speculation (greedy self-repeating load favors lookup)
run serving_paged_lookup 3600 python tools/bench_serving.py \
  --max-batch 32 --paged --lookup-gamma 4 --greedy
run serving_flat_lookup 3600 python tools/bench_serving.py \
  --max-batch 32 --lookup-gamma 4 --greedy

# 4. prefill roofline probe (where do the 84 ms/512-token chunks go?)
run prefill_probe 2400 python tools/bench_prefill.py
