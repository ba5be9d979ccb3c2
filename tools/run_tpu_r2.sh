#!/usr/bin/env bash
# Round-2 TPU measurement batch: run everything pending once the chip is up.
# Usage: PYTHONPATH=.:/root/.axon_site bash tools/run_tpu_r2.sh [outdir]
set -u
OUT="${1:-/tmp/tpu_r2}"
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

# 1. go/no-go: int8-MXU kernel probe vs production kernel
run int8mxu 2400 python tools/bench_int8_mxu.py

# 2. headline decode A/B: bf16 vs i8 dot, B=1 and B=8 (+ roofline lines)
run bench_b1_bf16 1800 python bench.py
run bench_b1_i8 1800 env LLAMAVK_Q4_DOT=i8 python bench.py
run bench_b8_bf16 1800 python bench.py --batch 8
run bench_b8_i8 1800 env LLAMAVK_Q4_DOT=i8 python bench.py --batch 8

# 3. int8-KV B=1 anomaly re-check (VERDICT weak #2)
run bench_b1_kvint8 1800 python bench.py --kv-dtype int8

# 4. speculative round costs: model-draft vs prompt-lookup
run spec_round 2400 python tools/bench_spec.py --gamma 4
run lookup_round 2400 python tools/bench_spec.py --lookup --gamma 4
run lookup_round_g8 2400 python tools/bench_spec.py --lookup --gamma 8

# 5. serving A/B: plain vs lookup speculation (same sampled load)
run serving_plain 3600 python tools/bench_serving.py --max-batch 32
run serving_lookup 3600 python tools/bench_serving.py --max-batch 32 --lookup-gamma 4

# 6. shared-prefix serving: pool-attended system prompt vs per-slot copies
run serving_sharedpfx 3600 python tools/bench_serving.py --max-batch 32 --shared-prefix --prefix-len 128

# 7. paged-KV serving: block-table pool at the flat footprint, then
#    oversubscribed (half the pages — preemption path under real load)
run serving_paged 3600 python tools/bench_serving.py --max-batch 32 --paged
run serving_paged_half 3600 python tools/bench_serving.py --max-batch 32 --paged --n-pages 129

echo "=== summary ==="
grep -h '"metric"' "$OUT"/*.out 2>/dev/null
grep -h "roofline:" "$OUT"/*.err 2>/dev/null
