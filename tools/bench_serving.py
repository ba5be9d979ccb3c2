"""Serving-throughput benchmark: the continuous-batching engine under a
mixed request load on the real chip.

Submits N requests with varied prompt lengths and generation budgets, runs
the scheduler to completion, and reports aggregate generated tok/s, per-
request latency percentiles, and slot utilization — the serving-layer
numbers the single-stream bench.py can't show.

usage: PYTHONPATH=.:/root/.axon_site python tools/bench_serving.py [--model 7B]
       [--requests 32] [--max-batch 8]
"""

import argparse
import sys
import time

import numpy as np

from llamavk_tpu.models import LLAMA_CONFIGS, ModelConfig, synthetic_params
from llamavk_tpu.runtime.batching import BatchConfig, BatchedEngine, Request
from llamavk_tpu.runtime.sampling import SamplerParams


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7B", choices=list(LLAMA_CONFIGS))
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--block", type=int, default=32)
    ap.add_argument("--kv-dtype", default="bfloat16", choices=["bfloat16", "int8"])
    ap.add_argument("--lookup-gamma", type=int, default=0,
                    help="prompt-lookup speculation per decode round (0=off)")
    ap.add_argument("--shared-prefix", action="store_true",
                    help="all requests share a pool-resident system prompt "
                    "(slots hold only suffixes)")
    ap.add_argument("--prefix-len", type=int, default=128,
                    help="shared system-prompt length (with --shared-prefix)")
    ap.add_argument("--greedy", action="store_true",
                    help="submit greedy requests (temp 0) instead of temp 0.8")
    ap.add_argument("--paged", action="store_true",
                    help="block-table paged KV pool (runtime/paged.py)")
    ap.add_argument("--page-size", type=int, default=128)  # measured sweet spot (r5 A/B: 128 > 64 > 256 on throughput)
    ap.add_argument("--no-int4", action="store_true",
                    help="int8 byte-packed weight planes (pre-r4 path) "
                    "instead of int4-plane storage")
    ap.add_argument("--n-pages", type=int, default=0,
                    help="pool pages (0 = flat footprint; smaller "
                    "oversubscribes slots and may preempt)")
    ap.add_argument("--prompt-range", type=int, nargs=2, default=(8, 128),
                    metavar=("LO", "HI"),
                    help="prompt lengths drawn uniform [LO, HI) — raise for "
                    "long-context loads (with --n-ctx 2048: e.g. 256 1024)")
    ap.add_argument("--predict-range", type=int, nargs=2, default=(32, 160),
                    metavar=("LO", "HI"),
                    help="generation budgets drawn uniform [LO, HI)")
    args = ap.parse_args()
    sp_load = (SamplerParams(temp=0.0) if args.greedy
               else SamplerParams(temp=0.8))

    cfg = ModelConfig(**LLAMA_CONFIGS[args.model])
    log(f"building synthetic {args.model} params ...")
    params = synthetic_params(cfg, seed=0, int4=not args.no_int4)
    eng = BatchedEngine(
        cfg,
        params,
        BatchConfig(max_batch=args.max_batch, n_ctx=args.n_ctx, block=args.block,
                    kv_dtype=args.kv_dtype, lookup_gamma=args.lookup_gamma,
                    shared_prefix=args.shared_prefix,
                    prefix_ctx=max(256, -(-args.prefix_len // 256) * 256),
                    paged=args.paged, page_size=args.page_size,
                    n_pages=args.n_pages),
    )

    rng = np.random.default_rng(0)

    plo, phi = args.prompt_range
    glo, ghi = args.predict_range

    def make_load(n):
        out = []
        for i in range(n):
            plen = int(rng.integers(plo, phi))
            npred = int(rng.integers(glo, ghi))
            prompt = rng.integers(10, cfg.n_vocab - 10, plen).tolist()
            out.append((prompt, plen, npred, i))
        return out

    # warmup: compile every (prefill bucket x admission chunk size) variant +
    # the decode block once (a serving process compiles exactly once per
    # shape; measure steady state). 7 same-bucket submits chunk as 4+2+1.
    log("warmup (jit compilation) ...")
    t0 = time.perf_counter()
    wb, warm_lens = 8, []
    while wb // 2 < phi and wb <= args.n_ctx:
        if wb >= plo:  # bucket [wb/2+1, wb] intersects the load's range
            warm_lens.append(min(wb, args.n_ctx) - 1)
        wb *= 2
    for plen in warm_lens:
        for _ in range(7):
            eng.submit([10] * plen, 2, sp=sp_load)
        eng.run()
    log(f"warmup done in {time.perf_counter() - t0:.1f}s")
    eng.stats.update(tokens=0, steps=0, t_decode=0.0, prefills=0, prefill_calls=0)

    pid = -1
    if args.shared_prefix:
        pid = eng.register_prefix(
            rng.integers(10, cfg.n_vocab - 10, args.prefix_len).tolist()
        )
        log(f"registered shared {args.prefix_len}-token prefix (pool id {pid})")
    reqs = []
    load = make_load(args.requests)
    t0 = time.perf_counter()
    for prompt, plen, npred, i in load:
        r = eng.submit(prompt, npred, sp=sp_load, seed=i, prefix=pid)
        reqs.append((r, plen, npred))
    log(f"{args.requests} requests submitted; running scheduler ...")
    done = eng.run()
    wall = time.perf_counter() - t0

    gen = sum(len(r.generated) for r in done)
    prompt_toks = sum(p for _, p, _ in reqs)
    log(
        f"completed {len(done)} requests in {wall:.1f}s:"
        f" {gen} generated tokens ({gen / wall:.1f} tok/s aggregate),"
        f" {prompt_toks} prompt tokens prefilled"
    )
    st = eng.stats
    log(
        f"stats: decode {st['t_decode']:.1f}s over {st['steps']} scan-steps"
        f" ({st['steps'] and st['t_decode']/st['steps']*1e3:.1f} ms/step),"
        f" {st['prefills']} prefills in {st.get('prefill_calls', 0)} batched calls;"
        f" non-decode wall {wall - st['t_decode']:.1f}s"
    )
    if args.paged:
        a = eng.pager.alloc
        log(
            f"paged: {a.n_pages} pages x {args.page_size} rows"
            f" ({a.n_pages - a.n_free - 1} still mapped),"
            f" {st.get('preempted', 0)} preemptions"
        )
    print(
        f'{{"metric": "LLaMA-{args.model} Q4_0 continuous-batching serving throughput",'
        f' "value": {gen / wall:.2f}, "unit": "generated tok/s",'
        f' "requests": {len(done)}, "max_batch": {args.max_batch}}}'
    )


if __name__ == "__main__":
    main()
