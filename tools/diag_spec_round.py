"""Diagnose the draft+verify round's in-round loss.

Components alone (tools/bench_spec.py --breakdown, v5e 2026-08-19):
draft 1.56 ms/step, verify 8.02 ms, plain 7.62 ms -> ideal round 14.24 ms.
Measured round: 27.85 ms. This probe compiles the EXACT spec block
(runtime/speculative.make_spec_decode_block) and scans the optimized HLO for
big-output instructions (the scanner that found the int8-KV MSA copy), then
times the block.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tools")
from hlo_scan import report

from llamavk_tpu.models import LLAMA_CONFIGS, ModelConfig, init_kv_cache, synthetic_params
from llamavk_tpu.runtime.speculative import make_spec_decode_block

DRAFT_CFG = dict(
    n_vocab=32000, n_embd=2048, n_layer=16, n_head=16, n_rot=128, n_ff=5632
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=4)
    a = ap.parse_args()
    gamma, n_ctx, rounds = a.gamma, 512, a.rounds
    cfg_t = ModelConfig(**LLAMA_CONFIGS["7B"])
    cfg_d = ModelConfig(**DRAFT_CFG)
    log("building params ...")
    params_t = synthetic_params(cfg_t, seed=0)
    params_d = synthetic_params(cfg_d, seed=1)
    jax.block_until_ready((params_t, params_d))
    cache_t = init_kv_cache(cfg_t, 1, n_ctx)
    cache_d = init_kv_cache(cfg_d, 1, n_ctx)

    block = make_spec_decode_block(cfg_t, cfg_d, gamma)
    t0 = time.perf_counter()
    lowered = block.lower(
        params_t, params_d, jnp.int32(1), cache_t, cache_d, jnp.int32(0), rounds
    )
    compiled = lowered.compile()
    log(f"compiled in {time.perf_counter() - t0:.1f}s")
    hlo = compiled.as_text()
    report(hlo, log)
    try:
        m = compiled.memory_analysis()
        log(f"temp {m.temp_size_in_bytes/1e6:.0f} MB, "
            f"args {m.argument_size_in_bytes/1e6:.0f} MB, "
            f"alias {m.alias_size_in_bytes/1e6:.0f} MB")
    except Exception as e:
        log("memory_analysis unavailable:", e)

    out = block(params_t, params_d, jnp.int32(1), cache_t, cache_d,
                jnp.int32(0), rounds)
    np.asarray(out[0])
    toks, counts, tok, cache_t, cache_d, n_past = out
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        out = block(params_t, params_d, tok, cache_t, cache_d, n_past, rounds)
        np.asarray(out[0])
        toks, counts, tok, cache_t, cache_d, n_past = out
        best = min(best, time.perf_counter() - t0)
    log(f"measured {best / rounds * 1e3:.2f} ms/round")
    print(f'{{"gamma": {gamma}, "rounds": {rounds}, "ms_per_round": {best / rounds * 1e3:.2f}}}')


if __name__ == "__main__":
    main()
