"""Speculative-decoding round cost on the real chip.

Synthetic weights make measured ACCEPTANCE meaningless (a random draft never
matches a random target), so this reports the engineering numbers that are
meaningful: the cost of one draft+verify round vs one plain decode step, and
the break-even expected-tokens-per-round.

  speedup(E) = E * t_plain / t_round,  E = expected emitted tokens/round
  (E ranges 1..gamma; with a well-matched draft E ≈ 1 + a*(gamma-1) for
  acceptance rate a)

usage: PYTHONPATH=.:/root/.axon_site python tools/bench_spec.py [--gamma 4]
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from llamavk_tpu.models import LLAMA_CONFIGS, ModelConfig, init_kv_cache, synthetic_params
from llamavk_tpu.runtime.speculative import SpecConfig, SpeculativeEngine

# a ~1B-class draft (TinyLlama-ish proportions, Q4_0)
DRAFT_CFG = dict(
    n_vocab=32000, n_embd=2048, n_layer=16, n_head=16, n_rot=128, n_ff=5632
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_lookup(args):
    """Prompt-lookup speculation: no draft model, so the ONLY cost above a
    plain decode step is the gamma-query verify + the [S]-wide match. With a
    cyclic prompt the tiny-vocab greedy stream revisits its n-grams, so the
    measured tokens/round exercises real accept paths; the headline number is
    ms/round vs the plain step."""
    from llamavk_tpu.runtime.speculative import LookupEngine

    cfg = ModelConfig(**LLAMA_CONFIGS[args.model])
    log(f"building synthetic {args.model} ...")
    params = synthetic_params(cfg, seed=0)
    eng = LookupEngine(
        cfg, params,
        SpecConfig(n_ctx=args.n_ctx, gamma=args.gamma, rounds_per_block=8),
    )
    R = eng.scfg.rounds_per_block
    eng.generate([1, 2, 3, 4] * 4, 2, ignore_eos=True)  # compile
    headroom = R * args.gamma + args.gamma + 1
    budget = min(8 * R * args.gamma, args.n_ctx - 16 - headroom)
    best = float("inf")
    for _ in range(3):
        eng.stats = {"rounds": 0, "accepted": 0, "emitted": 0}
        t0 = time.perf_counter()
        out = eng.generate([1, 2, 3, 4] * 4, budget, ignore_eos=True)
        dt = time.perf_counter() - t0
        if eng.stats["rounds"]:
            best = min(best, dt / eng.stats["rounds"])
    tpr = eng.stats["emitted"] / max(eng.stats["rounds"], 1)
    log(
        f"lookup gamma={args.gamma}: {best*1e3:.2f} ms/round, measured "
        f"{tpr:.2f} tok/round -> {tpr/best:.1f} tok/s"
    )
    t_plain = 7.7e-3  # measured plain decode s/token (bench.py)
    log(
        f"vs plain {t_plain*1e3:.1f} ms/step: round overhead "
        f"{(best/t_plain-1)*100:+.0f}% -> wins for ANY acceptance above "
        f"{max(best/t_plain-1, 0)*100:.0f}% extra tokens/round"
    )
    print(
        f'{{"metric": "lookup-speculative round cost {args.model} '
        f'gamma={args.gamma}", "value": {best*1e3:.2f}, "unit": "ms/round"}}'
    )


def bench_breakdown(args):
    """Decompose the draft+verify round: what do its two components cost
    ALONE, amortized in their own on-device scans?

      draft:  plain B=1 decode scan on the 1B-class draft -> ms/step
      verify: scan of gamma-token target forwards (logits_all, n_past
              advancing by gamma) -> ms/verify

    round ~= gamma*draft + verify + glue. If the measured round (main mode)
    is far above the sum, the loss is scheduling inside the round body; if
    the sum itself is high, the component is the problem."""
    from functools import partial

    from llamavk_tpu.models.llama import llama_forward
    from llamavk_tpu.utils.jitopts import decode_jit

    g = args.gamma
    cfg_t = ModelConfig(**LLAMA_CONFIGS[args.model])
    cfg_d = ModelConfig(**DRAFT_CFG)
    log(f"building synthetic {args.model} target + 1B-class draft ...")
    params_t = synthetic_params(cfg_t, seed=0)
    params_d = synthetic_params(cfg_d, seed=1)
    jax.block_until_ready((params_t, params_d))

    def measure(fn, cache, steps, label):
        # fn(cache, n_past0, steps) -> (toks, cache); the cache is DONATED,
        # so it must be threaded through every call
        toks, cache = fn(cache, jnp.int32(0), steps)
        np.asarray(toks)
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            toks, cache = fn(cache, jnp.int32(steps * (r + 1) % 256), steps)
            np.asarray(toks)
            best = min(best, time.perf_counter() - t0)
        ms = best / steps * 1e3
        log(f"{label}: {ms:.2f} ms/iter (scan of {steps})")
        return ms

    # 1) draft-alone decode scan
    cache_d = init_kv_cache(cfg_d, 1, args.n_ctx)

    @partial(decode_jit, static_argnames=("n",), donate_argnums=(2,))
    def draft_scan(params, tok0, cache, n_past0, n):
        def body(s, i):
            tok, cache = s
            lg, cache, _ = llama_forward(
                params, tok.reshape(1, 1), cache, n_past0 + i, cfg_d
            )
            nt = jnp.argmax(lg[0, -1]).astype(jnp.int32)
            return (nt, cache), nt

        (_, cache), toks = jax.lax.scan(
            body, (tok0, cache), jnp.arange(n, dtype=jnp.int32)
        )
        return toks, cache

    d_ms = measure(
        partial(draft_scan, params_d, jnp.int32(1)), cache_d,
        steps=128, label="draft 1B decode step",
    )

    # 2) verify-alone: gamma-token target forward scan
    cache_t = init_kv_cache(cfg_t, 1, args.n_ctx)

    @partial(decode_jit, static_argnames=("n",), donate_argnums=(2,))
    def verify_scan(params, seq0, cache, n_past0, n):
        def body(s, i):
            seq, cache = s
            lg, cache, _ = llama_forward(
                params, seq[None], cache, n_past0 + i * g, cfg_t,
                logits_all=True,
            )
            y = jnp.argmax(lg[0], axis=-1).astype(jnp.int32)
            return (y, cache), y[0]

        (_, cache), toks = jax.lax.scan(
            body, (seq0, cache), jnp.arange(n, dtype=jnp.int32)
        )
        return toks, cache

    v_ms = measure(
        partial(verify_scan, params_t, jnp.ones((g,), jnp.int32)), cache_t,
        steps=64, label=f"target verify ({g} tokens)",
    )

    # 3) plain target decode step for reference
    cache_t2 = init_kv_cache(cfg_t, 1, args.n_ctx)

    @partial(decode_jit, static_argnames=("n",), donate_argnums=(2,))
    def plain_scan(params, tok0, cache, n_past0, n):
        def body(s, i):
            tok, cache = s
            lg, cache, _ = llama_forward(
                params, tok.reshape(1, 1), cache, n_past0 + i, cfg_t
            )
            nt = jnp.argmax(lg[0, -1]).astype(jnp.int32)
            return (nt, cache), nt

        (_, cache), toks = jax.lax.scan(
            body, (tok0, cache), jnp.arange(n, dtype=jnp.int32)
        )
        return toks, cache

    p_ms = measure(
        partial(plain_scan, params_t, jnp.int32(1)), cache_t2,
        steps=128, label="plain target decode step",
    )

    ideal = g * d_ms + v_ms
    log(
        f"component sum: {g} x {d_ms:.2f} (draft) + {v_ms:.2f} (verify) = "
        f"{ideal:.2f} ms/round vs plain step {p_ms:.2f} ms"
    )
    log("compare against the measured round (run without --breakdown): the"
        " difference is in-round scheduling loss.")
    print(
        f'{{"metric": "spec components {args.model}+1B gamma={g}", '
        f'"draft_ms": {d_ms:.2f}, "verify_ms": {v_ms:.2f}, '
        f'"plain_ms": {p_ms:.2f}, "ideal_round_ms": {ideal:.2f}}}'
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7B", choices=list(LLAMA_CONFIGS))
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--lookup", action="store_true",
                    help="bench draft-model-free prompt-lookup speculation")
    ap.add_argument("--breakdown", action="store_true",
                    help="measure the round's components in isolation")
    args = ap.parse_args()
    if args.breakdown:
        bench_breakdown(args)
        return
    if args.lookup:
        bench_lookup(args)
        return

    cfg_t = ModelConfig(**LLAMA_CONFIGS[args.model])
    cfg_d = ModelConfig(**DRAFT_CFG)
    log(f"building synthetic {args.model} target + 1B-class draft ...")
    params_t = synthetic_params(cfg_t, seed=0)
    params_d = synthetic_params(cfg_d, seed=1)

    # the round body is one scan body: rounds_per_block only changes the
    # scan LENGTH (dispatch amortization), not the trace/compile size
    spec = SpeculativeEngine(
        cfg_t, params_t, cfg_d, params_d,
        SpecConfig(n_ctx=args.n_ctx, gamma=args.gamma, rounds_per_block=16),
    )
    R = spec.scfg.rounds_per_block
    # warm: compiles both prefills + the block (the block program traces
    # gamma draft forwards + one target forward per round)
    spec.generate([1, 2, 3, 4], 2, ignore_eos=True)
    # with an unrelated synthetic draft acceptance is ~0, so every round
    # emits exactly one token: tokens/sec IS rounds/sec
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = spec.generate([1, 2, 3, 4], 8 * R, ignore_eos=True)
        best = min(best, time.perf_counter() - t0)
    per_round = best / (8 * R)
    log(
        f"gamma={args.gamma}: {per_round * 1e3:.2f} ms per draft+verify round"
        f" ({R} rounds/block, ~0% acceptance with the synthetic draft)"
    )
    t_plain = 7.7e-3  # measured plain decode s/token (bench.py)
    be = per_round / t_plain
    acc = max(be - 1, 0) / max(args.gamma - 1, 1)
    log(
        f"break-even expected tokens/round: {be:.2f}"
        f" (of max {args.gamma}) = acceptance {acc*100:.0f}%;"
        f" speedup at full acceptance: {args.gamma * t_plain / per_round:.2f}x."
        " Components (v5e, --breakdown): draft 1.56 ms/step, verify 8.02 ms"
        " -> the in-program floor is ~16.6 ms/round at gamma=4; the rest is"
        " the ~16 ms tunnel dispatch amortized over rounds_per_block."
    )
    print(
        f'{{"metric": "speculative round cost {args.model}+1B gamma={args.gamma}",'
        f' "value": {per_round * 1e3:.2f}, "unit": "ms/round"}}'
    )


if __name__ == "__main__":
    main()
