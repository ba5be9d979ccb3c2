"""Probe: does shrinking XLA's alternate-memory (VMEM) budget kill the
pathological per-layer 90 MB copy of params.layers.w2.scales in the int8-KV
B=1 decode program? (tools/diag_int8_copy.py identified it; ROADMAP item 0.)

Compiles the 64-step decode with int8 KV under a given compiler option set,
reports (a) presence/size of big copy-start instructions in the layer loop,
(b) measured ms/step.

usage: PYTHONPATH=.:/root/.axon_site python tools/diag_int8_msa.py \
          [--opt xla_tpu_scoped_vmem_limit_kib=98304] [--kv int8]
"""

import argparse
import re
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from llamavk_tpu.models import LLAMA_CONFIGS, ModelConfig, init_kv_cache, synthetic_params
from llamavk_tpu.models.llama import llama_forward


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", action="append", default=[],
                    help="compiler option key=value (repeatable)")
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--model", default="7B")
    args = ap.parse_args()
    opts = dict(o.split("=", 1) for o in args.opt)
    log(f"compiler_options = {opts}")

    batch, n_ctx, steps = 1, 512, 64
    cfg = ModelConfig(**LLAMA_CONFIGS[args.model])
    params = synthetic_params(cfg, seed=0)
    jax.block_until_ready(params)
    cache = init_kv_cache(cfg, batch, n_ctx, dtype=jnp.dtype(args.kv))

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(2,),
             compiler_options=opts or None)
    def decode(params, tok0, cache, n_past0, n_steps):
        def body(state, i):
            tok, cache = state
            logits, cache, _ = llama_forward(
                params, tok.reshape(batch, 1), cache, n_past0 + i, cfg
            )
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (nxt, cache), nxt

        (_, cache), toks = jax.lax.scan(
            body, (tok0, cache), jnp.arange(n_steps, dtype=jnp.int32)
        )
        return toks, cache

    tok0 = jnp.zeros((batch,), jnp.int32)
    t0 = time.perf_counter()
    compiled = decode.lower(params, tok0, cache, jnp.int32(steps), steps).compile()
    log(f"compiled in {time.perf_counter() - t0:.1f}s")
    hlo = compiled.as_text()
    n_big = 0
    for line in hlo.splitlines():
        m = re.search(r"= \(bf16\[([\d,]+)\][^)]*\) copy-start", line)
        if m:
            n = int(np.prod([int(d) for d in m.group(1).split(",")]))
            if n * 2 >= 2e6:
                n_big += 1
                log(f"  BIG copy-start: bf16[{m.group(1)}] = {n*2/1e6:.1f} MB")
    log(f"big bf16 copy-starts: {n_big}")

    toks = decode(params, tok0, cache, jnp.int32(0), steps)[0]
    np.asarray(toks)
    # re-init cache (donated)
    cache = init_kv_cache(cfg, batch, n_ctx, dtype=jnp.dtype(args.kv))
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        toks, cache = decode(params, toks[-1], cache, jnp.int32(steps * (r + 1)), steps)
        np.asarray(toks)
        best = min(best, time.perf_counter() - t0)
    log(f"measured {best / steps * 1e3:.2f} ms/step")
    print(f'{{"kv": "{args.kv}", "opts": "{";".join(args.opt)}", '
          f'"big_copies": {n_big}, "ms_per_step": {best / steps * 1e3:.3f}}}')


if __name__ == "__main__":
    main()
