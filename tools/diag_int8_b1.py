"""Diagnose the int8-KV B=1 end-to-end regression (VERDICT weak #2).

bench.py measured ~9.8 ms/tok with kv_dtype=int8 at B=1 vs ~7.8 bf16, yet the
same forward timed differentially IN-program reads 7.2-7.5 ms — the gap is
program-level. This tool compiles the EXACT bench.py decode program (scan of
`measure` steps, donated cache) for both KV dtypes and diffs the optimized
HLO for the usual program-level suspects:

  * `copy` / `copy-start` instructions over cache-sized buffers (donation
    failing -> a full [L,B,S,H,D] copy per call or, far worse, per scan step)
  * `dynamic-update-slice` fusions that rematerialize the carry
  * peak buffer allocation (layout padding of the int8 scale planes)

Run on-chip:  PYTHONPATH=.:/root/.axon_site python tools/diag_int8_b1.py
Also times each variant end-to-end (3x64 steps) so the regression is
reproduced in the same process that dumped its HLO.
"""

import re
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from llamavk_tpu.models import (
    LLAMA_CONFIGS,
    ModelConfig,
    init_kv_cache,
    llama_forward,
    synthetic_params,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def big_insts(hlo: str, min_mb: float = 8.0):
    """(opcode, shape, MB) for instructions with byte-size comments >= min_mb."""
    out = []
    for m in re.finditer(r"(\w[\w.-]*) = ([\w\[\],{}#*: ]+?)\s*(copy|fusion|"
                         r"dynamic-update-slice|bitcast-convert|convert|"
                         r"all-reduce|transpose)\(", hlo):
        pass  # opcode scan below is simpler/robust
    for line in hlo.splitlines():
        m = re.search(r"= (\S+?)\[([\d,]*)\][^ ]* (copy|transpose)\(", line)
        if not m:
            continue
        dt, dims, op = m.groups()
        try:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
        except ValueError:
            continue
        item = {"f32": 4, "bf16": 2, "s8": 1, "u8": 1, "s32": 4, "f16": 2}.get(
            dt, 4
        )
        mb = n * item / 1e6
        if mb >= min_mb:
            out.append((op, f"{dt}[{dims}]", mb))
    return out


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "7B"
    batch, n_ctx, steps = 1, 512, 64
    over = {}
    if len(sys.argv) > 2:  # layer-count differential: per-layer vs per-step
        over["n_layer"] = int(sys.argv[2])
    cfg = ModelConfig(**{**LLAMA_CONFIGS[model], **over})
    log(f"building synthetic {model} params ...")
    params = synthetic_params(cfg, seed=0)
    jax.block_until_ready(params)

    results = {}
    for kv in ("bfloat16", "int8"):
        cache = init_kv_cache(cfg, batch, n_ctx, dtype=jnp.dtype(kv))

        @partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(2,))
        def decode(params, tok0, cache, n_past0, n_steps):
            def body(state, i):
                tok, cache = state
                logits, cache, _ = llama_forward(
                    params, tok.reshape(batch, 1), cache, n_past0 + i, cfg
                )
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (nxt, cache), nxt

            (tok, cache), toks = jax.lax.scan(
                body, (tok0, cache), jnp.arange(n_steps, dtype=jnp.int32)
            )
            return toks, cache

        tok0 = jnp.ones((batch,), jnp.int32)
        log(f"[{kv}] lowering + compiling ...")
        t0 = time.perf_counter()
        lowered = decode.lower(params, tok0, cache, jnp.int32(0), n_steps=steps)
        compiled = lowered.compile()
        log(f"[{kv}] compiled in {time.perf_counter() - t0:.1f}s")
        hlo = compiled.as_text()
        copies = big_insts(hlo)
        log(f"[{kv}] large copies/transposes in optimized HLO:")
        for op, shape, mb in sorted(copies, key=lambda t: -t[2])[:12]:
            log(f"    {op:10s} {shape:48s} {mb:8.1f} MB")
        n_dus = hlo.count(" dynamic-update-slice(")
        log(f"[{kv}] bare dynamic-update-slice count: {n_dus}")
        try:
            mem = compiled.memory_analysis()
            log(
                f"[{kv}] temp {mem.temp_size_in_bytes/1e6:.0f} MB, "
                f"args {mem.argument_size_in_bytes/1e6:.0f} MB, "
                f"out {mem.output_size_in_bytes/1e6:.0f} MB, "
                f"alias {mem.alias_size_in_bytes/1e6:.0f} MB"
            )
        except Exception as e:  # axon may not expose it
            log(f"[{kv}] memory_analysis unavailable: {e}")

        # reproduce the regression in the same process
        toks, cache = decode(params, tok0, cache, jnp.int32(0), steps)
        np.asarray(toks)  # sync
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            toks, cache = decode(params, toks[-1], cache, jnp.int32(steps), steps)
            np.asarray(toks)
            best = min(best, time.perf_counter() - t0)
        ms = best / steps * 1e3
        results[kv] = ms
        log(f"[{kv}] measured {ms:.2f} ms/step")

    log(f"SUMMARY: bf16 {results['bfloat16']:.2f} ms/step, "
        f"int8 {results['int8']:.2f} ms/step "
        f"(delta {results['int8'] - results['bfloat16']:+.2f})")


if __name__ == "__main__":
    main()
